package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ivm

/** Delta-join view maintenance ≡ full recompute, including ticks where one
  * side's delta is empty and keys that join across distant ticks. */
class IvmJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("incrementalJoin reconstructs the full join across uneven deltas") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).toDF("k", "av")
    val b = Seq((1L, 10L), (3L, 30L), (4L, 40L), (9L, 90L)).toDF("k", "bv")
    // ΔA ticks: {1,2}, {}, {3,4}; ΔB ticks: {}, {1,3,9}, {4}
    val aB = Seq(a.filter($"k" <= 2), a.filter($"k" < 0), a.filter($"k" >= 3))
    val bB = Seq(b.filter($"k" < 0), b.filter($"k" =!= 4), b.filter($"k" === 4))
    val got = Ivm.incrementalJoin(aB, bB,
        (x, y) => x.join(y, "k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = a.join(b, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.map(_._1) == Set(1L, 3L, 4L))
  }
}
