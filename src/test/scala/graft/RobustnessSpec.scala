package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random differential properties for the round's new components —
  * the same style as LangLawsSpec: random inputs, engine-vs-engine (or
  * engine-vs-definition) equality.
  */
class RobustnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(41)

  test("incrementalJoin == full join over random batch splits (10 trials)") {
    import spark.implicits._
    (1 to 10).foreach { trial =>
      val nA = 20 + rnd.nextInt(60)
      val nB = 20 + rnd.nextInt(60)
      val a = Seq.fill(nA)((rnd.nextInt(25).toLong, rnd.nextInt(100)))
        .zipWithIndex.map { case ((k, v), i) => (k, v.toLong, i.toLong) }
        .toDF("k", "av", "aid")
      val b = Seq.fill(nB)((rnd.nextInt(25).toLong, rnd.nextInt(100)))
        .zipWithIndex.map { case ((k, v), i) => (k, v.toLong, i.toLong) }
        .toDF("k", "bv", "bid")
      val ticks = 1 + rnd.nextInt(4)
      // random disjoint covering split by row-id modulus-bucket draw
      def split(df: org.apache.spark.sql.DataFrame, idCol: String) =
        (0 until ticks).map(t => df.filter(pmod(col(idCol), lit(ticks)) === t))
      val got = operators.Ivm.incrementalJoin(
          split(a, "aid"), split(b, "bid"), (x, y) => x.join(y, "k"))
        .select($"k", $"aid", $"bid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = a.join(b, "k").select($"k", $"aid", $"bid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"trial $trial (ticks=$ticks)")
    }
  }

  test("bloom filter admits every inserted key (no false negatives)") {
    import spark.implicits._
    val keys = Seq.fill(500)(rnd.nextLong()).distinct
    val df = keys.toDF("k")
    val bloom = functions.Bloom.buildLong(df, "k", keys.length.toLong, 0.01)
    val kept = df.filter(functions.Bloom.mightContain(bloom, $"k")).count()
    assert(kept == keys.length, "a bloom filter must never drop a member")
  }

  test("local union-find == distributed propagation on random graphs (5 trials)") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val n = 10 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (x, y) => x != y }
      if (edges.nonEmpty) {
        val sym = plans.Graph.symmetrize(edges.toDF("a", "b"))
        val local = plans.Graph.connectedComponents(sym)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dist = plans.Graph.connectedComponents(sym, localEdgeThreshold = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(local == dist, s"trial $trial")
      }
    }
  }
}
