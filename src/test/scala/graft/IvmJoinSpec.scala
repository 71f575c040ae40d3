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

  test("incrementalJoinZ: retractions cancel exactly, per tick, at any prefix") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A rows keyed 1..4; key 1 is inserted in tick 0 and RETRACTED in
    // tick 2 — after B rows for key 1 arrived in tick 1, so the
    // cancellation must reach pairs produced by a LATER B delta.
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).toDF("k", "av")
    val b = Seq((1L, 10L), (1L, 11L), (3L, 30L), (4L, 40L)).toDF("bk", "bv")
    def aw(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        w: Long) = f(a).withColumn("w", lit(w))
    def bw(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        w: Long) = f(b).withColumn("w", lit(w))
    val aB = Seq(
      aw(_.filter($"k" <= 2), 1L),
      aw(_.filter($"k" === 3), 1L),
      aw(_.filter($"k" === 1), -1L).union(aw(_.filter($"k" === 4), 1L)))
    val bB = Seq(
      bw(_.filter($"bk" === 3), 1L),
      bw(_.filter($"bk" === 1), 1L),
      bw(_.filter($"bk" === 4), 1L))
    // check EVERY prefix of ticks, not just the final state: the live set
    // after tick t is the inserts-minus-retracts applied so far
    val live = Seq(Set(1L, 2L) /* k=1 live, but its B rows haven't arrived */,
      Set(1L, 2L, 3L), Set(2L, 3L, 4L))
    (1 to 3).foreach { t =>
      val view = Ivm.incrementalJoinZ(aB.take(t), bB.take(t),
        (x, y) => x("k") === y("bk"))
      val consolidated = view
        .groupBy(view.columns.filter(_ != "w").map(col): _*)
        .agg(sum($"w").as("w")).filter($"w" =!= 0)
      val got = consolidated.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      val liveA = a.filter($"k".isin(live(t - 1).toSeq: _*))
      val arrivedB = (0 until t).map(bB).map(_.drop("w"))
        .reduce(_ union _)
      val want = liveA.join(arrivedB, $"k" === $"bk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      assert(got == want, s"tick prefix $t: $got != $want")
      // every consolidated weight is exactly 1 — duplicates and zombies
      // would both show up here
      assert(consolidated.collect().forall(_.getAs[Long]("w") == 1L))
    }
  }

  // -----------------------------------------------------------------------
  // Seeded random interleavings: inserts and deletes in ANY order — deletes
  // before their matching insert (net-negative intermediate weights),
  // net-zero rows, empty deltas — against a recompute-from-scratch Z-set
  // oracle computed in plain Scala. The tiny row domain (3 keys × 2 values)
  // makes collisions and cancellations frequent at every seed.
  // -----------------------------------------------------------------------

  private val TICKS = 3
  private type ZRow = (Long, Long) // (k, v)
  private def genDeltas(seed: Int): Seq[Seq[(Long, Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(TICKS) {
      Seq.fill(rnd.nextInt(5))((1L + rnd.nextInt(3), rnd.nextInt(2).toLong,
        if (rnd.nextInt(3) == 0) -1L else 1L))
    }
  }
  private def net(deltas: Seq[Seq[(Long, Long, Long)]]): Map[ZRow, Long] =
    deltas.flatten.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).sum).toMap

  test("incrementalJoinZ equals Z-set recompute over random retraction interleavings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 0 until 50) {
      val dA = genDeltas(seed)
      val dB = genDeltas(seed + 1000)
      val aB = dA.map(_.toDF("k", "av", "w"))
      val bB = dB.map(_.toDF("bk", "bv", "w"))
      val view = Ivm.incrementalJoinZ(aB, bB, (x, y) => x("k") === y("bk"))
      val got = view.groupBy($"k", $"av", $"bk", $"bv")
        .agg(sum($"w").as("w")).filter($"w" =!= 0)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
          r.getLong(4))).toMap
      // oracle: joined weight = product of net input weights, zeros dropped
      val want = (for {
        ((ak, av), wa) <- net(dA); ((bk, bv), wb) <- net(dB)
        if ak == bk && wa * wb != 0L
      } yield ((ak, av, bk, bv), wa * wb)).toMap
      assert(got == want, s"[seed=$seed] $got != $want")
    }
  }

  test("incrementalGroupSumZ equals Z-set recompute over random retraction interleavings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 0 until 50) {
      val deltas = genDeltas(seed + 2000)
      val ticks = deltas.map(_.toDF("g", "v", "w"))
      val res = Ivm.incrementalGroupSumZ(ticks, Seq("g"),
          col("v").cast("decimal(10,0)"))
        .select($"g", $"n".cast("long").as("n"), $"s".cast("long").as("s"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val byKey = deltas.flatten.groupBy(_._1).view.mapValues { rs =>
        (rs.map(_._3).sum, rs.map(r => r._3 * r._2).sum)
      }.filter(_._2._1 != 0L).toMap
      assert(res == byKey, s"[seed=$seed] $res != $byKey")
    }
  }
}
