package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Fiat2

/** Value-semantics helpers vs. the mathematical definitions they mirror
  * (Coq Z.div / Z.modulo — fiat2/src/fiat2/Interpret.v:147,150). */
class Fiat2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ediv/emod match floorDiv/floorMod on a generated grid") {
    val samples = for {
      a <- Seq(-1000L, -77L, -7L, -1L, 0L, 1L, 7L, 77L, 1000L, 999999L)
      b <- Seq(-13L, -7L, -2L, -1L, 1L, 2L, 7L, 13L)
    } yield (a, b)
    val got = samples.toDF("a", "b")
      .select($"a", $"b", Fiat2.ediv($"a", $"b").as("d"),
        Fiat2.emod($"a", $"b").as("m"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === Math.floorDiv(a, b), s"ediv($a,$b)")
      assert(r.getLong(3) === Math.floorMod(a, b), s"emod($a,$b)")
    }
  }

  test("ediv * b + emod == a (division identity, seeded random samples)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(200) {
      val b = { var x = 0L; while (x == 0) x = rnd.nextInt(2000) - 1000; x }
      (rnd.nextLong() % 1000000L, b)
    }
    val rows = samples.toDF("a", "b")
      .select($"a", $"b",
        (Fiat2.ediv($"a", $"b") * $"b" + Fiat2.emod($"a", $"b")).as("r"))
      .collect()
    rows.foreach(r => assert(r.getLong(2) === r.getLong(0),
      s"identity failed for (${r.getLong(0)}, ${r.getLong(1)})"))
  }

  test("dict insert/delete/lookup round-trip, sorted canonical form") {
    val df = Seq(1).toDF("x").select(
      array(struct(lit(3L).as("key"), lit("c").as("value")),
        struct(lit(1L).as("key"), lit("a").as("value"))).as("d0"))
      .select(Fiat2.dictInsert(array_sort($"d0"), lit(2L), lit("b")).as("d1"))
      .select($"d1",
        Fiat2.dictLookup($"d1", lit(2L)).as("hit"),
        Fiat2.dictLookup($"d1", lit(9L)).as("miss"),
        Fiat2.dictLookup(Fiat2.dictDelete($"d1", lit(2L)), lit(2L)).as("deleted"))
    val r = df.head()
    assert(r.getSeq[Any](0).size === 3)
    assert(r.getString(1) === "b")
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("rangeList is empty when hi <= lo (no descending sequence)") {
    val r = Seq(1).toDF("x")
      .select(Fiat2.rangeList(lit(5L), lit(2L)).as("e"),
        Fiat2.rangeList(lit(2L), lit(5L)).as("f"))
      .head()
    assert(r.getSeq[Long](0).isEmpty)
    assert(r.getSeq[Long](1) === Seq(2L, 3L, 4L))
  }

  test("bagOfArray produces sorted (value, count) canonical form") {
    val r = Seq(1).toDF("x")
      .select(Fiat2.bagOfArray(array(lit(3), lit(1), lit(3), lit(1), lit(3)))
        .as("bag"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(e => (e.getInt(0), e.getLong(1))) === Seq((1, 2L), (3, 3L)))
  }

  test("bagOfArray handles empty, singleton, all-equal; arrayOfBag inverts") {
    val r = Seq(1).toDF("x").select(
      Fiat2.bagOfArray(array().cast("array<long>")).as("empty"),
      Fiat2.bagOfArray(array(lit(9L))).as("one"),
      Fiat2.bagOfArray(array(lit(4L), lit(4L), lit(4L))).as("same"),
      Fiat2.arrayOfBag(Fiat2.bagOfArray(
        array(lit(3L), lit(1L), lit(3L), lit(1L), lit(3L)))).as("round"))
      .head()
    assert(r.getSeq[Any](0).isEmpty)
    assert(r.getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getLong(0), e.getLong(1))) === Seq((9L, 1L)))
    assert(r.getSeq[org.apache.spark.sql.Row](2)
      .map(e => (e.getLong(0), e.getLong(1))) === Seq((4L, 3L)))
    // roundtrip recovers the canonical sorted element array
    assert(r.getSeq[Long](3) === Seq(1L, 1L, 3L, 3L, 3L))
  }

  test("record fields are name-sorted so struct equality is canonical") {
    val r = Seq(1).toDF("x").select(
      (Fiat2.record("b" -> lit(2), "a" -> lit(1)) ===
        Fiat2.record("a" -> lit(1), "b" -> lit(2))).as("eq"))
      .head()
    assert(r.getBoolean(0))
  }
}
