package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Morton
import graft.operators.Layout

/** Z-order layout: bit-level unit checks, the physical plan of the
  * repartition helper, and the actual pruning benefit — z-ordered
  * partitions must bound BOTH dimensions tighter than a lexicographic
  * sort bounds its non-prefix dimension. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Morton interleave puts a in even bits, b in odd bits") {
    assert(Morton.interleave2(0L, 0L) === 0L)
    assert(Morton.interleave2(1L, 0L) === 1L) // a bit 0 → z bit 0
    assert(Morton.interleave2(0L, 1L) === 2L) // b bit 0 → z bit 1
    assert(Morton.interleave2(3L, 0L) === 5L) // 0b11 → 0b0101
    assert(Morton.interleave2(0L, 3L) === 10L) // 0b11 → 0b1010
    assert(Morton.interleave2(0xFFFFFFFFL, 0L) === 0x5555555555555555L)
    assert(Morton.interleave2(0L, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
    // deinterleave round-trip on a few values
    for (a <- Seq(0L, 7L, 1234L, 65535L); b <- Seq(0L, 1L, 999L, 65535L)) {
      val z = Morton.interleave2(a, b)
      var (ra, rb, i) = (0L, 0L, 0)
      while (i < 32) {
        ra |= ((z >>> (2 * i)) & 1L) << i
        rb |= ((z >>> (2 * i + 1)) & 1L) << i
        i += 1
      }
      assert((ra, rb) === ((a, b)), s"round-trip failed for ($a, $b)")
    }
  }

  test("zorderRepartition range-partitions by the z-value and drops it") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"), floor(col("id") / 64).as("b"))
    val laid = Layout.zorderRepartition(df, col("a"), col("b"), 8)
    assert(laid.columns.toSeq === Seq("a", "b"))
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"no range partition:\n$plan")
    assert(laid.count() === 4096L)
  }

  test("z-order bounds BOTH dims per partition; lex sort bounds only its prefix") {
    // uniform 64×64 grid; 16 partitions
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"), floor(col("id") / 64).as("b"))
    def spans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = laid.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect()
      (rows.map(_.getLong(1)).sum.toDouble / rows.length,
        rows.map(_.getLong(2)).sum.toDouble / rows.length)
    }
    val (zA, zB) = spans(Layout.zorderRepartition(df, col("a"), col("b"), 16))
    val (lexA, lexB) = spans(df.repartitionByRange(16, col("a"), col("b")))
    // lexicographic: a tightly bounded, b spans the whole 0..63 range
    assert(lexB > 60.0, s"lex b-span unexpectedly tight: $lexB")
    // z-order: BOTH dims bounded well below the full range
    assert(zA < 32.0, s"z a-span too wide: $zA")
    assert(zB < 32.0, s"z b-span too wide: $zB")
    assert(lexA < 32.0) // sanity: lex does bound its prefix
  }
}
