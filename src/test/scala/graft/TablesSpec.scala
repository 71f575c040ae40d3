package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** The events schema contract (TESTDATA.md): the driver has regenerated
  * `events.ts` in two layouts across rounds; Tables must adapt to both and
  * fail LOUDLY — one assertion naming the accepted layouts — on anything
  * else, instead of ten scattered analysis exceptions downstream. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fakeEventsDir(tsExpr: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_spec_")
    spark.range(10)
      .select(col("id").as("event_id"), tsExpr.as("ts"),
        (col("id") % 3).as("user_id"), lit("click").as("event_type"),
        col("id").cast("double").as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir.toString
  }

  test("load accepts both ts layouts; tsCol/epochUs agree across them") {
    // current layout: timestamp (µs); legacy layout: epoch-nanos long
    val tsDir = fakeEventsDir(
      timestamp_micros(col("id") * 1000000L + 123456L))
    val nsDir = fakeEventsDir(col("id") * 1000000000L + 123456000L)
    try {
      val a = Tables.load(spark, tsDir, "events")
      val b = Tables.load(spark, nsDir, "events")
      val ea = a.select(Tables.epochUs(a).as("t")).orderBy("t")
        .collect().map(_.getLong(0)).toSeq
      val eb = b.select(Tables.epochUs(b).as("t")).orderBy("t")
        .collect().map(_.getLong(0)).toSeq
      assert(ea === eb, "epochUs must agree across stored layouts")
      val ta = a.select(Tables.tsCol(a).as("ts")).orderBy("ts")
        .collect().map(_.getTimestamp(0)).toSeq
      val tb = b.select(Tables.tsCol(b).as("ts")).orderBy("ts")
        .collect().map(_.getTimestamp(0)).toSeq
      assert(ta === tb, "tsCol must agree across stored layouts")
    } finally {
      Tables.deleteTree(new java.io.File(tsDir))
      Tables.deleteTree(new java.io.File(nsDir))
    }
  }

  test("an unknown ts layout fails loudly at load, naming the contract") {
    val badDir = fakeEventsDir(col("id").cast("string"))
    try {
      val e = intercept[RuntimeException] {
        Tables.load(spark, badDir, "events")
      }
      assert(e.getMessage.contains("accepted layouts"), e.getMessage)
      assert(e.getMessage.contains("TESTDATA.md"), e.getMessage)
    } finally Tables.deleteTree(new java.io.File(badDir))
  }
}
