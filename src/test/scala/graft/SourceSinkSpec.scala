package graft

import org.scalatest.funsuite.AnyFunSuite

/** Roundtrip + plan guards for the format family (sources/SourceSink). */
class SourceSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("csv, jsonl, orc roundtrips agree with the direct parquet rollup") {
    import org.apache.spark.sql.functions._
    val direct = graft.core.Tables.load(spark, TestSpark.sfDir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey").cast("decimal(38,0)")).cast("string")
          .as("sum_cust"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("status").collect().toSeq
    Seq("q_csv_roundtrip", "q_jsonl_roundtrip", "q_orc_roundtrip").foreach { q =>
      assert(run(q).collect().toSeq == direct, q)
    }
  }

  test("partitioned sink's read-back prunes to the matching partition") {
    val df = run("q_partitioned_sink")
    val p = df.queryExecution.executedPlan.toString
    // the status predicate must be a PartitionFilter on the scan, not a
    // post-scan Filter over all partitions
    assert(p.contains("PartitionFilters: [isnotnull(status"), p)
    assert(df.collect().nonEmpty)
  }
}
