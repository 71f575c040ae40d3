package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Partitioned layout: writing fact data partitioned by a low-cardinality
  * filter column makes selective scans touch only matching directories
  * (PartitionFilters) — at 100 TB this is the difference between reading a
  * shard and reading the lake.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scan of a partitioned write prunes partitions and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    Tables.load(spark, TestSpark.sfDir, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition filter missing:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"pushed filter missing:\n$plan")
    // and the pruned read returns the same rows as the unpartitioned scan
    val expected = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45).count()
    assert(q.count() === expected)
  }
}
