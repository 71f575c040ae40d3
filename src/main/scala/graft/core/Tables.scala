package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer. The reference has no file formats — tables are environment
  * bindings (fiat2/src/fiat2/Ex_Employee.v:68-71); ours are parquet scans,
  * which get Catalyst predicate pushdown + column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so queries can also be authored in
    * SQL (mirrors the driver's DuckDB oracle environment). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
