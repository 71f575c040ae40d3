package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer. The reference has no file formats — tables are environment
  * bindings (fiat2/src/fiat2/Ex_Employee.v:68-71); ours are parquet scans,
  * which get Catalyst predicate pushdown + column pruning for free.
  */
object Tables {
  /** Recursive delete for scratch dirs (verify dumps, stream feeds). */
  def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteTree))
    f.delete()
  }


  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS), which Spark's reader rejects by
      // default; read it as epoch-nanos LongType and let callers derive a
      // microsecond timestamp via tsCol.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Microsecond TimestampType from the epoch-nanos long `ts` of events —
    * floor to µs, matching DuckDB's ns→µs truncation. */
  def tsCol(nanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.call_function("div", nanos,
        org.apache.spark.sql.functions.lit(1000L)))

  /** Register every table as a temp view so queries can also be authored in
    * SQL (mirrors the driver's DuckDB oracle environment). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
