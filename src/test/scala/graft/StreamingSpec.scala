package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics: windowed aggregation in append mode over a two-batch
  * file arrival — the watermark from batch 1 closes old windows (emitted) and
  * drops batch 2's too-late data.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermarked windowed agg emits closed windows and drops late data") {
    val dir = Files.createTempDirectory("graft_wm_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // batch 1: events in windows 00:00 and 01:00, max event time 02:00
    Seq((ts(0), "a"), (ts(1), "a"), (ts(60), "b"), (ts(120), "c"))
      .toDF("ts", "k").coalesce(1).write.parquet(s"$dir/b1")
    // batch 2: an event 2h LATE (window 00:00, watermark now 01:50) plus a
    // fresh one
    Seq((ts(2), "late"), (ts(125), "c"))
      .toDF("ts", "k").coalesce(1).write.parquet(s"$dir/b2")

    // stage batch 1 before starting so arrival order is deterministic
    val arrivals = Files.createTempDirectory("graft_wm_arrivals_").toString
    Files.copy(java.nio.file.Paths.get(
      spark.read.parquet(s"$dir/b1").inputFiles.head.stripPrefix("file:")),
      java.nio.file.Paths.get(s"$arrivals/b1.parquet"))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(arrivals)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    q.processAllAvailable()
    Files.copy(java.nio.file.Paths.get(
      spark.read.parquet(s"$dir/b2").inputFiles.head.stripPrefix("file:")),
      java.nio.file.Paths.get(s"$arrivals/b2.parquet"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm_out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // 00:00 window emitted with n=2 — the late event did NOT inflate it
    assert(out.get("2024-01-01 00:00:00.0").contains(2L),
      s"closed 00:00 window wrong: $out")
    // the late event's window was already closed; count stays 2 (dropped)
    assert(!out.contains("2024-01-01 00:00:00.0") || out("2024-01-01 00:00:00.0") == 2L)
  }
}
