package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{GraftQuery, Tables}

/** Structured Streaming layer. The reference's streaming idiom is a CForeach
  * over an event list with incrementally-maintained aggregates
  * (fiat2/src/fiat2/Ex_Sum.v:30; SURVEY.md §2.10); the idiomatic Spark
  * equivalent is readStream → windowed stateful aggregation → sink. Here the
  * finite events parquet drives the stream to completion and the final state
  * is compared against a batch oracle — the IVM correctness statement.
  */
object StreamAgg {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery.sql("q_stream_window",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Batch read once for the (nanos-as-long) schema, then stream the same
      // file through a windowed aggregation into an in-memory sink.
      val schema = Tables.load(s, dir, "events").schema
      // The file-stream source needs a directory to watch; expose the single
      // events file through a temp dir (the arrival directory of a real feed).
      val watchDir = java.nio.file.Files.createTempDirectory("graft_stream_")
      val link = watchDir.resolve("events.parquet")
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = s.readStream.schema(schema).parquet(watchDir.toString)
      val agg = stream
        .withColumn("tstamp", Tables.tsCol($"ts"))
        .groupBy(window($"tstamp", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(18, 2))).cast("double").as("total"))
        .select($"window.start".as("window_start"), $"event_type", $"n", $"total")
      val sink = s"graft_stream_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
      StreamConf.withStatePartitions(s, 8) {
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(sink).start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).orderBy("window_start", "event_type")
    },

    // Stream-STATIC join: the arriving event feed enriched against a static
    // dimension table — the streaming analog of the reference's event loop
    // reading a store table per event (CForeach + ELoc, Ex_Orders.v:54).
    // The static side broadcasts, so the join is STATELESS map-side work on
    // the stream; only the downstream aggregation keeps state. That's the
    // shape that scales: no stream-stream state, no repartition of arrivals.
    GraftQuery.sql("q_stream_join",
      """SELECT c_mktsegment AS seg, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      import s.implicits._
      val schema = Tables.load(s, dir, "events").schema
      val watchDir = java.nio.file.Files.createTempDirectory("graft_sjoin_")
      java.nio.file.Files.createSymbolicLink(
        watchDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = s.readStream.schema(schema).parquet(watchDir.toString)
      val dim = broadcast(Tables.load(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment"))
      val joined = stream.join(dim, $"user_id" === $"c_custkey")
        .groupBy($"c_mktsegment".as("seg"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(18, 2))).cast("double").as("total"))
      val sink = s"graft_sjoin_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
      StreamConf.withStatePartitions(s, 8) {
        val q = joined.writeStream.outputMode("complete")
          .format("memory").queryName(sink).start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).orderBy("seg")
    },

    // Stream-STREAM interval join: click events joined to the same user's
    // purchase events within the following hour. Both sides carry
    // WATERMARKS and the join condition is an event-time INTERVAL, so the
    // state store holds only the last ~watermark horizon of each stream —
    // bounded state regardless of total stream length, which is the shape
    // that survives an unbounded feed at scale (inner-join rows emit as
    // soon as matched; the watermark only bounds state retention). The
    // oracle is the equivalent batch self-join, truncated to the engine's
    // microsecond event-time precision.
    GraftQuery.sql("q_stream_stream_join",
      """SELECT a.user_id AS user_id, a.event_id AS click_id,
        |       b.event_id AS purchase_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND date_trunc('microseconds', b.ts) >= date_trunc('microseconds', a.ts)
        | AND date_trunc('microseconds', b.ts) <=
        |     date_trunc('microseconds', a.ts) + INTERVAL 1 HOUR
        |ORDER BY user_id, click_id, purchase_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val schema = Tables.load(s, dir, "events").schema
      val watchDir = java.nio.file.Files.createTempDirectory("graft_ssjoin_")
      java.nio.file.Files.createSymbolicLink(
        watchDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val src = s.readStream.schema(schema).parquet(watchDir.toString)
      val clicks = src.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user"),
          Tables.tsCol($"ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val purchases = src.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
          Tables.tsCol($"ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val joined = clicks.join(purchases,
        $"c_user" === $"p_user" && $"p_ts" >= $"c_ts" &&
          $"p_ts" <= $"c_ts" + expr("INTERVAL 1 HOUR"))
        .select($"c_user".as("user_id"), $"click_id", $"purchase_id")
      val sink = s"graft_ssj_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
      // A stream-stream join keeps FOUR state stores per shuffle partition
      // (left/right × keyToNumValues/keyWithIndexToValue), each with its
      // own checkpoint commit per batch — per-partition overhead dominates
      // a modest feed (see StreamConf).
      StreamConf.withStatePartitions(s, 8) {
        val q = joined.writeStream.outputMode("append")
          .format("memory").queryName(sink).start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).orderBy("user_id", "click_id", "purchase_id")
    },
  )
}
