package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{GraftQuery, Tables}

/** Streaming UPSERT materialization — `foreachBatch` + keyed merge, the
  * standard "CDC feed → queryable current-state table" pattern when the
  * sink is a plain table rather than a stateful streaming operator. Each
  * micro-batch merges into the accumulated target: union, keep the
  * per-key latest row (ts, then event_id as the deterministic tie-break),
  * checkpoint to cut lineage.
  *
  * Scale shape: the target stays KEY-CARDINALITY sized (one row per user)
  * no matter how much feed has passed through; the per-batch cost is one
  * hash shuffle of target ∪ batch on the key — the realistic geometry of a
  * big-feed/small-state merge. The feed is split into multiple arrival
  * chunks (maxFilesPerTrigger=1) so the merge provably runs ACROSS
  * micro-batches, not in one degenerate batch; the final state must be
  * arrival-order independent, which the batch oracle (global latest per
  * key) checks exactly.
  */
object StreamUpsert {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery.sql("q_stream_upsert",
      """WITH r AS (SELECT user_id, ts, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events)
        |SELECT user_id, ts AS last_ts, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val events = ev
        .select($"event_id", Tables.tsCol(ev).as("ts"), $"user_id",
          $"value")
      // split the feed into arrival chunks so the merge loop really runs
      // across several micro-batches; the chunk files are a pure function
      // of the source — staged once, shared by every run
      val feedDir = StreamStage.stagedOnce("supsert", dir) { p =>
        events.repartition(4).write.mode("overwrite").parquet(p.toString)
      }
      val stream = s.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir.toString)

      def latest(df: DataFrame): DataFrame = {
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".desc, $"event_id".desc)
        df.withColumn("__rn", row_number().over(w))
          .filter($"__rn" === 1).drop("__rn")
      }
      var target = s.createDataFrame(
        s.sparkContext.emptyRDD[Row], events.schema)
      val mergeBatch: (Dataset[Row], Long) => Unit = (batch, _) => {
        target = latest(target.unionByName(batch)).localCheckpoint()
      }
      val q = stream.writeStream.foreachBatch(mergeBatch).start()
      try q.processAllAvailable() finally q.stop()
      target.select($"user_id", $"ts".cast("timestamp_ntz").as("last_ts"),
        $"value".as("last_value")).orderBy("user_id")
    },
  )
}
