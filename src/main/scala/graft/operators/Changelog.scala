package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Changelog semantics over the events feed — the maintenance side of an
  * incrementally updated corpus: apply a keyed changelog to get the
  * current snapshot, and extract typed fields from semi-structured
  * payloads.
  *
  * Scale notes: the snapshot is ONE shuffle (hash by key) + per-partition
  * rank — the canonical "latest record wins" materialization; at 100 TB
  * the same plan runs per key-range partition. JSON extraction is
  * map-only (a native `get_json_object` projection, no UDF).
  */
object Changelog {

  val queries: Seq[GraftQuery] = Seq(

    // CDC APPLY: the event stream read as a changelog keyed by user_id in
    // (ts, event_id) arrival order; the current snapshot keeps each key's
    // last record, and a key whose last record is a tombstone
    // (event_type = 'error' here) is absent from the snapshot.
    GraftQuery.sql("q_cdc_snapshot",
      """SELECT user_id, event_type AS last_type,
        |  CAST(value AS DOUBLE) AS last_value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)))
        .filter($"rn" === 1 && $"event_type" =!= "error")
        .select($"user_id", $"event_type".as("last_type"),
          $"value".cast("double").as("last_value"))
        .orderBy("user_id")
    },

    // SEMI-STRUCTURED EXTRACTION: pull a typed field out of the JSON
    // `props` payload and aggregate it — map-only extraction feeding a
    // partial-aggregated group-by (integer sum, engine-exact).
    GraftQuery.sql("q_json_extract",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(get_json_object($"props", "$.k").cast("long")).as("k_sum"))
        .orderBy("event_type")
    },
  )
}
