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

    // MERGE / UPSERT — the lakehouse write primitive: apply a small batch
    // of whole-row upserts and deletes to a large keyed target. Spark-
    // first shape: target LEFT ANTI join the batch's keys (matched rows
    // drop out) ∪ the batch's non-delete rows — the big side shuffles
    // never more than once, and the batch side BROADCASTS (plan-asserted
    // in MergeSpec), which is the realistic big-target/small-delta
    // geometry at 100 TB. The oracle is the textbook NOT IN + UNION ALL.
    GraftQuery.sql("q_merge_upsert",
      """WITH batch(o_orderkey, o_custkey, status, op) AS (VALUES
        |    (1, 999999, 'X', 'U'),
        |    (2, 999999, 'X', 'U'),
        |    (9000001, 777777, 'N', 'I'),
        |    (3, NULL, NULL, 'D')),
        |tgt AS (SELECT o_orderkey, o_custkey, o_orderstatus AS status
        |        FROM orders)
        |SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey, status
        |FROM (
        |  SELECT t.* FROM tgt t
        |  WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM batch)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, status FROM batch WHERE op <> 'D')
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val target = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".as("status"))
      val batch = Seq(
        (1L, Some(999999L), Some("X"), "U"),
        (2L, Some(999999L), Some("X"), "U"),
        (9000001L, Some(777777L), Some("N"), "I"),
        (3L, None: Option[Long], None: Option[String], "D"))
        .toDF("o_orderkey", "o_custkey", "status", "op")
      target
        .join(broadcast(batch.select($"o_orderkey")), Seq("o_orderkey"),
          "left_anti")
        .unionByName(batch.filter($"op" =!= "D").drop("op"))
        .orderBy("o_orderkey")
    },
  )
}
