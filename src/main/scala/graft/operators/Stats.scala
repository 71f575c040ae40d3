package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{GraftQuery, Tables}

/** Order statistics. Discrete (selection-based) percentiles — the value AT
  * position ceil(p·n) of the sorted group — are exact and engine-portable;
  * interpolated percentiles differ between engines in final ulps (measured),
  * so both sides spell out the same selection formula.
  *
  * Two implementations of the same semantics:
  *   - `q_percentiles`: collect_list per group — fine while groups fit an
  *     executor; the simple form.
  *   - `q_percentiles_dist`: the SCALE path — rank selection over a window
  *     (one hash shuffle by group + in-partition external sort, which
  *     spills). No group is ever materialized as an array, so a single
  *     group larger than executor memory still computes.
  */
object Stats {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q_percentiles",
      """WITH g AS (SELECT event_type, COUNT(*) AS n, MAX(value) AS mx,
        |                  list(value ORDER BY value) AS l
        |           FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(l[CAST(ceil(0.5 * len(l)) AS INT)] AS DOUBLE) AS p50,
        |  CAST(l[CAST(ceil(0.9 * len(l)) AS INT)] AS DOUBLE) AS p90,
        |  CAST(mx AS DOUBLE) AS mx
        |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sorted = sort_array(collect_list($"value"))
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sorted.as("l"), max($"value").as("mx"))
        .select($"event_type", $"n",
          get($"l", ceil(lit(0.5) * size($"l")).cast("int") - 1)
            .cast("double").as("p50"),
          get($"l", ceil(lit(0.9) * size($"l")).cast("int") - 1)
            .cast("double").as("p90"),
          $"mx".cast("double").as("mx"))
        .orderBy("event_type")
    },

    // Same selection semantics, distributed: row_number + group count over
    // one window partitioning, then pick the rows AT the target ranks.
    // Ties in `value` rank arbitrarily but the value at a rank of the
    // sorted order is deterministic, so the result is exact.
    GraftQuery.sql("q_percentiles_dist",
      """WITH g AS (SELECT event_type, COUNT(*) AS n, MAX(value) AS mx,
        |                  list(value ORDER BY value) AS l
        |           FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(l[CAST(ceil(0.5 * len(l)) AS INT)] AS DOUBLE) AS p50,
        |  CAST(l[CAST(ceil(0.9 * len(l)) AS INT)] AS DOUBLE) AS p90,
        |  CAST(mx AS DOUBLE) AS mx
        |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byGroup = Window.partitionBy("event_type")
      val ranked = Tables.load(s, dir, "events")
        .select($"event_type", $"value")
        .withColumn("rn", row_number().over(byGroup.orderBy("value")))
        .withColumn("n", count(lit(1)).over(byGroup))
      def target(p: Double) = ceil(lit(p) * $"n").cast("long")
      ranked
        .filter($"rn" === target(0.5) || $"rn" === target(0.9) || $"rn" === $"n")
        .groupBy($"event_type")
        .agg(max($"n").as("n"),
          max(when($"rn" === target(0.5), $"value")).cast("double").as("p50"),
          max(when($"rn" === target(0.9), $"value")).cast("double").as("p90"),
          max(when($"rn" === $"n", $"value")).cast("double").as("mx"))
        .orderBy("event_type")
    },

    // Arg-max per group — "keep the best row per key" (best doc per
    // cluster, latest record per entity): native `max_by` with a composite
    // (value, -key) order so ties break deterministically, one shuffle
    // with map-side partial max — no window sort, no group
    // materialization.
    GraftQuery.sql("q_argmax_group",
      """SELECT c_mktsegment AS segment, c_custkey AS top_cust,
        |  CAST(c_acctbal AS DOUBLE) AS top_bal
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |        ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer)
        |WHERE rn = 1 ORDER BY segment""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer")
        .groupBy($"c_mktsegment".as("segment"))
        .agg(max_by($"c_custkey", struct($"c_acctbal", -$"c_custkey"))
            .as("top_cust"),
          max($"c_acctbal").cast("double").as("top_bal"))
        .orderBy("segment")
    },

    // The SKETCH path for percentiles at 100 TB: percentile_approx
    // (Greenwald-Khanna, mergeable partial sketches — one map-side pass,
    // no per-group materialization, no window sort) next to the exact
    // selection percentile, asserting the sketch lands within 5% relative
    // error. GK is deterministic for a given dataset and accuracy, so the
    // boolean is stable; the oracle states the bound.
    GraftQuery.sql("q_approx_quantiles",
      """SELECT 0.5 AS p, true AS approx_ok FROM (SELECT 1)
        |UNION ALL SELECT 0.9, true
        |ORDER BY p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sorted = sort_array(collect_list($"value"))
      def exact(p: Double) =
        get(sorted, ceil(lit(p) * size(sorted)).cast("int") - 1)
      val r = Tables.load(s, dir, "events")
        .agg(exact(0.5).as("e50"), exact(0.9).as("e90"),
          percentile_approx($"value", lit(0.5), lit(1000)).as("a50"),
          percentile_approx($"value", lit(0.9), lit(1000)).as("a90"))
        .select(
          (abs($"a50" - $"e50") / abs($"e50") < 0.05).as("ok50"),
          (abs($"a90" - $"e90") / abs($"e90") < 0.05).as("ok90"))
      r.select(lit(0.5).as("p"), $"ok50".as("approx_ok"))
        .union(r.select(lit(0.9), $"ok90"))
        .orderBy("p")
    },
  )
}
