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
  )
}
