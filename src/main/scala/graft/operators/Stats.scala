package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{GraftQuery, Tables}

/** Order statistics. Discrete (selection-based) percentiles — the value AT
  * position ceil(p·n) of the sorted group — are exact and engine-portable;
  * interpolated percentiles differ between engines in final ulps (measured),
  * so both sides spell out the same selection formula. At scale the
  * collect_list per group bounds group size; for huge groups switch to
  * approx_percentile (sketch) or a two-pass rank computation.
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
  )
}
