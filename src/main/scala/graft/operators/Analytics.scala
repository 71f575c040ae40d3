package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Product-analytics operators over the events feed plus a generic column
  * profiler — the interactive-analysis side of the engine (the reference's
  * HTTP-served queries are exactly this shape: parameterized aggregations
  * over a mutable store, `haskellServer/src/Lib.hs:28-46`).
  *
  * Scale notes: the funnel and the cohort matrix are each ONE hash shuffle
  * by user (conditional aggregates inside the group — no self-joins, no
  * window sorts); the profiler is a single Expand-based pass producing all
  * per-column statistics map-side before one exchange.
  */
object Analytics {

  val queries: Seq[GraftQuery] = Seq(

    // FUNNEL: view → click conversion. Phase 1 is one groupBy(user) with
    // conditional mins (first view, first click AFTER that view — computed
    // with a min over a filtered struct, still inside the same aggregate);
    // phase 2 is a global roll-up. No event-to-event self-join.
    GraftQuery.sql("q_funnel",
      """WITH u AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT u.user_id, u.tv,
        |    MIN(CASE WHEN e.event_type = 'click' AND e.ts > u.tv THEN e.ts END) AS tc
        |  FROM u JOIN events e USING (user_id)
        |  GROUP BY u.user_id, u.tv)
        |SELECT COUNT(*) AS n_users,
        |  COUNT(tv) AS n_viewed,
        |  COUNT(CASE WHEN tc IS NOT NULL THEN 1 END) AS n_converted,
        |  CAST(COUNT(CASE WHEN tc IS NOT NULL THEN 1 END) AS DOUBLE)
        |    / COUNT(tv) AS conversion
        |FROM c""".stripMargin) { (s, dir) =>
      import s.implicits._
      val events = Tables.load(s, dir, "events")
      val u = events.groupBy($"user_id")
        .agg(min(when($"event_type" === "view", $"ts")).as("tv"))
      val c = events.join(u, "user_id")
        .groupBy($"user_id", $"tv")
        .agg(min(when($"event_type" === "click" && $"ts" > $"tv", $"ts"))
          .as("tc"))
      c.agg(count(lit(1)).as("n_users"),
        count($"tv").as("n_viewed"),
        count(when($"tc".isNotNull, 1)).as("n_converted"),
        (count(when($"tc".isNotNull, 1)).cast("double") / count($"tv"))
          .as("conversion"))
    },

    // COHORT RETENTION: users grouped by first-activity week; the matrix
    // counts distinct users active k weeks after their cohort week. Two
    // aggregations (first-activity per user, then the matrix) — both hash
    // shuffles with map-side partials, no windows.
    GraftQuery.sql("q_cohort_retention",
      """WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort,
        |        CAST((CAST(epoch(date_trunc('week', e.ts)) AS BIGINT)
        |              - CAST(epoch(f.cohort) AS BIGINT)) / 604800 AS BIGINT) AS wk
        |      FROM events e JOIN f USING (user_id))
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, wk, COUNT(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_week, wk""".stripMargin) { (s, dir) =>
      import s.implicits._
      // normalize whichever stored ts layout to a µs timestamp first —
      // week-level truncation is unaffected
      val ev = Tables.load(s, dir, "events")
      val events = ev.withColumn("tstamp", Tables.tsCol(ev))
      val f = events.groupBy($"user_id")
        .agg(date_trunc("week", min($"tstamp")).as("cohort"))
      events.join(f, "user_id")
        .select($"user_id", $"cohort",
          ((unix_timestamp(date_trunc("week", $"tstamp"))
            - unix_timestamp($"cohort")) / 604800).cast("long").as("wk"))
        .distinct()
        .groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"), $"wk")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "wk")
    },

    // CUMULATIVE WINDOW: per-user running event total over time — one
    // window shuffle (hash by user, in-partition sort), decimal prefix
    // sums so the cross-engine compare is exact at any prefix length.
    GraftQuery.sql("q_window_cume",
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS running
        |FROM events WHERE user_id < 5 ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "events")
        .filter($"user_id" < 5)
        .select($"user_id", $"event_id",
          sum($"value".cast("decimal(18,2)")).over(
            Window.partitionBy($"user_id").orderBy($"ts", $"event_id"))
            .cast("double").as("running"))
        .orderBy("user_id", "event_id")
    },

    // PIVOT: event counts per user across a FIXED type set — Spark's
    // .pivot with explicit values stays a single aggregate (no extra
    // distinct-values job); the oracle spells the same conditional sums.
    GraftQuery.sql("q_pivot",
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events WHERE user_id < 10 GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .filter($"user_id" < 10)
        .groupBy($"user_id")
        .pivot("event_type", Seq("view", "click", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select($"user_id", $"view".as("n_view"), $"click".as("n_click"),
          $"error".as("n_error"))
        .orderBy("user_id")
    },

    // ROLLUP: the grouping-sets lattice over (status, priority) — counts
    // and long sums at every level in one pass (Expand + single shuffle).
    GraftQuery.sql("q_rollup",
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  COUNT(*) AS n, CAST(CAST(SUM(o_custkey) AS HUGEINT) AS VARCHAR) AS cust_sum
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status NULLS FIRST, priority NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Decimal(38,0) partials: the grand-total rollup row sums EVERY
      // 64-bit key — past int64 at the 27x corpus already
      Tables.load(s, dir, "orders")
        .rollup($"o_orderstatus".as("status"), $"o_orderpriority".as("priority"))
        .agg(count(lit(1)).as("n"),
          sum($"o_custkey".cast("decimal(38,0)")).cast("string")
            .as("cust_sum"))
        .orderBy($"status".asc_nulls_first, $"priority".asc_nulls_first)
    },

    // COLUMN PROFILER: null counts + exact distinct cardinality for a
    // column set in ONE aggregation pass (multiple count-distincts expand
    // map-side); output unpivoted to a row per column. At 100 TB the
    // distinct counts switch to the HLL sketch shown in q_approx_distinct.
    GraftQuery.sql("q_profile",
      """SELECT 'l_orderkey' AS col, COUNT(*) AS n,
        |  COUNT(*) - COUNT(l_orderkey) AS n_null,
        |  COUNT(DISTINCT l_orderkey) AS n_distinct FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
        |  COUNT(DISTINCT l_quantity) FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
        |  COUNT(DISTINCT l_returnflag) FROM lineitem
        |ORDER BY col""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
      val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c"))
      }
      val one = Tables.load(s, dir, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
      // unpivot by exploding per-column structs over the ONE-row aggregate
      // — a union of per-column selects would re-execute the whole
      // aggregation (three count-distinct Expands) once per branch
      val perCol = cols.map { c =>
        struct(lit(c).as("col"), $"n",
          ($"n" - col(s"nn_$c")).as("n_null"),
          col(s"nd_$c").as("n_distinct"))
      }
      one.select(explode(array(perCol: _*)).as("r"))
        .select($"r.col".as("col"), $"r.n".as("n"),
          $"r.n_null".as("n_null"), $"r.n_distinct".as("n_distinct"))
        .orderBy("col")
    },
  )
}
