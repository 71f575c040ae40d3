package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GraftQuery, Tables}

/** Temporal joins over the event stream — beyond the reference's operator
  * set (its θ-join covers these semantically but a naive nested-loop plan
  * dies at scale), these are the two shapes every event pipeline needs:
  *
  *  - AS-OF: each right event joined to the LATEST left event at or before
  *    it. One window over (user, time) — a single shuffle, no join at all,
  *    which is the plan that survives any data size (the classic
  *    sort-merge as-of join expressed as lag-carry).
  *  - RANGE: pairs within a time interval. Bucketize time at the interval
  *    width; a pair within the window can only span adjacent buckets, so
  *    the LEFT side claims buckets (b, b+1) and the join is a plain
  *    equi-join on (user, bucket) + an exact residual filter — candidate
  *    pairs are bucket-local, never user-cross-product. Each true pair is
  *    produced exactly once (the right event's bucket is fixed).
  *
  * All event times are compared as integer epoch-MICROSECONDS on both
  * engines (the engine's timestamp precision), so ordering and the range
  * residual are exact — no float or ns-vs-µs edge.
  */
object Temporal {

  private val HourUs = 3600000000L

  val queries: Seq[GraftQuery] = Seq(

    // AS-OF join: for every purchase, the latest prior click of the same
    // user (NULL when the user never clicked before purchasing).
    GraftQuery.sql("q_asof_join",
      """WITH u AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS t,
        |                  event_id, event_type
        |           FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT *, last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |        OVER (PARTITION BY user_id ORDER BY t, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
        |      FROM u)
        |SELECT event_id AS purchase_id, user_id, prior_click
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val u = ev
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", Tables.epochUs(ev).as("t"),
          $"event_id", $"event_type")
      val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      u.withColumn("prior_click",
          last(when($"event_type" === "click", $"event_id"),
            ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"prior_click")
        .orderBy("purchase_id")
    },

    // Bucketed RANGE join: every error within the hour after a click by
    // the same user. The exact pair set — the bucketing only prunes
    // candidates; the residual filter re-checks the true interval.
    GraftQuery.sql("q_range_join",
      s"""WITH u AS (SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS t,
        |                  event_id, event_type FROM events),
        |c AS (SELECT user_id, t, event_id FROM u WHERE event_type = 'click'),
        |er AS (SELECT user_id, t, event_id FROM u WHERE event_type = 'error')
        |SELECT c.event_id AS click_id, er.event_id AS error_id,
        |       c.user_id AS user_id
        |FROM c JOIN er ON c.user_id = er.user_id
        | AND er.t >= c.t AND er.t < c.t + $HourUs
        |ORDER BY click_id, error_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val u = ev
        .select($"user_id", Tables.epochUs(ev).as("t"),
          $"event_id", $"event_type")
      // integral division (like Tables.tsCol) — long/long `/` would be a
      // double divide whose rounding could misbucket an extreme timestamp
      // and silently drop a pair the residual filter can't recover
      val bucket = (t: org.apache.spark.sql.Column) =>
        call_function("div", t, lit(HourUs))
      val clicks = u.filter($"event_type" === "click")
        .select($"user_id", $"t".as("ct"), $"event_id".as("click_id"))
        .withColumn("bucket",
          explode(array(bucket($"ct"), bucket($"ct") + 1)))
      val errors = u.filter($"event_type" === "error")
        .select($"user_id", $"t".as("et"), $"event_id".as("error_id"),
          bucket($"t").as("bucket"))
      clicks.join(errors, Seq("user_id", "bucket"))
        .filter($"et" >= $"ct" && $"et" < $"ct" + HourUs)
        .select($"click_id", $"error_id", $"user_id")
        .orderBy("click_id", "error_id")
    },

    // SLIDING windows (1 hour every 30 minutes): every event lands in
    // exactly two overlapping windows — Spark's `window(slide)` generator
    // in a batch aggregation. The oracle derives the two epoch-aligned
    // window starts per event arithmetically (integer µs), so window
    // boundary semantics are checked exactly.
    GraftQuery.sql("q_sliding_window",
      """WITH u AS (SELECT epoch_us(date_trunc('microseconds', ts)) AS t,
        |                  event_type FROM events),
        |w AS (SELECT t, event_type, (t // 1800000000) * 1800000000 AS ws1 FROM u),
        |x AS (SELECT event_type, ws1 AS ws FROM w
        |      UNION ALL SELECT event_type, ws1 - 1800000000 FROM w)
        |SELECT CAST(ws AS BIGINT) AS window_start_us, event_type,
        |       COUNT(*) AS n
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      ev.withColumn("tstamp", Tables.tsCol(ev))
        .groupBy(window($"tstamp", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"window.start").as("window_start_us"),
          $"event_type", $"n")
        .orderBy("window_start_us", "event_type")
    },
  )
}
