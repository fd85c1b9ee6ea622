package graft.queries

import graft.Q

/** Event-analytics operators over the `events` table (funnels, cohort
  * retention) — the batch side of the product-analytics surface that
  * complements the streaming twins in [[graft.streaming.EventStream]].
  * Both are single-shuffle plans: one groupBy(user_id) pass derives the
  * per-user timeline facts, everything after operates on one row per user
  * (funnel) or per (cohort, week) (retention) — at 100 TB the shuffle is
  * the unavoidable key-grouping and the aggregate state is O(users) /
  * O(cohorts × weeks), never O(events). */
object Events {

  /** Ordered conversion funnel signup → view → click → purchase, the
    * first-touch formulation: a user converts to stage n+1 iff their first
    * stage-(n+1) event is strictly after their first stage-n event.
    * Verbatim-shared SQL: one conditional-aggregation pass builds the
    * per-user stage timestamps, a UNION ALL fans out the 4 stage counts. */
  val funnel: Q = Q.sql("ev_funnel",
    """WITH u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t2,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t3,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
      |  FROM events GROUP BY user_id),
      |s AS (
      |  SELECT user_id,
      |    (t1 IS NOT NULL) AS s1,
      |    (t1 IS NOT NULL AND t2 > t1) AS s2,
      |    (t1 IS NOT NULL AND t2 > t1 AND t3 > t2) AS s3,
      |    (t1 IS NOT NULL AND t2 > t1 AND t3 > t2 AND t4 > t3) AS s4
      |  FROM u)
      |SELECT 1 AS stage, 'signup' AS stage_name,
      |       count(CASE WHEN s1 THEN 1 END) AS users FROM s
      |UNION ALL
      |SELECT 2 AS stage, 'view' AS stage_name,
      |       count(CASE WHEN s2 THEN 1 END) AS users FROM s
      |UNION ALL
      |SELECT 3 AS stage, 'click' AS stage_name,
      |       count(CASE WHEN s3 THEN 1 END) AS users FROM s
      |UNION ALL
      |SELECT 4 AS stage, 'purchase' AS stage_name,
      |       count(CASE WHEN s4 THEN 1 END) AS users FROM s""".stripMargin)

  /** Weekly cohort retention: cohort = ISO week of the user's first event,
    * cell = distinct users from that cohort active k weeks later. Week
    * arithmetic runs on week-truncated dates (both engines truncate to
    * Monday), so the day difference is exactly divisible by 7 — the offset
    * is integer-exact, no timezone/rounding seam. Engine texts differ only
    * in the date-diff spelling (Spark `datediff(a,b)` days vs DuckDB
    * `datediff('day',b,a)`). */
  val retention: Q = Q("ev_retention",
    """WITH f AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT e.user_id, f.cohort,
      |    CAST(date_trunc('week', e.ts) AS DATE) AS wk
      |  FROM events e JOIN f ON e.user_id = f.user_id)
      |SELECT cohort, datediff('day', cohort, wk) // 7 AS week_offset,
      |       count(*) AS active_users
      |FROM a GROUP BY cohort, week_offset""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(s, dir, "events")
    val first = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
    val active = e.join(first, "user_id")
      .select(col("user_id"), col("cohort"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    active
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Time-series resample with gap filling: 6-hour epoch-anchored buckets
    * over the observed range; empty buckets materialize as zero rows (the
    * step most engines call time_bucket + generate_series). Buckets are
    * BIGINT epoch seconds — integer-exact in both engines and free of
    * timestamp/timestamptz type seams. The grid is O(range/width) rows
    * (tiny), so the gap-fill join broadcasts it; the data side is one
    * groupBy — at 100 TB the aggregate is the only real shuffle. */
  val resample: Q = Q("ev_resample",
    """WITH w AS (SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
      |             AS bucket_s, value
      |           FROM events),
      |a AS (SELECT bucket_s, count(*) AS n_events,
      |        CAST(round(sum(value) * 100) AS BIGINT) AS value_c
      |      FROM w GROUP BY bucket_s),
      |b AS (SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM w),
      |g AS (SELECT unnest(generate_series(lo, hi, 21600)) AS bucket_s FROM b)
      |SELECT g.bucket_s, coalesce(a.n_events, 0) AS n_events,
      |       coalesce(a.value_c, 0) AS value_c
      |FROM g LEFT JOIN a USING (bucket_s)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions._
    val w = graft.Tables.load(s, dir, "events")
      .select((floor(unix_timestamp(col("ts")) / 21600) * 21600)
        .cast("long").as("bucket_s"), col("value"))
    val a = w.groupBy("bucket_s")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")) * 100).cast("long").as("value_c"))
    val grid = w.agg(min(col("bucket_s")).as("lo"), max(col("bucket_s")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(21600L)))
        .as("bucket_s"))
    broadcast(grid).join(a, Seq("bucket_s"), "left")
      .select(col("bucket_s"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_c"), lit(0L)).as("value_c"))
  }

  val all: Seq[Q] = Seq(funnel, retention, resample)
}
