package graft.queries

import graft.Tables
import graft.ext.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral-analytics suite over `events`: the sequential funnel and
  * the weekly retention triangle. Oracles replay the step chain /
  * cohort derivation exactly (dates and counts only — no floats).
  */
object AnalyticsQueries extends QueryGroup {

  private val FunnelSteps = Seq("view", "click", "purchase")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Strict view -> click -> purchase funnel: step k counts only
    // strictly after that user's step k-1 (first occurrences).
    "funnel_steps" -> ((s, dir) => {
      Analytics.funnel(Tables.events(s, dir), "user_id", "event_type", "ts", FunnelSteps)
        .orderBy("step_idx")
    }),

    // Weekly cohort retention triangle (cohort = Monday week of first
    // event; exact distinct users per offset).
    "cohort_retention" -> ((s, dir) => {
      Analytics.cohortRetention(Tables.events(s, dir), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    }),

    // Trailing-hour per-user features: count/sum/max of the user's
    // events in the preceding 3600s (RANGE frame over epoch seconds —
    // tie-insensitive, so deterministic; integer cents only).
    "rolling_user_stats" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      Analytics.rollingStats(e, "user_id", "ts", "cents", windowSec = 3600L)
        .select("event_id", "user_id", "t_sec", "w_cnt", "w_sum", "w_max")
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "funnel_steps" ->
      """WITH u1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
u2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1),
u3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1)
SELECT CAST(1 AS INTEGER) AS step_idx, 'view' AS step,
       (SELECT CAST(count(*) AS BIGINT) FROM u1) AS n_users
UNION ALL
SELECT CAST(2 AS INTEGER), 'click', (SELECT CAST(count(*) AS BIGINT) FROM u2)
UNION ALL
SELECT CAST(3 AS INTEGER), 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM u3)
ORDER BY step_idx""",

    "cohort_retention" ->
      """WITH c AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1),
a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events)
SELECT c.cohort_week,
  CAST(datediff('day', c.cohort_week, a.week) // 7 AS INTEGER) AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2""",

    "rolling_user_stats" ->
      """WITH e AS (
  SELECT event_id, user_id,
    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS t_sec,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id, t_sec,
  CAST(count(*) OVER w AS BIGINT) AS w_cnt,
  CAST(sum(cents) OVER w AS BIGINT) AS w_sum,
  max(cents) OVER w AS w_max
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY t_sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_id"""
  )
}
