package graft.queries

import graft.Tables
import graft.ext.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}

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
GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
