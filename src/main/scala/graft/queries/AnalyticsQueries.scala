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
    }),

    // Snapshot-drift report: even vs odd doc_ids stand in for day-1 vs
    // day-2 corpus dumps; dimensions = language, source, and a 256-char
    // length bucket. Integer counts only — TV/PSI are reader-side.
    "drift_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Analytics.driftReport(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        Seq("lang" -> col("lang"), "source" -> col("source"),
          "len_bucket" -> expr("n_chars div 256")))
        .orderBy("dim", "value")
    }),

    // Extreme-cardinality drift: PER-TOKEN counts between the two
    // snapshot halves — the dimension shape (web-scale vocabulary)
    // where drift_report's dim-partitioned totals window would put one
    // dimension's entire value set in a single partition. The hicard
    // variant derives totals as a scalar aggregate over the persisted
    // count table; the plan is asserted window-free (ScaleBehaviorSpec).
    "drift_report_hicard" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def toks(d: org.apache.spark.sql.DataFrame) =
        d.select(explode(split(col("text"), " ")).as("tok"))
      Analytics.driftReportHiCard(
        toks(docs.filter(col("doc_id") % 2 === 0)),
        toks(docs.filter(col("doc_id") % 2 === 1)),
        Seq("token" -> col("tok")))
        .orderBy("dim", "value")
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
ORDER BY event_id""",

    "drift_report" ->
      """WITH av AS (
  SELECT 'lang' AS dim, coalesce(CAST(lang AS VARCHAR), '<null>') AS value
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'source', coalesce(CAST(source AS VARCHAR), '<null>')
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'len_bucket', coalesce(CAST(n_chars // 256 AS VARCHAR), '<null>')
  FROM documents WHERE doc_id % 2 = 0),
bv AS (
  SELECT 'lang' AS dim, coalesce(CAST(lang AS VARCHAR), '<null>') AS value
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'source', coalesce(CAST(source AS VARCHAR), '<null>')
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'len_bucket', coalesce(CAST(n_chars // 256 AS VARCHAR), '<null>')
  FROM documents WHERE doc_id % 2 = 1),
ac AS (SELECT dim, value, CAST(count(*) AS BIGINT) AS n_a FROM av GROUP BY 1, 2),
bc AS (SELECT dim, value, CAST(count(*) AS BIGINT) AS n_b FROM bv GROUP BY 1, 2),
j AS (
  SELECT coalesce(ac.dim, bc.dim) AS dim, coalesce(ac.value, bc.value) AS value,
    coalesce(ac.n_a, 0) AS n_a, coalesce(bc.n_b, 0) AS n_b
  FROM ac FULL OUTER JOIN bc ON ac.dim = bc.dim AND ac.value = bc.value),
t AS (
  SELECT dim, CAST(sum(n_a) AS BIGINT) AS tot_a, CAST(sum(n_b) AS BIGINT) AS tot_b
  FROM j GROUP BY 1)
SELECT j.dim, j.value, j.n_a, j.n_b, t.tot_a, t.tot_b
FROM j JOIN t USING (dim) ORDER BY dim, value""",

    "drift_report_hicard" ->
      """WITH av AS (
  SELECT 'token' AS dim, unnest(string_split(text, ' ')) AS value
  FROM documents WHERE doc_id % 2 = 0),
bv AS (
  SELECT 'token' AS dim, unnest(string_split(text, ' ')) AS value
  FROM documents WHERE doc_id % 2 = 1),
ac AS (SELECT dim, value, CAST(count(*) AS BIGINT) AS n_a FROM av GROUP BY 1, 2),
bc AS (SELECT dim, value, CAST(count(*) AS BIGINT) AS n_b FROM bv GROUP BY 1, 2),
j AS (
  SELECT coalesce(ac.dim, bc.dim) AS dim, coalesce(ac.value, bc.value) AS value,
    coalesce(ac.n_a, 0) AS n_a, coalesce(bc.n_b, 0) AS n_b
  FROM ac FULL OUTER JOIN bc ON ac.dim = bc.dim AND ac.value = bc.value),
t AS (
  SELECT dim, CAST(sum(n_a) AS BIGINT) AS tot_a, CAST(sum(n_b) AS BIGINT) AS tot_b
  FROM j GROUP BY 1)
SELECT j.dim, j.value, j.n_a, j.n_b, t.tot_a, t.tot_b
FROM j JOIN t USING (dim) ORDER BY dim, value"""
  )
}
