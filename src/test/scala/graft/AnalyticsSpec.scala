package graft

import graft.ext.Analytics
import org.apache.spark.sql.functions._

/** Hand-computed funnel and retention fixtures; the strictness rules
  * (step order, first-occurrence, whole-week offsets) are the part an
  * aggregate query gets subtly wrong, so they're pinned here.
  */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf(_: String)

  test("funnel is strictly sequential: later steps only count after earlier ones") {
    val events = Seq(
      // u1 completes in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2 clicked BEFORE viewing — click must not count
      (2L, "click", ts("2024-01-02 09:00:00")),
      (2L, "view", ts("2024-01-02 10:00:00")),
      // u3 views only
      (3L, "view", ts("2024-01-03 10:00:00")),
      // u4 purchase first, then view+click: purchase must not count
      (4L, "purchase", ts("2024-01-04 08:00:00")),
      (4L, "view", ts("2024-01-04 09:00:00")),
      (4L, "click", ts("2024-01-04 10:00:00"))
    ).toDF("user_id", "event_type", "t")

    val out = Analytics.funnel(events, "user_id", "event_type", "t",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .select("step", "n_users").as[(String, Long)].collect().toSeq
    // view: u1 u2 u3 u4 = 4; click after view: u1 u4 = 2; purchase after that: u1 = 1
    assert(out == Seq(("view", 4L), ("click", 2L), ("purchase", 1L)))
  }

  test("funnel uses FIRST qualifying occurrences, not any pair") {
    val events = Seq(
      // first view at 10:00; the 09:00 click predates it, the 11:00 counts
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      // purchase between the clicks: after first view but before the
      // QUALIFYING click (11:00) — must not count
      (1L, "purchase", ts("2024-01-01 10:30:00"))
    ).toDF("user_id", "event_type", "t")
    val out = Analytics.funnel(events, "user_id", "event_type", "t",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx").select("n_users").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L, 0L))
  }

  test("cohortRetention cohorts by first-event Monday week with whole-week offsets") {
    val events = Seq(
      // u1 first event Tue 2024-01-02 (week of Mon 1/1), active again week of 1/8 and 1/22
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-24 10:00:00")),
      // u2 same cohort week, only week 0 (two events, one distinct week)
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-05 10:00:00")),
      // u3 cohort week of 1/8, active week of 1/15
      (3L, ts("2024-01-10 10:00:00")),
      (3L, ts("2024-01-17 10:00:00"))
    ).toDF("user_id", "t")

    val out = Analytics.cohortRetention(events, "user_id", "t")
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L), // u1+u2 week 0
      ("2024-01-01", 1, 1L), // u1 week 1
      ("2024-01-01", 3, 1L), // u1 week 3
      ("2024-01-08", 0, 1L), // u3
      ("2024-01-08", 1, 1L)))
  }

  test("rollingStats: trailing RANGE frame includes the boundary second and equal-time peers") {
    val events = Seq(
      // u1: events at t=0, 3600, 3601, 7300 (seconds); window = 3600s
      (1L, 1L, ts("2024-01-01 00:00:00"), 10L),
      (2L, 1L, ts("2024-01-01 01:00:00"), 20L), // exactly 3600s after e1 → e1 IN frame
      (3L, 1L, ts("2024-01-01 01:00:01"), 30L), // 3601s after e1 → e1 OUT
      (4L, 1L, ts("2024-01-01 02:01:40"), 40L), // alone in its hour
      // u2: two events at the SAME second — each must see both (peers)
      (5L, 2L, ts("2024-01-01 00:00:00"), 5L),
      (6L, 2L, ts("2024-01-01 00:00:00"), 7L)
    ).toDF("event_id", "user_id", "t", "cents")

    val out = Analytics.rollingStats(events, "user_id", "t", "cents", windowSec = 3600L)
      .select("event_id", "w_cnt", "w_sum", "w_max")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 10L, 10L),
      (2L, 2L, 30L, 20L),  // e1 at exactly -3600 included
      (3L, 2L, 50L, 30L),  // e2+e3; e1 aged out
      (4L, 1L, 40L, 40L),
      (5L, 2L, 12L, 7L),   // equal-time peers share the frame...
      (6L, 2L, 12L, 7L)))  // ...so the result is order-independent
  }

  test("driftReport: hand-computed counts, nulls kept, one-sided values zero-filled") {
    import spark.implicits._
    val a = Seq(("en", 100L), ("en", 300L), ("de", 600L), (null, 100L))
      .toDF("lang", "n_chars")
    val b = Seq(("en", 100L), ("fr", 100L)).toDF("lang", "n_chars")
    val out = Analytics.driftReport(a, b,
      Seq("lang" -> col("lang"), "len_bucket" -> expr("n_chars div 256")))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(("lang", "en")) == ((2L, 1L, 4L, 2L)))
    assert(out(("lang", "de")) == ((1L, 0L, 4L, 2L)))      // absent in B → 0
    assert(out(("lang", "fr")) == ((0L, 1L, 4L, 2L)))      // absent in A → 0
    assert(out(("lang", "<null>")) == ((1L, 0L, 4L, 2L)))  // null is a value
    assert(out(("len_bucket", "0")) == ((2L, 2L, 4L, 2L)))
    assert(out(("len_bucket", "1")) == ((1L, 0L, 4L, 2L)))
    assert(out(("len_bucket", "2")) == ((1L, 0L, 4L, 2L)))
    assert(out.size == 7)
    // totals are per-dimension row counts of each snapshot
    assert(out.forall { case (_, (_, _, ta, tb)) => ta == 4L && tb == 2L })
  }

  test("driftReportHiCard: identical rows to driftReport, derived without a totals window") {
    import spark.implicits._
    val a = Seq(("en", 100L), ("en", 300L), ("de", 600L), (null, 100L))
      .toDF("lang", "n_chars")
    val b = Seq(("en", 100L), ("fr", 100L)).toDF("lang", "n_chars")
    val dims = Seq("lang" -> col("lang"), "len_bucket" -> expr("n_chars div 256"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long, Long, Long, Long)].collect().toSet
    val windowed = rows(Analytics.driftReport(a, b, dims))
    val scalar = rows(Analytics.driftReportHiCard(a, b, dims))
    assert(scalar == windowed,
      s"hicard diverged: only-hicard=${scalar -- windowed}, only-windowed=${windowed -- scalar}")
    // one-sided dimension: totals for the absent side must zero-fill
    val aOnly = rows(Analytics.driftReportHiCard(
      a.filter(col("lang") === "de"), b.filter(lit(false)), Seq("lang" -> col("lang"))))
    assert(aOnly == Set(("lang", "de", 1L, 0L, 1L, 0L)), aOnly.toString)
    Analytics.unpersistCaches()
  }
}
