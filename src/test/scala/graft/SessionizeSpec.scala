package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionWindowAgg groups by gap in batch mode") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0), // same session (gap 30m)
      (1L, ts("2024-01-01 11:30:00"), 3.0), // new session
      (2L, ts("2024-01-01 10:05:00"), 4.0)
    ).toDF("user_id", "t", "v")
    val got = Sessionize.sessionWindowAgg(df, "user_id", "t", "v")
      .orderBy("user_id", "session_start").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n_events") == 2)
    assert(got(0).getAs[Double]("total_value") == 3.0)
    // session end = last event + gap
    assert(got(0).getAs[java.sql.Timestamp]("session_end") == ts("2024-01-01 10:40:00"))
  }

  test("sessionizeWithState emits closed sessions with custom payload") {
    import spark.implicits._
    val input = MemoryStream[Sessionize.SessionEvent](spark)
    val sessions = Sessionize.sessionizeWithState(
      input.toDS().withWatermark("ts", "0 seconds").as[Sessionize.SessionEvent],
      gapMs = 30 * 60 * 1000)

    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()

    // batch 1: two events in one session for user 1
    input.addData(
      Sessionize.SessionEvent(1L, ts("2024-01-01 10:00:00"), "click", 100L),
      Sessionize.SessionEvent(1L, ts("2024-01-01 10:10:00"), "view", 101L))
    q.processAllAvailable()
    // batch 2: much later event advances the watermark past 10:40 → closes session 1
    input.addData(
      Sessionize.SessionEvent(1L, ts("2024-01-01 12:00:00"), "click", 102L))
    q.processAllAvailable()
    // batch 3: watermark (12:00 from batch 2) > 10:40 → closes session 1
    input.addData(
      Sessionize.SessionEvent(2L, ts("2024-01-01 15:00:00"), "error", 103L))
    q.processAllAvailable()
    // batch 4: watermark (15:00 from batch 3) > 12:30 → closes the 12:00 session
    input.addData(
      Sessionize.SessionEvent(2L, ts("2024-01-01 20:00:00"), "view", 104L))
    q.processAllAvailable()

    val got = spark.table("sessions_out").orderBy("session_start").collect()
    q.stop()

    // session 1 (10:00-10:10, closed by the gap-split when 12:00
    // arrived), session 2 (12:00, closed by timeout), session 3
    // (user 2 at 15:00, closed by the gap-split when 20:00 arrived)
    assert(got.length == 3, got.mkString("; "))
    val s1 = got(0)
    assert(s1.getAs[Long]("user_id") == 1L)
    assert(s1.getAs[Int]("n_events") == 2)
    assert(s1.getAs[Long]("first_event_id") == 100L)
    assert(s1.getAs[Long]("last_event_id") == 101L)
    assert(s1.getAs[Map[String, Int]]("type_counts") == Map("click" -> 1, "view" -> 1))
    val s2 = got(1)
    assert(s2.getAs[Long]("user_id") == 1L)
    assert(s2.getAs[Int]("n_events") == 1)
    assert(s2.getAs[Long]("last_event_id") == 102L)
    val s3 = got(2)
    assert(s3.getAs[Long]("user_id") == 2L)
    assert(s3.getAs[Map[String, Int]]("type_counts") == Map("error" -> 1))
  }

  test("sessionEvents adapter encodes the NTZ driver parquet into the typed dataset") {
    // Tables.events currently yields TIMESTAMP_NTZ ts; a bare
    // .as[SessionEvent] on it fails the java.sql.Timestamp encoder —
    // the adapter's cast is what closes the seam
    val typed = Sessionize.sessionEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val rows = typed.take(5)
    assert(rows.length == 5)
    assert(rows.forall(_.ts.isInstanceOf[java.sql.Timestamp]))
    // value parity with the raw column (epoch micros under UTC)
    val raw = Tables.events(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")).as("us"))
      .limit(5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { e =>
      raw.get(e.event_id).foreach(us => assert(us == e.ts.getTime * 1000 +
        (e.ts.getNanos / 1000) % 1000, s"event ${e.event_id}"))
    }
  }
}
