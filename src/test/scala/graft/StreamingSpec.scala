package graft

import graft.streaming.StreamingExtract
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSuite {

  test("streaming resample-last over events matches the batch pipeline") {
    // stage a small parquet dir as the "arriving" stream
    val tmp = tempDir("graft-stream")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    val streamed = StreamingExtract.source(spark, s"$tmp/in", batch.schema)
    val agg = StreamingExtract.resampleLastStream(
      streamed, "ts", "event_type", "value", every = "1 hour", watermark = "10 minutes")

    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("stream_out")
      .select("ts", "event_type", "value", "n_points")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet

    val want = batch
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(max_by(col("value"), col("ts")).as("value"), count(lit(1)).as("n_points"))
      // the stream path normalizes event time to TIMESTAMP before the
      // watermark; cast the batch window start the same way so both
      // sides collect java.sql.Timestamp whatever the input encoding
      .select(col("w.start").cast("timestamp"), col("event_type"), col("value"), col("n_points"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet

    // append mode emits only watermark-closed windows; the final
    // (open) windows may be withheld — every emitted row must match
    // the batch result and cover all but the last watermark horizon
    assert(got.nonEmpty)
    assert(got.subsetOf(want), s"streamed rows not in batch result: ${(got -- want).take(3)}")
    val horizon = java.sql.Timestamp.valueOf("2024-01-02 23:00:00")
    val closed = want.filter(_._1.before(horizon))
    assert(closed.subsetOf(got), s"missing closed windows: ${(closed -- got).take(3)}")
  }

  test("watermark eviction bounds state: windows and sessions do not accumulate history") {
    // The 100 TB streaming failure mode no batch-parity test catches:
    // state that grows with HISTORY instead of with the open-window
    // tail. Feed a month of event time through small watermarks and
    // assert the state store holds only the tail — i.e. eviction
    // actually fires for tumbling windows, hopping windows, and
    // custom session state.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def tsOf(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum

    // tumbling 1h windows, 10 min watermark: 30 days x 24 x 2 series =
    // 1440 window-aggregates fed, only the open tail may remain
    val m1 = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val q1 = graft.streaming.StreamingExtract.resampleLastStream(
      m1.toDS().toDF("ts", "event_type", "value"), "ts", "event_type", "value",
      every = "1 hour", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("state_bound_tumble").start()
    for (b <- 0 until 10) {
      val rows = for (dd <- 0 until 3; h <- 0 until 24; s <- Seq("a", "b"))
        yield (tsOf(b * 3 + dd + 1, h), s, 1.0)
      m1.addData(rows)
      q1.processAllAvailable()
    }
    val tumbleRows = stateRows(q1)
    q1.stop()
    assert(tumbleRows <= 32,
      s"tumbling state holds $tumbleRows rows — eviction not firing (1440 windows fed)")

    // hopping 1h/15m windows (4x replication), 10 min watermark
    val m2 = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val q2 = graft.streaming.StreamingExtract.hoppingAggStream(
      m2.toDS().toDF("ts", "event_type", "value"), "ts", "event_type", "value",
      windowLen = "1 hour", slide = "15 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("state_bound_hop").start()
    for (b <- 0 until 10) {
      val rows = for (dd <- 0 until 3; h <- 0 until 24; s <- Seq("a", "b"))
        yield (tsOf(b * 3 + dd + 1, h), s, 1.0)
      m2.addData(rows)
      q2.processAllAvailable()
    }
    val hopRows = stateRows(q2)
    q2.stop()
    assert(hopRows <= 128,
      s"hopping state holds $hopRows rows — eviction not firing (5760 window slices fed)")

    // custom session state (flatMapGroupsWithState, event-time timeout):
    // 40 one-event sessions fed (2 users x 20 days, gap 30 min) — state
    // may hold only the still-open sessions, closed ones must be removed
    val m3 = MemoryStream[graft.streaming.Sessionize.SessionEvent](spark)
    val q3 = graft.streaming.Sessionize.sessionizeWithState(
      m3.toDS().withWatermark("ts", "0 seconds")
        .as[graft.streaming.Sessionize.SessionEvent],
      gapMs = 30 * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("state_bound_sessions").start()
    for (d <- 1 to 20) {
      m3.addData(
        graft.streaming.Sessionize.SessionEvent(1L, tsOf(d, 10), "click", d * 10L),
        graft.streaming.Sessionize.SessionEvent(2L, tsOf(d, 10), "view", d * 10L + 1))
      q3.processAllAvailable()
    }
    val sessRows = stateRows(q3)
    q3.stop()
    assert(sessRows <= 4,
      s"session state holds $sessRows rows — timed-out sessions not removed (40 fed)")
  }

  test("dedupStream drops duplicate keys within the watermark horizon") {
    val tmp = tempDir("graft-stream3")
    // duplicate every event id 3x with the same payload
    val base = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_id") < 300)
      .select("event_id", "ts", "event_type", "value")
    base.union(base).union(base).write.mode("overwrite").parquet(s"$tmp/in")

    val streamed = StreamingExtract.source(spark, s"$tmp/in", base.schema)
    val deduped = StreamingExtract.dedupStream(streamed, "ts", Seq("event_id"), watermark = "1 hour")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("dedup_out")
    assert(got.count() == base.count(), "exactly one row per duplicated key")
    assert(got.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("stream-stream interval join matches the batch join") {
    val tmp = tempDir("graft-stream4")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val clicks = events.filter(col("event_type") === "click")
    val purchases = events.filter(col("event_type") === "purchase")
    clicks.write.mode("overwrite").parquet(s"$tmp/clicks")
    purchases.write.mode("overwrite").parquet(s"$tmp/purchases")

    val joined = StreamingExtract.intervalJoinStream(
      StreamingExtract.source(spark, s"$tmp/clicks", clicks.schema),
      StreamingExtract.source(spark, s"$tmp/purchases", purchases.schema),
      keyCol = "user_id", timeCol = "ts", within = "6 hours", watermark = "10 minutes")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("join_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(spark.table("join_out"), "l_event_id", "r_event_id")
    val want = pairs(
      clicks.toDF(clicks.columns.map("l_" + _): _*).join(
        purchases.toDF(purchases.columns.map("r_" + _): _*),
        col("l_user_id") === col("r_user_id") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 6 hours")),
      "l_event_id", "r_event_id")
    assert(want.nonEmpty, "fixture must produce at least one interval match")
    assert(got == want, s"stream vs batch diff: ${((got -- want) ++ (want -- got)).take(5)}")
  }

  test("count-min sketch maintains incrementally on a stream") {
    val tmp = tempDir("graft-stream5")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$tmp/in")

    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("token"))
    // the counter matrix is a plain sum aggregate, so Structured
    // Streaming maintains it incrementally — the streaming form of the
    // sketch's mergeability (shard sketches add)
    val streaming = graft.ext.CountMin.sketch(
      toks(StreamingExtract.source(spark, s"$tmp/in", docs.schema)), "token")
    val q = streaming.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("cms_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(spark.table("cms_stream")) ==
      rows(graft.ext.CountMin.sketch(toks(docs), "token")))
  }

  test("file sink writes daily-partitioned parquet with checkpoint") {
    val tmp = tempDir("graft-stream2")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    val streamed = StreamingExtract.source(spark, s"$tmp/in", batch.schema)
    val agg = StreamingExtract.resampleLastStream(
      streamed, "ts", "event_type", "value", every = "1 hour", watermark = "10 minutes")
    val q = StreamingExtract.startFileSink(agg, "ts", s"$tmp/out", s"$tmp/ckpt")
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$tmp/out")
    assert(out.columns.contains("date"))
    assert(out.count() > 0)
    // partition dirs exist per day
    val days = new java.io.File(s"$tmp/out").listFiles().filter(_.getName.startsWith("date="))
    assert(days.length >= 25) // ~30 days of sf0.001 events minus watermark tail
  }

  test("foreachBatch upsert sink: streaming micro-batches land idempotently by day") {
    import graft.operators.ExtractOps
    val tmp = tempDir("graft-stream3")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "event_type", "value")
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    // micro-batches flow through upsertDays: each batch dynamically
    // overwrites ONLY the day partitions it carries — the re-entrant
    // nightly-sink contract, now fed by a stream
    val streamed = StreamingExtract.source(spark, s"$tmp/in", batch.schema)
    val q = streamed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        ExtractOps.upsertDays(b, "ts", s"$tmp/out")
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$tmp/out").drop("date")
    assert(out.count() == batch.count(), "stream upsert lands every row exactly once")

    // replaying one day's data is idempotent: same total, day replaced
    val day = batch.filter(to_date(col("ts")) === "2024-01-02")
    ExtractOps.upsertDays(day, "ts", s"$tmp/out")
    val after = spark.read.parquet(s"$tmp/out").drop("date")
    assert(after.count() == batch.count(), "replay replaces, never duplicates")
  }

  test("foreachBatch signature maintenance: streamed signature table gates like full history") {
    // the ingest-time form of Dedup.signatureTable: each arriving
    // micro-batch appends its (id, xhash, sig) rows; a later batch
    // gate reads the ACCUMULATED table — verdicts must equal the
    // full-history re-hash path, and the history text is never touched
    import graft.ext.Dedup
    val tmp = tempDir("graft-stream-sig")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val batchNew = docs.filter(col("doc_id") % 5 === 0)
    history.write.mode("overwrite").parquet(s"$tmp/in")

    val streamed = StreamingExtract.source(spark, s"$tmp/in", history.schema)
    val q = streamed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.signatureTable(b, "doc_id", "text")
          .write.mode("append").parquet(s"$tmp/sigs")
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val sigs = spark.read.parquet(s"$tmp/sigs")
    val viaStream = Dedup.incrementalDupsFromSignatures(sigs, batchNew, "doc_id", "text", 0.5)
      .orderBy("doc_id").collect().toSeq
    val direct = Dedup.incrementalDups(history, batchNew, "doc_id", "text", 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(viaStream == direct, "streamed signature table must gate identically")
  }

  test("streaming dedup gate lifecycle: day-2 gates against day-1 signatures, never day-1 text") {
    import graft.ext.Dedup
    import graft.streaming.StreamingDedupGate
    val tmp = tempDir("graft-stream-gate")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val day1 = docs.filter(col("doc_id") % 5 =!= 0)
    val day2 = docs.filter(col("doc_id") % 5 === 0)

    // DAY 1: first ingest — no signature table yet, everything is new
    day1.write.mode("overwrite").parquet(s"$tmp/in")
    StreamingDedupGate.start(
      StreamingExtract.source(spark, s"$tmp/in", day1.schema),
      "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", s"$tmp/ckpt")
      .awaitTermination(120000)
    val v1 = spark.read.parquet(s"$tmp/verdicts")
    assert(v1.count() == day1.count() && v1.filter(col("is_new")).count() == day1.count(),
      "day 1: every doc is new")

    // DAY 2: new files land in the same dir; the checkpoint resumes and
    // gates ONLY the new batch against the accumulated signatures, then
    // appends day-2 signatures
    day2.write.mode("append").parquet(s"$tmp/in")
    StreamingDedupGate.start(
      StreamingExtract.source(spark, s"$tmp/in", day1.schema),
      "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", s"$tmp/ckpt")
      .awaitTermination(120000)

    val day2Verdicts = spark.read.parquet(s"$tmp/verdicts")
      .filter(col("doc_id") % 5 === 0).orderBy("doc_id")
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
    val batchPath = Dedup.incrementalDups(day1, day2, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
    assert(day2Verdicts.collect().toSeq == batchPath.collect().toSeq,
      "day-2 stream verdicts ≡ batch path")

    // the signature table now carries both days, one row per doc, and
    // holds no text at all — day-1 re-hashing is structurally impossible
    val sigs = spark.read.parquet(s"$tmp/sigs")
    assert(sigs.count() == docs.count(), "signatures accumulate day over day")
    assert(!sigs.columns.contains("text"))

    // plan shape of the day-2 gate: with the batch in-memory, the only
    // parquet scan is the signature table, column-pruned — no parquet
    // scan reads a text column, so history text never re-scans
    val gate = Dedup.incrementalDupsFromSignatures(
      sigs, day2.localCheckpoint(), "doc_id", "text", threshold = 0.5)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("Scan parquet"), plan.take(800))
    assert(!plan.split("Scan parquet").drop(1)
      .exists(_.takeWhile(_ != '\n').contains("text")),
      "history side must not read text:\n" + plan.take(1200))
  }

  test("streaming dedup gate replay: a crashed batch re-runs as an overwrite, never a duplicate") {
    import graft.ext.Dedup
    import graft.streaming.StreamingDedupGate
    val tmp = tempDir("graft-gate-replay")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val day1 = docs.filter(col("doc_id") % 5 =!= 0)
    val day2 = docs.filter(col("doc_id") % 5 === 0)
    val expected = Dedup.incrementalDups(day1, day2, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
      .collect().toSeq

    def batch1Verdicts = spark.read.parquet(s"$tmp/verdicts")
      .filter(col(StreamingDedupGate.BatchCol) === 1).orderBy("doc_id")
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
      .collect().toSeq

    // batch 0 completes normally; batch 1's first attempt writes its
    // verdicts but CRASHES before the signature write (emulated by
    // deleting the signature partition it wrote)
    StreamingDedupGate.gateAndIngest(
      day1, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 0L)
    StreamingDedupGate.gateAndIngest(
      day2, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 1L)
    val sigPart1 = new java.io.File(s"$tmp/sigs/${StreamingDedupGate.BatchCol}=1")
    assert(sigPart1.exists(), "precondition: batch-1 signature partition exists")
    sigPart1.listFiles().foreach(_.delete()); assert(sigPart1.delete())

    // checkpoint replay re-runs the incomplete batch with the SAME id:
    // the stale verdict partition is overwritten, the signature
    // partition is rebuilt, and nothing duplicates
    StreamingDedupGate.gateAndIngest(
      day2, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 1L)
    assert(spark.read.parquet(s"$tmp/verdicts").count() == docs.count(),
      "replay must not duplicate verdict rows")
    assert(spark.read.parquet(s"$tmp/sigs").count() == docs.count(),
      "replay must not duplicate signature rows")
    assert(batch1Verdicts == expected,
      "replayed verdicts ≡ batch path (prior attempt's partial state invisible)")

    // worst case: a FULL replay with both partitions already present —
    // the batch must not gate against its own prior signatures (which
    // would mark every doc an exact dup of itself)
    StreamingDedupGate.gateAndIngest(
      day2, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 1L)
    assert(spark.read.parquet(s"$tmp/verdicts").count() == docs.count())
    assert(spark.read.parquet(s"$tmp/sigs").count() == docs.count())
    assert(batch1Verdicts == expected, "full replay is a no-op overwrite")
  }

  test("signature compaction: batch partitions fold to one, verdicts unchanged, dup-tolerant") {
    import graft.ext.Dedup
    import graft.streaming.StreamingDedupGate
    val tmp = tempDir("graft-gate-compact")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val day1 = docs.filter(col("doc_id") % 3 === 1)
    val day2 = docs.filter(col("doc_id") % 3 === 2)
    val day3 = docs.filter(col("doc_id") % 3 === 0)
    val expected = Dedup.incrementalDups(day1.union(day2), day3, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
      .collect().toSeq

    StreamingDedupGate.gateAndIngest(
      day1, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 0L)
    StreamingDedupGate.gateAndIngest(
      day2, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 1L)

    // GUARD: folding the latest live batch (1) is refused — a
    // checkpoint replay could re-run it, and compacted signatures
    // escape the replay's own-partition filter (the batch would gate
    // against itself)
    intercept[IllegalArgumentException] {
      StreamingDedupGate.compactSignatures(spark, s"$tmp/sigs", upToBatch = 1L)
    }

    def batch2Verdicts = spark.read.parquet(s"$tmp/verdicts")
      .filter(col(StreamingDedupGate.BatchCol) === 2).orderBy("doc_id")
      .select("doc_id", "exact_dup_id", "near_dup_id", "near_est", "is_new")
      .collect().toSeq
    StreamingDedupGate.gateAndIngest(
      day3, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 2L)
    assert(batch2Verdicts == expected, "gate over per-batch history (pre-compaction)")

    // with batch 2 live, folding 0..1 is safe and legal
    StreamingDedupGate.compactSignatures(spark, s"$tmp/sigs", upToBatch = 1L)
    val parts = new java.io.File(s"$tmp/sigs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(parts == Seq(
      s"${StreamingDedupGate.BatchCol}=${StreamingDedupGate.CompactedBatch}",
      s"${StreamingDedupGate.BatchCol}=2"),
      s"compacted partition + the un-folded latest batch remain: $parts")
    assert(spark.read.parquet(s"$tmp/sigs").count() == docs.count())

    // a replay of batch 2 AFTER compaction gates against the compacted
    // history identically (its own partition is still excluded — it was
    // not folded, by the guard's construction)
    StreamingDedupGate.gateAndIngest(
      day3, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 2L)
    assert(batch2Verdicts == expected, "replay over compacted history ≡ batch path")

    // crash-before-delete tolerance: a leftover (now duplicated) batch
    // partition cannot change verdicts — both gate tiers take min(hid)
    val dest = java.nio.file.Paths.get(s"$tmp/sigs/${StreamingDedupGate.BatchCol}=${StreamingDedupGate.CompactedBatch}")
    val ghost = java.nio.file.Paths.get(s"$tmp/sigs/${StreamingDedupGate.BatchCol}=0")
    java.nio.file.Files.createDirectories(ghost)
    java.nio.file.Files.list(dest).forEach { p =>
      java.nio.file.Files.copy(p, ghost.resolve(p.getFileName.toString))
    }
    StreamingDedupGate.gateAndIngest(
      day3, "doc_id", "text", s"$tmp/sigs", s"$tmp/verdicts", 0.5, batchId = 2L)
    assert(batch2Verdicts == expected, "duplicate history rows are verdict-neutral")

    // and re-running compaction converges back to the single partition
    StreamingDedupGate.compactSignatures(spark, s"$tmp/sigs", upToBatch = 1L)
    assert(spark.read.parquet(s"$tmp/sigs").count() == day1.count() + day2.count() + day3.count())
  }

  test("stream-static enrichment: a streaming fact joins the static dim per micro-batch") {
    // the ingest-enrichment shape: events stream in, the dimension
    // table is read fresh per micro-batch and broadcast — no state,
    // no watermark needed for a stream-static inner join
    val tmp = tempDir("graft-stream8")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type")
    batch.write.mode("overwrite").parquet(s"$tmp/in")
    val dim = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))

    val streamed = StreamingExtract.source(spark, s"$tmp/in", batch.schema)
    val q = streamed.join(dim, "user_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "c_mktsegment")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(spark.table("enrich_stream")) == rows(batch.join(dim, "user_id")),
      "stream-static join ≡ batch join")
  }

  test("streaming hopping-window aggregate matches the batch hop lattice") {
    val tmp = tempDir("graft-stream7")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    val streamed = StreamingExtract.source(spark, s"$tmp/in", batch.schema)
    val agg = StreamingExtract.hoppingAggStream(streamed, "ts", "event_type", "cents")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("hop_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = rows(batch
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_v"))
      .select(col("w.start").cast("timestamp").cast("long").as("ws_sec"),
        col("event_type"), col("n"), col("sum_v")))
    assert(rows(spark.table("hop_stream")) == want, "stream ≡ batch hop windows")
  }

  test("foreachBatch HLL maintenance: streamed distinct states fold to the batch answer") {
    import graft.ext.Warehouse
    val tmp = tempDir("graft-stream6")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_type", "user_id")
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    // each micro-batch appends its own distinct-count STATE (a few KB
    // of sketch per key); nothing ever re-reads earlier batches — the
    // streaming form of incremental DISTINCT maintenance
    val streamed = StreamingExtract.source(spark, s"$tmp/in", batch.schema)
    val q = streamed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Warehouse.distinctState(b, Seq("event_type"), "user_id")
          .write.mode("append").parquet(s"$tmp/states")
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val folded = Warehouse.finalizeDistinct(Warehouse.mergeDistinctStates(
      Seq(spark.read.parquet(s"$tmp/states")), Seq("event_type")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = batch.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded == exact, "sparse-mode sketches fold to the exact answer")
  }
}
