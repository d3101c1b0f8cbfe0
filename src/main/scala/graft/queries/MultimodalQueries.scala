package graft.queries

import graft.Tables
import graft.ext.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing as contract queries.
  *
  * `multimodal_features`: documents' text bytes play the role of
  * opaque (non-image) media payloads; features are the deterministic
  * stub-decode byte histograms (integers — exact cross-engine
  * compare). The oracle recomputes the histogram from character codes,
  * valid because the corpus is pure ASCII (byte == code point).
  *
  * `multimodal_image_decode`: a REAL `javax.imageio` round-trip,
  * hash-checked — each doc_id deterministically synthesizes a tiny
  * grayscale PNG ([[Multimodal.syntheticPng]]), executors decode it
  * back with a real ImageReader, and because PNG is lossless the
  * decoded width / height / luminance histogram are analytically
  * predictable from doc_id alone — which is what the DuckDB oracle
  * computes, no image library involved. A wrong decode (dimensions,
  * pixel values, luminance math) breaks the hash.
  */
object MultimodalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, dir) => {
      val feats = Multimodal.featuresOf(Tables.documents(s, dir), "doc_id", "text")
      val histCols = (0 until Multimodal.HistBins).map(b => col("histogram")(b).as(s"hist_$b"))
      feats.toDF()
        .select(Seq(col("id").as("doc_id"), col("nBytes").as("n_bytes")) ++ histCols: _*)
        .orderBy("doc_id")
    }),

    "multimodal_image_decode" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(
        syntheticRecs(s, Tables.documents(s, dir)))
      val histCols = (0 until Multimodal.HistBins).map(b => col("histogram")(b).as(s"hist_$b"))
      feats.toDF()
        .select(Seq(col("id").as("doc_id"), col("format"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height")) ++ histCols: _*)
        .orderBy("doc_id")
    }),

    // image near-dup via 64-bit aHash fingerprints + hamming banding:
    // the REAL decode feeds the fingerprint, and the oracle replays it
    // analytically from the synthetic pixel formula (see oracle CTEs)
    "multimodal_image_neardup" -> ((s, dir) => {
      Multimodal.imageNearDupPairs(syntheticRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // scale-CALIBRATED image near-dup: same operator, clique fixture
    // (Multimodal.syntheticPngCal — families grow with the corpus,
    // clique size pinned at ≤4), so its scale curve measures the
    // banding join, not fixture-artifact output volume. The oracle
    // replays the Lehmer-mixed pixel formula analytically.
    "multimodal_image_neardup_cal" -> ((s, dir) => {
      Multimodal.imageNearDupPairs(syntheticCalRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // complete near-dup pass: exact-fp star tier (hamming 0, cap-
    // independent — closes the r11 recall residual) unioned with the
    // banded hamming 1..3 tier; one decode feeding both via the shared
    // persisted fingerprint scan. maxBucket left at default here (sf
    // buckets are tiny); the exact tier's completeness is what the
    // MultimodalSpec cap-forcing test pins.
    "multimodal_image_dedup_full" -> ((s, dir) => {
      Multimodal.imageDedupFull(syntheticRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // REAL `javax.sound.sampled` WAV round-trip, hash-checked — each
    // doc_id synthesizes a deterministic 16-bit PCM mono WAV, executors
    // parse it back with the JDK's real RIFF/WAVE reader, and because
    // PCM is lossless the decoded rate / length / mean amplitude are
    // analytically predictable from doc_id alone (the oracle's replay)
    "multimodal_audio_decode" -> ((s, dir) => {
      import s.implicits._
      syntheticAudioRecs(s, Tables.documents(s, dir))
        .mapPartitions(_.flatMap { r =>
          Multimodal.decodeWav(r.media).map { case (rate, samples) =>
            val sumAbs = samples.foldLeft(0L)((a, v) => a + math.abs(v.toLong))
            (r.id, rate.toLong, samples.length.toLong, sumAbs / samples.length)
          }
        })
        .toDF("doc_id", "sample_rate", "n_samples", "mean_abs")
        .orderBy("doc_id")
    }),

    // the standard audio QA pass (energy / zero-crossings / clipping /
    // silence), integer-exact over the real decode — the audio analog
    // of the text quality gates
    "multimodal_audio_quality" -> ((s, dir) => {
      Multimodal.audioQuality(syntheticAudioRecs(s, Tables.documents(s, dir)))
        .select(col("id").as("doc_id"), col("n_samples"), col("mean_square"),
          col("zero_crossings"), col("peak_abs"), col("n_clipped"), col("n_silence"))
        .orderBy("doc_id")
    }),

    // audio near-dup via the 64-bit energy hash + the SAME hamming
    // banding core as images — the real WAV decode feeds the
    // fingerprint, the oracle replays it from the sample formula
    "multimodal_audio_neardup" -> ((s, dir) => {
      Multimodal.audioNearDupPairs(syntheticAudioRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // scale-calibrated audio near-dup (clique fixture — see
    // multimodal_image_neardup_cal)
    "multimodal_audio_neardup_cal" -> ((s, dir) => {
      Multimodal.audioNearDupPairs(syntheticCalWavRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // REAL multi-frame GIF decode: per-video frame extraction with a
    // real ImageIO reader, every-2nd-frame sampling (frameSampleStub
    // made real), per-frame aHash emitted as four 16-bit chunks
    "multimodal_video_frames" -> ((s, dir) => {
      val fps = Multimodal.videoFrameFingerprints(
        syntheticVideoRecs(s, Tables.documents(s, dir)), every = 2)
      fps.select(Seq(col("id").as("doc_id"), col("frame_idx")) ++
          (0 to 3).map(c =>
            shiftrightunsigned(col("fp"), c * 16).bitwiseAND(lit(65535L)).as(s"c$c")): _*)
        .orderBy("doc_id", "frame_idx")
    }),

    // video-level near-dup: two videos near if any sampled frames'
    // hashes land within hamming 3; min frame-pair hamming + support
    "multimodal_video_neardup" -> ((s, dir) => {
      Multimodal.videoNearDupPairs(syntheticVideoRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // scale-calibrated video near-dup (clique fixture — see
    // multimodal_image_neardup_cal; every=2 samples frames 0 and 2 of
    // the fixed 3)
    "multimodal_video_neardup_cal" -> ((s, dir) => {
      Multimodal.videoNearDupPairs(syntheticCalGifRecs(s, Tables.documents(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    // the MEDIA gate's full lifecycle driven through the DRIVER'S
    // oracle, not just specs (the same closure the text gate got in
    // streaming_dedup_gate_replay): three deterministic micro-batches
    // (doc_id % 3 = batch id) of images replayed through the exact
    // foreachBatch body — gate against the accumulated fingerprint
    // table, write verdicts, append own fingerprints — with a
    // fingerprint-table compaction between batches 1 and 2, which
    // must be invisible to verdicts. Fixed staging path (wiped per
    // call) keeps the read plan — and the plan hash — deterministic.
    // SINGLE-PROCESS ASSUMPTION: the shared path means two concurrent
    // Spark sessions running this query race on delete/write (Verify
    // and Bench never overlap in the driver's harness, and the repo's
    // sbt target lock serializes local runs); the tmpdir-dependent
    // absolute path also means the plan hash is per-machine — the
    // driver and the repo recordings run on the same box.
    "multimodal_image_gate_replay" -> ((s, dir) => {
      import graft.streaming.ImageDedupGate
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_imggate_replay").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val docs = Tables.documents(s, dir)
      for (b <- 0L to 2L) {
        val slice = docs.filter(col("doc_id") % 3 === b)
        ImageDedupGate.gateAndIngest(
          syntheticRecs(s, slice),
          s"$root/fps", s"$root/verdicts", batchId = b,
          // ids straight from the id column: projecting them through
          // the MediaRecord Dataset would re-synthesize every PNG just
          // to drop the bytes (guide §4 — opaque map defeats pruning)
          batchIds = Some(slice.select(col("doc_id").cast("long").as("id"))))
        if (b == 1L) ImageDedupGate.compactFingerprints(s, s"$root/fps", upToBatch = 0L)
      }
      graft.streaming.BatchTable.readAll(s, s"$root/verdicts")
        .select("doc_id", "exact_dup_id", "near_dup_id", "near_hamming", "is_new")
        .orderBy("doc_id")
    }),

    // incremental VIDEO gate: batch (doc_id % 4 == 0) videos gated
    // against the history frame-fingerprint table through the SAME
    // modality-agnostic core — exact tier = some sampled frame pair
    // identical, near tier = min frame-pair hamming 1..3; history
    // frames decode once, every gate reads only (id, fp) rows
    "multimodal_video_neardup_incr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val history = Multimodal.managedPersist(Multimodal.videoFrameFingerprints(
        syntheticVideoRecs(s, docs.filter(col("doc_id") % 4 =!= 0)), every = 2))
      val batchDocs = docs.filter(col("doc_id") % 4 === 0)
      val bFps = Multimodal.managedPersist(
        Multimodal.videoFrameFingerprints(syntheticVideoRecs(s, batchDocs), every = 2))
      Multimodal.incrementalHammingDupsFromFps(
        // ids from the id column, not through the GIF-synthesizing
        // Dataset map (guide §4 — opaque map defeats column pruning)
        history, batchDocs.select(col("doc_id").cast("long").as("id")), bFps)
        .orderBy("doc_id")
    }),

    // incremental gate: batch (doc_id % 4 == 0) images gated against
    // the history (rest) fingerprint table — history media decoded
    // once, every gate reads only (id, fp)
    "multimodal_image_neardup_incr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // production reads the (id, fp) table back from parquet; here it
      // is built in-query, so persist it — both gate tiers consume it,
      // and without this the history images would decode twice. The
      // managed persist registers the cache for unpersistCaches release.
      val history = Multimodal.managedPersist(Multimodal.imageFingerprints(
        syntheticRecs(s, docs.filter(col("doc_id") % 4 =!= 0))))
      val batchDocs = docs.filter(col("doc_id") % 4 === 0)
      val bFps = Multimodal.managedPersist(Multimodal.imageFingerprints(
        syntheticRecs(s, batchDocs)))
      Multimodal.incrementalImageDupsFromFps(
        // ids from the id column, not through the PNG-synthesizing
        // Dataset map (guide §4 — opaque map defeats column pruning)
        history, batchDocs.select(col("doc_id").cast("long").as("id")), bFps)
        .orderBy("doc_id")
    })
  )

  /** The id feed every synthetic-media fixture maps over. The
    * repartition is the load-bearing line: the codec pass below is the
    * expensive stage, and its parallelism is otherwise whatever the
    * upstream FILE layout dictates — `documents.parquet` at test SFs
    * is one small file = ONE split = a single-threaded decode of the
    * whole corpus. Exchanging the 8-byte id rows across all cores
    * BEFORE payloads exist costs ~nothing and is exactly the
    * production shape: repartition the tiny key column, synthesize /
    * fetch / decode the heavy bytes after the exchange — binary still
    * never enters a shuffle.
    */
  private def idFeed(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    df.select(col("doc_id").cast("long")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** doc_id → deterministic synthetic PNG media records (the image
    * fixture every image query shares).
    */
  private def syntheticRecs(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    idFeed(s, df)
      .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticPng(id),
        Multimodal.MediaMeta("png", 0, 0, 0L)))
  }

  /** doc_id → scale-calibrated clique PNG records
    * ([[Multimodal.syntheticPngCal]]).
    */
  private def syntheticCalRecs(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    idFeed(s, df)
      .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticPngCal(id),
        Multimodal.MediaMeta("png", 0, 0, 0L)))
  }

  /** doc_id → scale-calibrated clique WAV records
    * ([[Multimodal.syntheticWavCal]]).
    */
  private def syntheticCalWavRecs(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    idFeed(s, df)
      .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticWavCal(id),
        Multimodal.MediaMeta("wav", 0, 0, 0L)))
  }

  /** doc_id → scale-calibrated clique animated-GIF records
    * ([[Multimodal.syntheticGifCal]]).
    */
  private def syntheticCalGifRecs(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    idFeed(s, df)
      .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticGifCal(id),
        Multimodal.MediaMeta("gif", 0, 0, 0L)))
  }

  /** doc_id → deterministic synthetic WAV media records (the audio
    * fixture; [[Multimodal.syntheticWav]]).
    */
  private def syntheticAudioRecs(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    idFeed(s, df)
      .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticWav(id),
        Multimodal.MediaMeta("wav", 0, 0, 0L)))
  }

  /** doc_id → deterministic synthetic animated-GIF media records (the
    * video fixture; [[Multimodal.syntheticGif]]).
    */
  private def syntheticVideoRecs(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    idFeed(s, df)
      .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticGif(id),
        Multimodal.MediaMeta("gif", 0, 0, 0L)))
  }

  private val histSelect = (0 until Multimodal.HistBins).map { b =>
    s"""len(list_filter(generate_series(1, length(text)),
       i -> (ascii(substr(text, i, 1)) * ${Multimodal.HistBins}) // 256 = $b)) AS hist_$b"""
  }.mkString(",\n  ")

  private val imageHistSelect = (0 until Multimodal.HistBins).map { b =>
    s"""CAST(len(list_filter(flatten(list_transform(generate_series(0, doc_id % 8),
       x -> list_transform(generate_series(0, doc_id % 5),
            y -> (31 * doc_id + 7 * x + 13 * y) % 256))),
       g -> (g * ${Multimodal.HistBins}) // 256 = $b)) AS BIGINT) AS hist_$b"""
  }.mkString(",\n  ")

  val oracleSql: Map[String, String] = Map(
    // replays syntheticWav's sample formula: 512 samples of
    // (((37·id + 11·⌊i/8⌋ + 3·(i mod 8)) mod 256) − 128) · 256 at
    // 8 kHz — a wrong container parse, endianness, or sample decode on
    // the Spark side breaks the hash
    "multimodal_audio_decode" ->
      """WITH samp AS (
  SELECT doc_id, unnest(generate_series(0, 511)) AS i FROM documents),
v AS (
  SELECT doc_id,
    abs((((37 * doc_id + 11 * (i // 8) + 3 * (i % 8)) % 256) - 128) * 256) AS a
  FROM samp)
SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
  CAST(512 AS BIGINT) AS n_samples,
  CAST(sum(a) // 512 AS BIGINT) AS mean_abs
FROM v GROUP BY doc_id ORDER BY doc_id""",

    // replays the QA metrics from the sample formula; the sign-flip
    // count uses the same (s < 0) sign convention as the Scala fold
    "multimodal_audio_quality" ->
      """WITH samp AS (
  SELECT doc_id, unnest(generate_series(0, 511)) AS i FROM documents),
v AS (
  SELECT doc_id, i,
    (((37 * doc_id + 11 * (i // 8) + 3 * (i % 8)) % 256) - 128) * 256 AS s
  FROM samp),
z AS (
  SELECT doc_id, s, lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM v)
SELECT doc_id,
  CAST(512 AS BIGINT) AS n_samples,
  CAST(sum(s * s) // 512 AS BIGINT) AS mean_square,
  CAST(sum(CASE WHEN prev IS NOT NULL AND (s < 0) != (prev < 0)
           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
  CAST(max(abs(s)) AS BIGINT) AS peak_abs,
  CAST(sum(CASE WHEN abs(s) >= 32000 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
  CAST(sum(CASE WHEN abs(s) <= 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_silence
FROM z GROUP BY doc_id ORDER BY doc_id""",

    // replays audioFingerprint64 analytically (frame energies from the
    // sample formula, mean-thresholded into bits), then the same
    // banded-candidates + bit-compare verify as the image oracle
    "multimodal_audio_neardup" ->
      s"""WITH $audioFingerprintCtes,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cval = b.cval
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN bits x ON x.doc_id = c.doc_a
  JOIN bits y ON y.doc_id = c.doc_b AND y.pos = x.pos
  GROUP BY 1, 2)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
ORDER BY doc_a, doc_b""",

    // replays the per-frame aHash of the synthetic GIF's pixel formula
    // for the SAMPLED (even) frames — wrong frame count, frame order,
    // palette round-trip, or stride breaks the hash
    "multimodal_video_frames" ->
      s"""WITH $videoChunkCtes
SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
  CAST(max(CASE WHEN chunk = 0 THEN cval END) AS BIGINT) AS c0,
  CAST(max(CASE WHEN chunk = 1 THEN cval END) AS BIGINT) AS c1,
  CAST(max(CASE WHEN chunk = 2 THEN cval END) AS BIGINT) AS c2,
  CAST(max(CASE WHEN chunk = 3 THEN cval END) AS BIGINT) AS c3
FROM chunks GROUP BY 1, 2 ORDER BY doc_id, frame_idx""",

    // video pairs: distinct sampled-frame fingerprints per video, then
    // banded candidates (a shared 16-bit chunk — recall-complete for
    // hamming <= 3 by pigeonhole), per-fp-pair hamming via bit_count
    // on the chunk XORs, collapsed to min hamming + support per pair
    "multimodal_video_neardup" ->
      s"""WITH $videoChunkCtes,
vfp AS (
  SELECT DISTINCT doc_id,
    max(CASE WHEN chunk = 0 THEN cval END) AS c0,
    max(CASE WHEN chunk = 1 THEN cval END) AS c1,
    max(CASE WHEN chunk = 2 THEN cval END) AS c2,
    max(CASE WHEN chunk = 3 THEN cval END) AS c3
  FROM chunks GROUP BY doc_id, k),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.c0 AS a0, a.c1 AS a1, a.c2 AS a2, a.c3 AS a3,
    b.c0 AS b0, b.c1 AS b1, b.c2 AS b2, b.c3 AS b3
  FROM vfp a JOIN vfp b
    ON (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT doc_a, doc_b,
    CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
       + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) AS BIGINT) AS h
  FROM cand)
SELECT doc_a, doc_b, min(h) AS hamming,
  CAST(count(*) AS BIGINT) AS n_near_fp_pairs
FROM ham WHERE h <= 3 GROUP BY 1, 2 ORDER BY doc_a, doc_b""",

    "multimodal_features" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
  $histSelect
FROM documents ORDER BY doc_id""",

    "multimodal_image_decode" ->
      s"""SELECT doc_id, 'png' AS format,
  CAST(1 + doc_id % 8 AS BIGINT) AS width,
  CAST(1 + doc_id % 5 AS BIGINT) AS height,
  $imageHistSelect
FROM documents ORDER BY doc_id""",

    // replays imageFingerprint64 analytically: sample the synthetic
    // image's pixel formula on the 8x8 nearest-neighbor grid, mean-
    // threshold into bits, band into 16-bit chunks for candidates, and
    // count differing bits for the exact hamming verify
    // calibrated image near-dup: the same banded-candidates + exact
    // hamming verify skeleton over the clique fixture's analytic fps
    "multimodal_image_neardup_cal" ->
      s"""WITH $calFingerprintCtes,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cchunks a JOIN cchunks b ON a.chunk = b.chunk AND a.cval = b.cval
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN cbits x ON x.doc_id = c.doc_a
  JOIN cbits y ON y.doc_id = c.doc_b AND y.pos = x.pos
  GROUP BY 1, 2)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
ORDER BY doc_a, doc_b""",

    // calibrated audio near-dup: energy-hash analog of the above
    "multimodal_audio_neardup_cal" ->
      s"""WITH $calAudioCtes,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM achunks a JOIN achunks b ON a.chunk = b.chunk AND a.cval = b.cval
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN abits x ON x.doc_id = c.doc_a
  JOIN abits y ON y.doc_id = c.doc_b AND y.pos = x.pos
  GROUP BY 1, 2)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
ORDER BY doc_a, doc_b""",

    // calibrated video near-dup: per-sampled-frame fps, banded
    // candidates, min hamming + distinct near fp-pair support
    "multimodal_video_neardup_cal" ->
      s"""WITH $calVideoChunkCtes,
vfp AS (
  SELECT DISTINCT doc_id,
    max(CASE WHEN chunk = 0 THEN cval END) AS c0,
    max(CASE WHEN chunk = 1 THEN cval END) AS c1,
    max(CASE WHEN chunk = 2 THEN cval END) AS c2,
    max(CASE WHEN chunk = 3 THEN cval END) AS c3
  FROM vchunksc GROUP BY doc_id, k),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.c0 AS a0, a.c1 AS a1, a.c2 AS a2, a.c3 AS a3,
    b.c0 AS b0, b.c1 AS b1, b.c2 AS b2, b.c3 AS b3
  FROM vfp a JOIN vfp b
    ON (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT doc_a, doc_b,
    CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
       + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) AS BIGINT) AS h
  FROM cand)
SELECT doc_a, doc_b, min(h) AS hamming,
  CAST(count(*) AS BIGINT) AS n_near_fp_pairs
FROM ham WHERE h <= 3 GROUP BY 1, 2 ORDER BY doc_a, doc_b""",

    "multimodal_image_neardup" ->
      s"""WITH $fingerprintCtes,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cval = b.cval
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN bits x ON x.doc_id = c.doc_a
  JOIN bits y ON y.doc_id = c.doc_b AND y.pos = x.pos
  GROUP BY 1, 2)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
ORDER BY doc_a, doc_b""",

    // exact tier = fp-equality cliques star-expanded to their min-id
    // canonical (hamming 0); near tier = the banded candidates at
    // hamming 1..3 — the same union imageDedupFull computes
    "multimodal_image_dedup_full" ->
      s"""WITH $fingerprintCtes,
fpt AS (
  SELECT doc_id,
    max(CASE WHEN chunk = 0 THEN cval END) AS c0,
    max(CASE WHEN chunk = 1 THEN cval END) AS c1,
    max(CASE WHEN chunk = 2 THEN cval END) AS c2,
    max(CASE WHEN chunk = 3 THEN cval END) AS c3
  FROM chunks GROUP BY 1),
canon AS (
  SELECT c0, c1, c2, c3, min(doc_id) AS doc_a
  FROM fpt GROUP BY 1, 2, 3, 4),
exact AS (
  SELECT canon.doc_a, fpt.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
  FROM fpt JOIN canon USING (c0, c1, c2, c3)
  WHERE fpt.doc_id > canon.doc_a),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cval = b.cval
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN bits x ON x.doc_id = c.doc_a
  JOIN bits y ON y.doc_id = c.doc_b AND y.pos = x.pos
  GROUP BY 1, 2)
SELECT doc_a, doc_b, hamming FROM exact
UNION ALL
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming BETWEEN 1 AND 3
ORDER BY doc_a, doc_b""",

    // gate replay: every doc gated against the union of STRICTLY
    // EARLIER batches (doc_id % 3 ordering); batch 0 sees empty
    // history (all new); exact = whole-hash equality, near = banded
    // hamming 1..3, best = smallest hamming then history id —
    // compaction between batches must not appear anywhere in this
    // replay, which is exactly the invisibility being checked
    "multimodal_image_gate_replay" ->
      s"""WITH $fingerprintCtes,
fpt AS (
  SELECT doc_id,
    max(CASE WHEN chunk = 0 THEN cval END) AS c0,
    max(CASE WHEN chunk = 1 THEN cval END) AS c1,
    max(CASE WHEN chunk = 2 THEN cval END) AS c2,
    max(CASE WHEN chunk = 3 THEN cval END) AS c3
  FROM chunks GROUP BY 1),
exact AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_dup_id
  FROM fpt b JOIN fpt h
    ON b.c0 = h.c0 AND b.c1 = h.c1 AND b.c2 = h.c2 AND b.c3 = h.c3
  WHERE h.doc_id % 3 < b.doc_id % 3
  GROUP BY 1),
ham AS (
  SELECT b.doc_id, h.doc_id AS hid,
    CAST(bit_count(xor(b.c0, h.c0)) + bit_count(xor(b.c1, h.c1))
       + bit_count(xor(b.c2, h.c2)) + bit_count(xor(b.c3, h.c3)) AS BIGINT) AS hamming
  FROM fpt b JOIN fpt h
    ON (b.c0 = h.c0 OR b.c1 = h.c1 OR b.c2 = h.c2 OR b.c3 = h.c3)
  WHERE h.doc_id % 3 < b.doc_id % 3),
near AS (
  SELECT doc_id, near_dup_id, near_hamming FROM (
    SELECT doc_id, hid AS near_dup_id, hamming AS near_hamming,
      row_number() OVER (PARTITION BY doc_id ORDER BY hamming ASC, hid ASC) AS r
    FROM ham WHERE hamming BETWEEN 1 AND 3) t
  WHERE r = 1)
SELECT d.doc_id, e.exact_dup_id, n.near_dup_id, n.near_hamming,
  (e.exact_dup_id IS NULL AND n.near_dup_id IS NULL) AS is_new
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near n ON n.doc_id = d.doc_id
ORDER BY d.doc_id""",

    // video gate: distinct sampled-frame fps per video, batch
    // (doc_id % 4 = 0) against history; exact = some frame pair's
    // whole hash equal, near = min frame-pair hamming 1..3 over
    // banded candidates, best = smallest hamming then history id
    "multimodal_video_neardup_incr" ->
      s"""WITH $videoChunkCtes,
vfp AS (
  SELECT DISTINCT doc_id,
    max(CASE WHEN chunk = 0 THEN cval END) AS c0,
    max(CASE WHEN chunk = 1 THEN cval END) AS c1,
    max(CASE WHEN chunk = 2 THEN cval END) AS c2,
    max(CASE WHEN chunk = 3 THEN cval END) AS c3
  FROM chunks GROUP BY doc_id, k),
exact AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_dup_id
  FROM vfp b JOIN vfp h
    ON b.c0 = h.c0 AND b.c1 = h.c1 AND b.c2 = h.c2 AND b.c3 = h.c3
  WHERE b.doc_id % 4 = 0 AND h.doc_id % 4 != 0
  GROUP BY 1),
ham AS (
  SELECT b.doc_id, h.doc_id AS hid,
    CAST(bit_count(xor(b.c0, h.c0)) + bit_count(xor(b.c1, h.c1))
       + bit_count(xor(b.c2, h.c2)) + bit_count(xor(b.c3, h.c3)) AS BIGINT) AS hamming
  FROM vfp b JOIN vfp h
    ON (b.c0 = h.c0 OR b.c1 = h.c1 OR b.c2 = h.c2 OR b.c3 = h.c3)
  WHERE b.doc_id % 4 = 0 AND h.doc_id % 4 != 0),
near AS (
  SELECT doc_id, near_dup_id, near_hamming FROM (
    SELECT doc_id, hid AS near_dup_id, hamming AS near_hamming,
      row_number() OVER (PARTITION BY doc_id ORDER BY hamming ASC, hid ASC) AS r
    FROM ham WHERE hamming BETWEEN 1 AND 3) t
  WHERE r = 1)
SELECT d.doc_id, e.exact_dup_id, n.near_dup_id, n.near_hamming,
  (e.exact_dup_id IS NULL AND n.near_dup_id IS NULL) AS is_new
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near n ON n.doc_id = d.doc_id
WHERE d.doc_id % 4 = 0
ORDER BY d.doc_id""",

    // same analytic fingerprints, split into history (doc_id % 4 != 0)
    // and batch; exact tier = all four chunks equal (the whole 64-bit
    // hash), near tier = banded candidates at hamming 1..3, best =
    // smallest hamming then smallest history id
    "multimodal_image_neardup_incr" ->
      s"""WITH $fingerprintCtes,
fpt AS (
  SELECT doc_id,
    max(CASE WHEN chunk = 0 THEN cval END) AS c0,
    max(CASE WHEN chunk = 1 THEN cval END) AS c1,
    max(CASE WHEN chunk = 2 THEN cval END) AS c2,
    max(CASE WHEN chunk = 3 THEN cval END) AS c3
  FROM chunks GROUP BY 1),
exact AS (
  SELECT b.doc_id, min(h.doc_id) AS exact_dup_id
  FROM fpt b JOIN fpt h
    ON b.c0 = h.c0 AND b.c1 = h.c1 AND b.c2 = h.c2 AND b.c3 = h.c3
  WHERE b.doc_id % 4 = 0 AND h.doc_id % 4 != 0
  GROUP BY 1),
cand AS (
  SELECT DISTINCT bc.doc_id, hc.doc_id AS hid
  FROM chunks bc JOIN chunks hc ON bc.chunk = hc.chunk AND bc.cval = hc.cval
  WHERE bc.doc_id % 4 = 0 AND hc.doc_id % 4 != 0),
ham AS (
  SELECT c.doc_id, c.hid,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN bits x ON x.doc_id = c.doc_id
  JOIN bits y ON y.doc_id = c.hid AND y.pos = x.pos
  GROUP BY 1, 2),
near AS (
  SELECT doc_id, near_dup_id, near_hamming FROM (
    SELECT doc_id, hid AS near_dup_id, hamming AS near_hamming,
      row_number() OVER (PARTITION BY doc_id ORDER BY hamming ASC, hid ASC) AS r
    FROM ham WHERE hamming BETWEEN 1 AND 3) t
  WHERE r = 1)
SELECT d.doc_id, e.exact_dup_id, n.near_dup_id, n.near_hamming,
  (e.exact_dup_id IS NULL AND n.near_dup_id IS NULL) AS is_new
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near n ON n.doc_id = d.doc_id
WHERE d.doc_id % 4 = 0
ORDER BY d.doc_id"""
  )

  /** Shared analytic-aHash CTE prefix: the synthetic pixel formula
    * sampled on the 8×8 grid, mean-thresholded into bits, banded into
    * four 16-bit chunks — the SQL replay of
    * [[graft.ext.Multimodal.imageFingerprint64]].
    */
  /** Shared analytic audio-energy-hash CTE prefix: frame energies
    * from the synthetic WAV's sample formula, mean-thresholded into
    * bits, banded into four 16-bit chunks — the SQL replay of
    * [[graft.ext.Multimodal.audioFingerprint64]].
    */
  private def audioFingerprintCtes: String =
    """samp AS (
  SELECT doc_id, unnest(generate_series(0, 511)) AS i FROM documents),
e AS (
  SELECT doc_id, i // 8 AS pos,
    sum(abs((((37 * doc_id + 11 * (i // 8) + 3 * (i % 8)) % 256) - 128) * 256)) // 8 AS energy
  FROM samp GROUP BY 1, 2),
m AS (SELECT doc_id, sum(energy) // 64 AS mean FROM e GROUP BY 1),
bits AS (
  SELECT e.doc_id, e.pos, CASE WHEN e.energy > m.mean THEN 1 ELSE 0 END AS b
  FROM e JOIN m USING (doc_id)),
chunks AS (
  SELECT doc_id, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM bits GROUP BY 1, 2)"""

  /** Shared analytic per-frame-aHash CTE prefix for the SAMPLED (even)
    * frames of the synthetic GIF — the SQL replay of
    * [[graft.ext.Multimodal.videoFrameHashes]] under the every=2
    * stride; `chunks` carries the frame index `k`.
    */
  private def videoChunkCtes: String =
    """vm AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 5 + doc_id % 4 AS h,
    2 + doc_id % 3 AS nf
  FROM documents),
fr AS (
  SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS k FROM vm),
vsamp AS (
  SELECT doc_id, w, h, k, unnest(generate_series(0, 63)) AS pos
  FROM fr WHERE k % 2 = 0),
vlums AS (
  SELECT doc_id, k, pos,
    ((31 * doc_id + 17 * k + 7 * (((pos % 8) * w) // 8)
                          + 13 * (((pos // 8) * h) // 8)) % 256) AS lum
  FROM vsamp),
vmean AS (SELECT doc_id, k, sum(lum) // 64 AS mean FROM vlums GROUP BY 1, 2),
vbits AS (
  SELECT l.doc_id, l.k, l.pos, CASE WHEN l.lum > m.mean THEN 1 ELSE 0 END AS b
  FROM vlums l JOIN vmean m USING (doc_id, k)),
chunks AS (
  SELECT doc_id, k, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM vbits GROUP BY 1, 2, 3)"""

  /** The two-round Lehmer-square bit of
    * [[graft.ext.Multimodal.calBit]] in DuckDB BIGINT arithmetic
    * (overflow-safe: every intermediate is a product of two mod-2^31
    * residues < 2^62). Emitted as chained CTEs named `<p>b0..<p>b2`
    * (prefix keeps the three modalities' CTE names disjoint within
    * one query); `extraCols` carries grouping columns (e.g. the video
    * frame index) through the chain. The final column `bb` is the raw
    * clique bit at the stream position; pin/flip logic is applied by
    * the caller per grid position.
    */
  private def calBitCtes(prefix: String, srcCte: String, posExpr: String, extraCols: String = ""): String =
    s"""${prefix}b0 AS (
  SELECT doc_id$extraCols, pos,
    (((doc_id // 4) * 48271 + ($posExpr) * 12289 + 9973) % 2147483647) AS h
  FROM $srcCte),
${prefix}b1 AS (
  SELECT doc_id$extraCols, pos,
    ((((h * h) % 2147483647) + ($posExpr) * 48271 + 7919) * 69621) % 2147483647 AS h
  FROM ${prefix}b0),
${prefix}b2 AS (
  SELECT doc_id$extraCols, pos, (((h * h) % 2147483647) // 32768) % 2 AS bb
  FROM ${prefix}b1)"""

  /** Pin positions 0 (set) and 63 (clear), then flip the member's bit
    * at `flipPos` — mirrors [[graft.ext.Multimodal.calTargetBit]]. */
  private def calBitSelect(flipPos: String): String =
    s"""CASE WHEN pos = ($flipPos) THEN 1 - b0 ELSE b0 END AS b
  FROM (SELECT *, CASE WHEN pos = 0 THEN 1 WHEN pos = 63 THEN 0 ELSE bb END AS b0"""

  /** Analytic aHash CTEs for the scale-calibrated image fixture
    * ([[graft.ext.Multimodal.syntheticPngCal]]): the fingerprint bits
    * are the direct [[graft.ext.Multimodal.calBit]] draws (pinned /
    * member-flipped), which the two-level 100/150 pixel encoding
    * provably thresholds back to — no mean CTE needed.
    */
  private def calFingerprintCtes: String =
    s"""csamp AS (
  SELECT doc_id, unnest(generate_series(0, 63)) AS pos FROM documents),
${calBitCtes("c", "csamp", "pos")},
cbits AS (
  SELECT doc_id, pos, ${calBitSelect("(doc_id % 4) * 9")} FROM cb2) t),
cchunks AS (
  SELECT doc_id, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM cbits GROUP BY 1, 2)"""

  /** Analytic energy-hash CTEs for the calibrated audio fixture
    * ([[graft.ext.Multimodal.syntheticWavCal]]): frame-constant
    * two-level amplitudes, so the frame-energy bits are the direct
    * draws at stream positions 4096+frame.
    */
  private def calAudioCtes: String =
    s"""aframes AS (
  SELECT doc_id, unnest(generate_series(0, 63)) AS pos FROM documents),
${calBitCtes("a", "aframes", "4096 + pos")},
abits AS (
  SELECT doc_id, pos, ${calBitSelect("(doc_id % 4) * 16")} FROM ab2) t),
achunks AS (
  SELECT doc_id, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM abits GROUP BY 1, 2)"""

  /** Analytic per-frame aHash CTEs for the calibrated video fixture
    * ([[graft.ext.Multimodal.syntheticGifCal]]) under the every=2
    * stride over its fixed 3 frames (k = 0, 2).
    */
  private def calVideoChunkCtes: String =
    s"""vfrc AS (
  SELECT doc_id, unnest([0, 2]) AS k FROM documents),
vsampc AS (
  SELECT doc_id, k, unnest(generate_series(0, 63)) AS pos FROM vfrc),
${calBitCtes("v", "vsampc", "8192 + k * 64 + pos", ", k")},
vbitsc AS (
  SELECT doc_id, k, pos, ${calBitSelect("(doc_id % 4) * 9")} FROM vb2) t),
vchunksc AS (
  SELECT doc_id, k, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM vbitsc GROUP BY 1, 2, 3)"""

  // def, not val: referenced from oracleSql's initializer above, and
  // object vals initialize in declaration order
  private def fingerprintCtes: String =
    """samp AS (
  SELECT doc_id, unnest(generate_series(0, 63)) AS pos FROM documents),
lums AS (
  SELECT doc_id, pos,
    ((31 * doc_id + 7 * (((pos % 8) * (1 + doc_id % 8)) // 8)
                  + 13 * (((pos // 8) * (1 + doc_id % 5)) // 8)) % 256) AS lum
  FROM samp),
m AS (SELECT doc_id, sum(lum) // 64 AS mean FROM lums GROUP BY 1),
bits AS (
  SELECT l.doc_id, l.pos, CASE WHEN l.lum > m.mean THEN 1 ELSE 0 END AS b
  FROM lums l JOIN m USING (doc_id)),
chunks AS (
  SELECT doc_id, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM bits GROUP BY 1, 2)"""
}
