package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct, and per-item
  * compute (decode / feature-extract / resize / frame-sample) runs as
  * batched partition-local JVM code over a typed Dataset — the Scala
  * analog of a vectorized (Pandas-style) batch UDF: one iterator per
  * partition, items processed in fixed-size batches, no driver
  * round-trips, schema declared up front.
  *
  * ALL THREE modality decodes are REAL, using only JDK codecs:
  * images via `javax.imageio` (PNG / BMP / GIF / JPEG → exact pixels,
  * [[decodeImage]]), audio via `javax.sound.sampled` (RIFF/WAVE
  * 16-bit PCM → exact samples, [[decodeWav]]), and video via
  * ImageIO's multi-image GIF reader (animated GIF → exact per-frame
  * pixels, [[videoFrameHashes]]). Payloads needing a non-JDK codec
  * (MP3/AAC audio, MP4/H.264 video, exotic stills) fall back to the
  * declared deterministic stub ([[decodeStub]], a raw byte
  * histogram) — swapping in a JNI codec for those changes one
  * function.
  *
  * 100 TB notes: binary payloads dominate row size — keep them OUT of
  * shuffles (extract features first, shuffle the small feature rows),
  * size `spark.sql.files.maxPartitionBytes` so a partition of blobs
  * fits executor memory, and never pivot/collect a binary column.
  */
object Multimodal {

  /** Fingerprint caches registered by [[imageNearDupPairs]] /
    * [[incrementalImageDups]] / [[imageDedupFull]] — the operators
    * persist the (id, fp) scan because several consumers would
    * otherwise each re-decode every image. [[unpersistCaches]] is the
    * deterministic release path (Bench/Verify call it between queries,
    * gates call it per batch); `spark.catalog.clearCache()` alone frees
    * the storage but leaves this buffer accumulating plan objects, the
    * same split [[Dedup.unpersistSpanCaches]] manages for span windows.
    */
  private val fpCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private def registerCache(df: DataFrame): DataFrame =
    fpCaches.synchronized { fpCaches += df; df }

  /** Release every fingerprint cache registered since the last call —
    * storage and registry both. */
  def unpersistCaches(): Unit = fpCaches.synchronized {
    fpCaches.foreach(_.unpersist(blocking = false))
    fpCaches.clear()
  }

  /** Persist a frame under this registry's lifecycle — for callers
    * (e.g. query registrations) that build an in-query fingerprint
    * history where production would read parquet, so their caches get
    * the same deterministic [[unpersistCaches]] release as the
    * operators' own. */
  def managedPersist(df: DataFrame): DataFrame =
    registerCache(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Typed metadata carried beside the payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, format: String, nBytes: Long,
      width: Int, height: Int, histogram: Array[Long])

  val HistBins = 16

  /** REAL image decode via the JDK's `javax.imageio` (no external
    * dependency): returns `(formatName, width, height, luminance
    * histogram)` for any payload a registered ImageReader recognizes
    * (PNG / BMP / GIF / JPEG in a stock JDK), None otherwise. The
    * histogram is 16-bin integer luminance — `lum = (299·r + 587·g +
    * 114·b) / 1000` (integer division; equals the gray value exactly on
    * gray pixels), `bin = (lum · 16) >> 8` — all-integer math, so the
    * features are deterministic and cross-engine checkable. */
  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, Array[Long])] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Long](HistBins)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            hist((lum * HistBins) >> 8) += 1
            x += 1
          }
          y += 1
        }
        Some((fmt, w, h, hist))
      } finally reader.dispose()
      // NonFatal, not just IOException: ImageIO readers throw unchecked
      // exceptions (ArrayIndexOutOfBounds, IllegalArgument, ...) on
      // malformed-but-recognized payloads; a corrupt image must fall
      // back to None, not kill the task
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Deterministic tiny grayscale PNG derived from an id — pixel (x,y)
    * has gray value `(31·id + 7·x + 13·y) mod 256`, dimensions
    * `(1 + id mod 8) × (1 + id mod 5)`. Because PNG is lossless, the
    * decode of this payload is analytically predictable from `id`
    * alone, which is what lets a SQL oracle hash-check a real
    * ImageIO round-trip. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 1 + (id % 8).toInt
    val h = 1 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (((31 * id + 7 * x + 13 * y) % 256) + 256) % 256
        img.setRGB(x, y, (g << 16 | g << 8 | g).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB — stands in for a real decode of the formats whose codecs
    * are NOT in the JDK (MP3/AAC audio, MP4/H.264 video; `???` in
    * spirit). Deterministic fake: 16-bin histogram of byte values.
    * Replace with a JNI decoder without touching any Spark plumbing —
    * the JDK-covered formats (PNG/BMP/GIF/JPEG stills, WAV PCM audio,
    * animated-GIF video) already take the real paths above.
    */
  def decodeStub(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](HistBins)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * HistBins) >> 8) += 1
      i += 1
    }
    hist
  }

  /** STUB resize: a real implementation re-encodes pixels; the fake
    * deterministically truncates/strides the payload to `targetBytes`.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = bytes.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
    }

  /** STUB frame sampling for "video" payloads: treats the payload as
    * fixed-size frames and returns every `every`-th frame.
    */
  def frameSampleStub(bytes: Array[Byte], frameBytes: Int, every: Int): Seq[Array[Byte]] =
    bytes.grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % every == 0 => f }
      .toSeq

  /** Wrap a text column as a media payload (utf-8 bytes) with metadata —
    * the ingest adapter used by tests/queries in lieu of real image
    * files.
    */
  def attachMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit("raw").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        length(col(payloadCol)).cast("long").as("nBytes")).as("meta"))

  /** Batched feature extraction: mapPartitions over the typed Dataset,
    * processing `batchSize` records at a time (the batch shape a
    * vectorized decoder wants — amortizes codec init per batch, bounds
    * peak memory to one batch of payloads). Payloads a JDK ImageReader
    * recognizes get the REAL decode (format / width / height /
    * luminance histogram); everything else falls back to the declared
    * byte-histogram stub with the carried metadata.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init a non-JDK codec here
        batch.iterator.map { r =>
          decodeImage(r.media) match {
            case Some((fmt, w, h, hist)) =>
              MediaFeatures(r.id, fmt, r.meta.nBytes, w, h, hist)
            case None =>
              MediaFeatures(r.id, r.meta.format, r.meta.nBytes,
                r.meta.width, r.meta.height, decodeStub(r.media))
          }
        }
      }
    }
  }

  /** End-to-end: text table → media records → batched features. */
  def featuresOf(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    extractFeatures(attachMedia(df, idCol, payloadCol).as[MediaRecord])
  }

  /** The aHash core shared by still images and video frames: an 8×8
    * nearest-neighbor luminance sample grid (`sx = x·w/8`,
    * `sy = y·h/8`, integer division — a deterministic stand-in for the
    * usual box-filter resize) → threshold each sample against the
    * integer mean of all 64 → pack into a Long, bit `y·8+x` set iff
    * `lum > mean`. All-integer math (`lum = (299r+587g+114b)/1000`,
    * exact on gray pixels), so the hash of a losslessly-encoded frame
    * is analytically predictable from its pixel formula.
    */
  private def aHash64(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    val lums = new Array[Int](64)
    var sum = 0L
    var p = 0
    while (p < 64) {
      val rgb = im.getRGB((p % 8) * w / 8, (p / 8) * h / 8)
      val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
      lums(p) = lum; sum += lum; p += 1
    }
    val mean = sum / 64
    var fp = 0L
    p = 0
    while (p < 64) { if (lums(p) > mean) fp |= 1L << p; p += 1 }
    fp
  }

  /** 64-bit average-hash perceptual fingerprint (aHash): REAL ImageIO
    * decode → [[aHash64]] over the decoded pixels. What lets the
    * DuckDB oracle hash-check a real decode is that the whole chain is
    * integer math over a lossless codec. None for payloads no JDK
    * reader accepts.
    */
  def imageFingerprint64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map(aHash64)
  }

  /** Batched fingerprint extraction — same partition-local batch shape
    * as [[extractFeatures]]; payloads without a JDK image reader are
    * dropped (a near-dup pass has nothing to say about undecodable
    * media).
    */
  def imageFingerprints(ds: Dataset[MediaRecord], batchSize: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap(r =>
        imageFingerprint64(r.media).map(fp => (r.id, fp))))
    }.toDF("id", "fp")
  }

  /** Incremental image-dedup gate: flag NEW (batch) images that
    * perceptually duplicate an already-ingested HISTORY corpus — the
    * multimodal counterpart of [[Dedup.incrementalDupsFromSignatures]],
    * with the 64-bit aHash playing the signature role. `historyFps` is
    * the persisted `(id, fp)` table ([[imageFingerprints]], written to
    * parquet once per ingest): history pixels are decoded exactly once,
    * on arrival — every later gate reads only the 16-byte signature
    * rows. Exact tier = identical fingerprint (hamming 0, perceptual
    * identity, robust to lossless re-encoding); near tier = hamming in
    * `[1, maxHamming]` among chunk-banding candidates (exact recall for
    * maxHamming ≤ 3, see [[imageNearDupPairs]]), best = smallest
    * hamming, ties to the smaller history id. One row per EVERY batch
    * image — `(doc_id, exact_dup_id, near_dup_id, near_hamming,
    * is_new)` — including payloads no JDK reader decodes: those can
    * match nothing, so both tiers are null and `is_new` is true (the
    * same keep-by-default verdict the text gate gives docs too short
    * to shingle; quarantine undecodable media upstream if keeping it
    * is wrong for the pipeline).
    *
    * Scale shape: the batch is the small side everywhere — its
    * fingerprints broadcast into a column-pruned history scan per tier;
    * no history shuffle, no history self-join, history media never
    * re-read. Composable with the streaming gate pattern
    * ([[graft.streaming.StreamingDedupGate]]): run this per
    * micro-batch, then append the batch's `(id, fp)` rows to the
    * fingerprint table keyed by batchId — and release the per-call
    * batch-fingerprint cache between batches (an action over the
    * verdicts, then `spark.catalog.clearCache()` or an explicit
    * unpersist of the returned plan's cache, exactly as Bench/Verify
    * do between queries) so a long-running gate doesn't accumulate
    * dead batch caches.
    */
  def incrementalImageDups(
      historyFps: DataFrame,
      batch: Dataset[MediaRecord],
      maxHamming: Int = 3
  ): DataFrame = {
    // the batch-fingerprint cache is registered for release via
    // [[unpersistCaches]] (r11 advice: a long-running caller composing
    // this per micro-batch must not accumulate dead caches); a caller
    // wanting a tighter lifecycle builds its own fps frame and uses
    // [[incrementalImageDupsFromFps]], as the image gate does
    val bFps = registerCache(imageFingerprints(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    incrementalImageDupsFromFps(historyFps, batch.toDF().select(col("id")), bFps, maxHamming)
  }

  /** [[incrementalImageDups]] with the batch side already
    * fingerprinted: `batchIds` is one `id` row per batch image
    * (decodable or not — each owes a verdict), `batchFps` its `(id,
    * fp)` rows ([[imageFingerprints]]); the CALLER owns `batchFps`'s
    * persistence and release. This is the gate-loop entry point: a
    * per-micro-batch caller persists the batch fingerprints, gates,
    * appends them to the fingerprint table, and unpersists — no cache
    * outlives the batch.
    */
  def incrementalImageDupsFromFps(
      historyFps: DataFrame,
      batchIds: DataFrame,
      batchFps: DataFrame,
      maxHamming: Int = 3
  ): DataFrame =
    incrementalHammingDupsFromFps(historyFps, batchIds, batchFps, maxHamming)

  /** Modality-agnostic incremental gate over 64-bit fingerprints —
    * the core behind [[incrementalImageDupsFromFps]], equally valid
    * for the audio energy hash (same exact tier, same banded hamming
    * near tier, same batch-broadcast scale shape).
    */
  def incrementalHammingDupsFromFps(
      historyFps: DataFrame,
      batchIds: DataFrame,
      batchFps: DataFrame,
      maxHamming: Int = 3
  ): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      s"4-chunk banding guarantees recall only for hamming <= 3, got $maxHamming")
    val bFps = batchFps
    val exactM = historyFps.select(col("id").as("hid"), col("fp"))
      .join(broadcast(bFps.select(col("id").as("doc_id"), col("fp"))), "fp")
      .groupBy("doc_id").agg(min("hid").as("exact_dup_id"))

    def withChunks(df: DataFrame): DataFrame =
      df.select(col("*"),
        explode(expr(
          "transform(sequence(0, 3), c -> struct(c AS chunk, shiftrightunsigned(fp, c * 16) & 65535 AS cval))")).as("e"))
        .select(df.columns.map(col) :+ col("e.chunk").as("chunk") :+ col("e.cval").as("cval"): _*)

    val hChunks = withChunks(historyFps.select(col("id").as("hid"), col("fp")))
      .select(col("hid"), col("fp").as("hfp"), col("chunk"), col("cval"))
    val bChunks = withChunks(bFps.select(col("id").as("doc_id"), col("fp")))
    // popcount + band filter before the distinct: only (batch, history)
    // matches inside the hamming window reach the dedup exchange
    val scored = hChunks.join(broadcast(bChunks), Seq("chunk", "cval"))
      .withColumn("hamming", bit_count(col("fp").bitwiseXOR(col("hfp"))).cast("long"))
      .filter(col("hamming") >= 1 && col("hamming") <= maxHamming)
      .select("doc_id", "hid", "hamming").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("hamming").asc, col("hid").asc)
    val best = scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("doc_id"), col("hid").as("near_dup_id"), col("hamming").as("near_hamming"))

    // assemble from the BATCH ids, not the fingerprint frame — an
    // undecodable payload has no fingerprint row but still owes the
    // caller a verdict (both tiers null => is_new), mirroring
    // Dedup.incrementalDupsFromSignatures' assembly from `batch`
    batchIds.select(col("id").as("doc_id"))
      .join(broadcast(exactM), Seq("doc_id"), "left")
      .join(broadcast(best), Seq("doc_id"), "left")
      .withColumn("is_new", col("exact_dup_id").isNull && col("near_dup_id").isNull)
  }

  /** Image near-duplicate pairs by perceptual fingerprint: candidate
    * generation is hamming-distance banding on the 64-bit aHash — four
    * 16-bit chunks, so by pigeonhole ANY pair within hamming ≤ 3
    * shares at least one whole chunk: zero false negatives while every
    * bucket stays under `maxBucket`, unlike MinHash banding's
    * probabilistic recall. Candidates are verified with
    * `bit_count(fpa XOR fpb)`. Same scale shape as
    * [[Dedup.simhashPairs]]: row-local fingerprints (the only pass
    * over the binary payloads — they never enter a shuffle), a
    * (chunk, value)-keyed equi-join salted via [[BucketCap.subSplit]]
    * (flat/monochrome images all hash to the same fingerprint and
    * form exactly the hot bucket the cap bounds), and a per-pair
    * codegen popcount.
    *
    * Recall caveats, both enforced or documented: `maxHamming` above 3
    * is rejected (more bands would be required for the pigeonhole
    * guarantee), and once a (chunk, value) bucket exceeds `maxBucket`
    * the salt splits it and cross-sub-bucket pairs inside that bucket
    * are NOT compared — the exactness claim holds up to the cap. A
    * mega-bucket is near-certainly one identical fingerprint repeated
    * (16 bits have 65536 values; a crawl's monochrome boilerplate), so
    * the lost pairs are overwhelmingly hamming-0 ones recoverable by
    * grouping on `fp` directly ([[Dedup.exact]] on the fingerprint
    * column) — run that cheap exact pass alongside if completeness
    * within flat-image cliques matters.
    */
  def imageNearDupPairs(
      ds: Dataset[MediaRecord],
      maxHamming: Int = 3,
      maxBucket: Int = 100000
  ): DataFrame = {
    // the fingerprint scan feeds BOTH join sides plus the hot-bucket
    // count — without a persist each consumer would re-decode every
    // image (the dominant cost of this operator). Same reasoning as
    // minhashLshPairs' signature persist; at 100 TB materialize the
    // (id, fp) table to parquet instead. Registered for release via
    // [[unpersistCaches]] (Bench/Verify call it between queries).
    val fps = registerCache(imageFingerprints(ds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    imageNearDupPairsFromFps(fps, maxHamming, maxBucket)
  }

  /** [[imageNearDupPairs]] over a pre-built `(id, fp)` frame
    * ([[imageFingerprints]], typically persisted by the caller or read
    * back from the fingerprint table) — the decode-free core shared by
    * the pair scan and [[imageDedupFull]]. Delegates to the
    * modality-agnostic [[hammingNearDupPairsFromFps]].
    */
  def imageNearDupPairsFromFps(
      fps: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 100000
  ): DataFrame = hammingNearDupPairsFromFps(fps, maxHamming, maxBucket)

  /** Modality-agnostic near-dup pair scan over ANY 64-bit perceptual
    * fingerprint frame `(id, fp)` — image aHash ([[imageFingerprints]]),
    * audio energy hash ([[audioFingerprints]]), or video frame hashes
    * ([[videoFrameFingerprints]], several rows per id; downstream
    * aggregation turns frame-pair rows into item pairs). The banding,
    * its pigeonhole recall guarantee, and the [[BucketCap.subSplit]]
    * salt are fingerprint-semantics-free, so every modality shares one
    * audited code path.
    */
  def hammingNearDupPairsFromFps(
      fps: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 100000
  ): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      s"4-chunk banding guarantees recall only for hamming <= 3, got $maxHamming")
    val chunks = fps.select(col("id"), col("fp"),
      explode(expr(
        "transform(sequence(0, 3), c -> struct(c AS chunk, shiftrightunsigned(fp, c * 16) & 65535 AS cval))")).as("e"))
      .select(col("id"), col("fp"), col("e.chunk").as("chunk"), col("e.cval").as("cval"))
    val salted = BucketCap.subSplit(chunks, Seq("chunk", "cval"),
      concat_ws("#", col("id").cast("string"), col("chunk").cast("string")), maxBucket)
    val a = salted.select(col("id").as("doc_a"), col("fp").as("fpa"),
      col("chunk"), col("cval"), col("_salt"))
    val b = salted.select(col("id").as("doc_b"), col("fp").as("fpb"),
      col("chunk"), col("cval"), col("_salt"))
    // popcount + threshold BEFORE the dedup exchange (same reasoning as
    // Dedup.simhashPairs): banded candidates beyond maxHamming never
    // cross the wire (filter∘distinct ≡ distinct∘filter for a
    // deterministic per-row score). The distinct must keep the
    // fingerprints: a multi-row-per-id modality (video frames) counts
    // one row per distinct FINGERPRINT pair, not per (a, b, hamming).
    a.join(b, Seq("chunk", "cval", "_salt"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "fpa", "fpb", "hamming").distinct()
      .select("doc_a", "doc_b", "hamming")
  }

  /** Complete image near-dup pass: the banded hamming scan UNIONED
    * with an exact-fingerprint tier — the composition the
    * [[imageNearDupPairs]] scaladoc prescribes to close its one recall
    * residual. The banded tier stops comparing across sub-buckets once
    * a (chunk, value) bucket exceeds `maxBucket`, and a mega-bucket is
    * near-certainly one identical fingerprint repeated (monochrome
    * boilerplate) — so the lost pairs are hamming-0 cliques. The exact
    * tier recovers ALL of them, cap-independent, as a star expansion:
    * `fp`-groupBy picks each clique's min id as canonical and links
    * every other member to it — one row per member (linear in clique
    * size), never the quadratic within-clique pair set. Output is one
    * `(doc_a, doc_b, hamming)` row per relation: hamming 0 rows are
    * the exact-tier stars (doc_a = clique canonical), hamming 1..
    * `maxHamming` rows are the banded near pairs. Residual after
    * composition: hamming >= 1 pairs whose every shared chunk-bucket
    * overflowed the cap — possible only when two DIFFERENT
    * fingerprints share a >`maxBucket` bucket, which the exact tier's
    * existence makes strictly rarer than the r11-documented hamming-0
    * case it closes.
    *
    * Scale shape: images decode ONCE into the shared persisted (id,
    * fp) scan feeding both tiers; the exact tier is one hash aggregate
    * plus a fp-keyed join of 16-byte rows; the banded tier is
    * unchanged from [[imageNearDupPairsFromFps]].
    */
  def imageDedupFull(
      ds: Dataset[MediaRecord],
      maxHamming: Int = 3,
      maxBucket: Int = 100000
  ): DataFrame = {
    val fps = registerCache(imageFingerprints(ds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val canon = fps.groupBy("fp").agg(min("id").as("doc_a"))
    val exactStars = fps.join(canon, "fp")
      .filter(col("id") > col("doc_a"))
      .select(col("doc_a"), col("id").as("doc_b"), lit(0L).as("hamming"))
    val near = imageNearDupPairsFromFps(fps, maxHamming, maxBucket)
      .filter(col("hamming") >= 1)
    exactStars.union(near)
  }

  // ===================== AUDIO (REAL WAV decode) =====================

  /** REAL audio decode via the JDK's `javax.sound.sampled` (no
    * external dependency): parses the RIFF/WAVE container and `fmt `
    * chunk with a real `AudioFileReader` and returns
    * `(sampleRateHz, samples)` for 16-bit signed PCM payloads — mono
    * or interleaved multichannel, either endianness — decoded to exact
    * integer sample values. None for payloads that are not a parseable
    * WAV (or not 16-bit PCM): compressed codecs (MP3/AAC/Opus) need a
    * non-JDK decoder and fall to the declared stub path, same seam as
    * images vs. exotic formats.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 ||
            f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          val out = new Array[Int](n)
          var i = 0
          if (f.isBigEndian)
            while (i < n) { out(i) = ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toInt; i += 1 }
          else
            while (i < n) { out(i) = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt; i += 1 }
          Some((f.getSampleRate.toInt, out))
        }
      } finally ais.close()
      // NonFatal for the same reason as decodeImage: a malformed-but-
      // recognized payload must yield None, not kill the task
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic tiny 16-bit PCM mono WAV derived from an id —
    * sample `i` (of 512, 8 kHz) is
    * `(((37·id + 11·⌊i/8⌋ + 3·(i mod 8)) mod 256) − 128) · 256`.
    * Because WAV PCM is lossless, the decode of this payload is
    * analytically predictable from `id` alone — the audio analog of
    * [[syntheticPng]], and what lets a SQL oracle hash-check a real
    * `javax.sound` round-trip. The RIFF/fmt/data container is
    * assembled by hand (the canonical 44-byte header), deliberately
    * NOT via `AudioSystem.write`: the real parser in [[decodeWav]] is
    * then exercised against independently-constructed bytes — a
    * shared writer/reader bug can't cancel itself out — and the
    * per-clip synthesis cost drops to a plain array fill (it sits
    * inside the fixture's decode-bound hot loop).
    */
  def syntheticWav(id: Long): Array[Byte] =
    wavPcm16(512, 8000,
      i => (((37 * id + 11 * (i / 8) + 3 * (i % 8)) % 256).toInt - 128) * 256)

  /** Hand-assembled 16-bit PCM mono RIFF container around a sample
    * formula — independent of javax.sound's WRITER so a writer/reader
    * bug pair can't cancel out in the round-trip specs.
    */
  private def wavPcm16(n: Int, rate: Int, sample: Int => Int): Array[Byte] = {
    val dataBytes = n * 2
    val out = new Array[Byte](44 + dataBytes)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, 36 + dataBytes); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, rate)
    le32(28, rate * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits/sample
    tag(36, "data"); le32(40, dataBytes)
    var i = 0
    while (i < n) {
      val s = sample(i)
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  val AudioFrames = 64

  /** 64-bit audio energy hash — the audio analog of aHash: REAL WAV
    * decode → 64 equal frames of `⌊n/64⌋` samples → per-frame mean
    * absolute amplitude (integer division) → threshold each frame
    * against the integer mean of all 64 → pack into a Long, bit `f`
    * set iff `energy(f) > mean`. Robust to uniform gain scaling about
    * the threshold and to sample-level noise the way aHash is robust
    * to pixel noise; all-integer math end-to-end, so the fingerprint
    * of a losslessly-coded WAV is analytically predictable from its
    * sample formula. None for undecodable payloads or clips shorter
    * than 64 samples.
    */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    decodeWav(bytes).collect { case (_, s) if s.length >= AudioFrames =>
      val flen = s.length / AudioFrames
      val e = new Array[Long](AudioFrames)
      var sum = 0L
      var f = 0
      while (f < AudioFrames) {
        var acc = 0L
        var j = 0
        while (j < flen) { acc += math.abs(s(f * flen + j).toLong); j += 1 }
        e(f) = acc / flen; sum += e(f); f += 1
      }
      val mean = sum / AudioFrames
      var fp = 0L
      f = 0
      while (f < AudioFrames) { if (e(f) > mean) fp |= 1L << f; f += 1 }
      fp
    }

  /** Per-clip audio quality metrics — the standard QA pass a speech /
    * audio training pipeline runs before anything else, computed
    * row-local over the REAL decode in one batched pass (the audio
    * analog of the Gopher-style text gates). All-integer outputs so
    * they hash cross-engine:
    *   - `mean_square` = Σs²/n (energy; silence screens low, hot mics
    *     screen high),
    *   - `zero_crossings` = sign flips between consecutive samples
    *     (crude spectral centroid: voiced speech low, noise/hiss high),
    *   - `peak_abs` and `n_clipped` (samples within `clipMargin` of
    *     full-scale — digital clipping),
    *   - `n_silence` (samples with |s| ≤ `silenceFloor`).
    * Thresholding/filtering on these is a reader-side predicate, same
    * posture as the text quality report. Undecodable payloads are
    * dropped (quarantine upstream, as with the gates).
    */
  def audioQuality(
      ds: Dataset[MediaRecord],
      clipMargin: Int = 768,
      silenceFloor: Int = 256,
      batchSize: Int = 64
  ): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        decodeWav(r.media).collect { case (_, s) if s.nonEmpty =>
          var i = 0
          var sumSq = 0L
          var zc = 0L
          var peak = 0L
          var clipped = 0L
          var silent = 0L
          while (i < s.length) {
            val v = s(i).toLong
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            if (a >= 32768L - clipMargin) clipped += 1
            if (a <= silenceFloor) silent += 1
            if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) zc += 1
            i += 1
          }
          (r.id, s.length.toLong, sumSq / s.length, zc, peak, clipped, silent)
        }
      })
    }.toDF("id", "n_samples", "mean_square", "zero_crossings", "peak_abs",
      "n_clipped", "n_silence")
  }

  /** Batched audio fingerprint extraction — same partition-local batch
    * shape as [[imageFingerprints]]; undecodable payloads are dropped.
    */
  def audioFingerprints(ds: Dataset[MediaRecord], batchSize: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap(r =>
        audioFingerprint64(r.media).map(fp => (r.id, fp))))
    }.toDF("id", "fp")
  }

  /** Audio near-duplicate pairs: [[audioFingerprint64]] energy hashes
    * through the shared [[hammingNearDupPairsFromFps]] banding — the
    * identical scale shape, salt, and recall guarantee as the image
    * scan, because the pair core is fingerprint-agnostic. Payloads
    * decode exactly once into the persisted `(id, fp)` scan.
    */
  def audioNearDupPairs(
      ds: Dataset[MediaRecord],
      maxHamming: Int = 3,
      maxBucket: Int = 100000
  ): DataFrame = {
    val fps = registerCache(audioFingerprints(ds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    hammingNearDupPairsFromFps(fps, maxHamming, maxBucket)
  }

  // =============== VIDEO (REAL multi-frame GIF decode) ===============

  /** REAL video-frame decode: animated GIF is the one motion format
    * the stock JDK genuinely decodes (ImageIO's GIF plugin reads every
    * frame of a multi-image stream), so "video" payloads here are
    * GIF87a/89a animations parsed frame-by-frame with a real
    * `ImageReader` — container parse, frame count, and per-frame
    * pixels are all real codec work. Returns the per-frame
    * [[aHash64]] sequence; None when no JDK reader recognizes the
    * payload. True MP4/H.264 needs a JNI codec and falls to the
    * declared [[frameSampleStub]] seam, exactly as audio compression
    * does for WAV.
    *
    * Caveat: frames are hashed as the reader returns them — raw
    * rasters, NOT composited against prior frames — so a real-world
    * delta-encoded GIF (partial rasters + disposal methods) hashes its
    * deltas, not the displayed frames. The synthetic fixture writes
    * full-frame GIFs only, where the two are identical.
    */
  def videoFrameHashes(bytes: Array[Byte]): Option[IndexedSeq[Long]] = {
    // createImageInputStream returns NULL (not an exception) when no
    // stream SPI is registered — an unguarded in.close() in the finally
    // would then throw an uncaught NPE and kill the task instead of
    // falling back to None like every other decode path
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (in == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in)
        val n = reader.getNumImages(true)
        Some((0 until n).map(k => aHash64(reader.read(k))))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Deterministic tiny grayscale animated GIF derived from an id —
    * `2 + id mod 3` frames of `(4 + id mod 5) × (5 + id mod 4)` pixels,
    * frame `k` pixel `(x,y)` gray `(31·id + 17·k + 7·x + 13·y) mod
    * 256`, written losslessly through an exact 256-gray palette. The
    * video analog of [[syntheticPng]]: GIF's LZW is lossless, so the
    * real multi-frame decode is analytically predictable from `id`.
    * (Dimensions sit inside the empirically-pinned envelope where the
    * JDK GIF codec round-trips exactly — heights 2–4 hit a JDK writer
    * bug; MultimodalSpec brute-forces the envelope every run.)
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val grays = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val w = 4 + (id % 5).toInt
    val h = 5 + (id % 4).toInt
    val frames = 2 + (id % 3).toInt
    // acquire the writer BEFORE opening the stream: a missing GIF writer
    // SPI would otherwise throw NoSuchElementException past the finally
    // and leak the stream (the read path's videoFrameHashes has the
    // matching SPI-absent guard)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF ImageWriter SPI registered in this JDK")
    val wr = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      var k = 0
      while (k < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = (((31 * id + 17 * k + 7 * x + 13 * y) % 256) + 256) % 256
            img.getRaster.setSample(x, y, 0, g.toInt)
            x += 1
          }
          y += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      wr.endWriteSequence()
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  // ===== scale-calibrated clique fixtures (measurement-grade) =====
  //
  // The id-congruence fixtures above have a FIXED fingerprint family
  // space (syntheticPng's payload is periodic in id mod lcm(8,5,256) =
  // 1280), so replicating the corpus F× makes every perceptual clique
  // ~F× denser and near-dup OUTPUT grows ~F² — a scale curve over them
  // measures output volume, not candidate generation. The calibrated
  // fixtures key content on clique = id / 4: family count GROWS with
  // the corpus, clique size is pinned at ≤ 4 (ids are unique under any
  // replication), so near-dup output grows EXACTLY linearly (6 pairs
  // per family, measured zero cross-family pairs at 50 000 docs) and
  // the wall-clock exponent reflects the banding join itself.
  // All-integer and overflow-safe, so a DuckDB oracle replays the
  // decode chain verbatim in BIGINT arithmetic.
  //
  // DESIGN NOTE (r14 rewrite): the fingerprint BITS are chosen
  // directly by [[calBit]] and the payloads synthesize two-level
  // values (100/150) that the threshold-at-mean hash provably maps
  // back to those bits (mean sits strictly between the levels for any
  // set-count in [0, 63]; position 63 is pinned clear so 64 is
  // unreachable). The r13 form derived bits by thresholding a
  // SINGLE-round Lehmer stream — which is affine in the clique for
  // fixed pos, so family streams differed by a pos-independent
  // constant that mod-256 + threshold-at-mean largely preserved:
  // 460 489 near pairs at 5 000 docs (~60× the designed 7 500), and
  // 100× output growth per 10× corpus — the quadratic artifact the
  // fixtures were built to remove. tools/ references: the
  // measurement is reproducible with the rowcounts.json dump.

  /** Members per calibrated clique (consecutive ids). */
  val CalCliqueSize = 4L

  /** Pseudo-random BIT per (clique, pos): two Lehmer-square rounds
    * with the position re-injected between them. One affine round (or
    * one square round — its difference structure is affine in pos) is
    * measurably insufficient; after two square rounds the
    * between-family difference is a degree-4 polynomial with
    * pos-dependent cross terms and the empirical cross-family
    * near-pair count on the dev corpora is zero. `pos` spaces for the
    * three modalities are disjoint (image 0–63, audio 4096+, video
    * 8192+) so cross-modal fingerprints are uncorrelated. Every
    * intermediate stays below 2^63 for clique < 2^31 — DuckDB BIGINT
    * replays it exactly.
    */
  def calBit(clique: Long, pos: Long): Int = {
    val M = 2147483647L
    var h = (clique * 48271L + pos * 12289L + 9973L) % M
    h = (h * h) % M
    h = ((h + pos * 48271L + 7919L) * 69621L) % M
    h = (h * h) % M
    ((h >> 15) & 1L).toInt
  }

  /** Target fingerprint bit at grid position p for clique member
    * `id`: the clique-random [[calBit]] draw, with position 0 pinned
    * set and 63 pinned clear (keeps the set-count in [0, 63] so the
    * two-level encoding below thresholds back exactly), and the
    * member's diagonal bit (p = member·9) flipped — in-clique pairs
    * land at hamming 2, cross-clique fps are independent draws
    * (hamming ≈ 32).
    */
  private def calTargetBit(id: Long, p: Int, pos: Long): Int = {
    var b = calBit(id / CalCliqueSize, pos)
    if (p == 0) b = 1
    if (p == 63) b = 0
    if (p == (id % CalCliqueSize).toInt * 9) b = 1 - b
    b
  }

  /** Calibrated image luminance at aHash grid position p (8×8 image,
    * so the grid IS the pixel grid): 100 or 150 by the target bit —
    * the integer mean lies in [100, 149] for any set-count ≤ 63, so
    * `lum > mean` reproduces the target bits verbatim.
    */
  def calLumImage(id: Long, p: Int): Int =
    100 + 50 * calTargetBit(id, p, p.toLong)

  /** Calibrated 8×8 grayscale PNG — decode → [[aHash64]] is exactly
    * [[calLumImage]] thresholded at its integer mean.
    */
  def syntheticPngCal(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < 64) {
      val g = calLumImage(id, p)
      img.setRGB(p % 8, p / 8, (g << 16 | g << 8 | g).toInt)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Calibrated per-frame amplitude for the audio fixture: every
    * sample in energy-hash frame f holds this value, so the frame
    * energy IS the amplitude — two-level (100/150) by the target bit,
    * so the energy hash thresholds back to the chosen bits exactly.
    */
  def calAmpAudio(id: Long, f: Int): Int = {
    // member flip on frame member·16 (frames 0/16/32/48), pins on
    // frames 0 and 63 — the FRAME index is the bit position here
    var b = calBit(id / CalCliqueSize, 4096L + f.toLong)
    if (f == 0) b = 1
    if (f == 63) b = 0
    if (f == (id % CalCliqueSize).toInt * 16) b = 1 - b
    100 + 50 * b
  }

  /** Calibrated 512-sample WAV (frame-constant amplitudes) — decode →
    * [[audioFingerprint64]] is exactly [[calAmpAudio]] thresholded at
    * its integer mean.
    */
  def syntheticWavCal(id: Long): Array[Byte] =
    wavPcm16(512, 8000, i => calAmpAudio(id, i / 8))

  /** Calibrated video luminance: frame k of 3, grid position p, with
    * the same member-diagonal perturbation in every frame.
    */
  def calLumVideo(id: Long, k: Int, p: Int): Int =
    100 + 50 * calTargetBit(id, p, 8192L + k * 64L + p)

  /** Calibrated 3-frame 8×8 animated GIF (h = 8 sits inside the
    * empirically-pinned JDK GIF round-trip envelope — heights 2–4 hit
    * the writer bug) — decode → per-frame [[aHash64]] is exactly
    * [[calLumVideo]] thresholded per frame.
    */
  def syntheticGifCal(id: Long): Array[Byte] = {
    val grays = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    // acquire the writer BEFORE opening the stream: a missing GIF writer
    // SPI would otherwise throw NoSuchElementException past the finally
    // and leak the stream (the read path's videoFrameHashes has the
    // matching SPI-absent guard)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF ImageWriter SPI registered in this JDK")
    val wr = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      var k = 0
      while (k < 3) {
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var p = 0
        while (p < 64) {
          img.getRaster.setSample(p % 8, p / 8, 0, calLumVideo(id, k, p))
          p += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      wr.endWriteSequence()
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Batched frame-sampled video fingerprints: one `(id, frame_idx,
    * fp)` row per every `every`-th frame — [[frameSampleStub]] made
    * REAL: the stride is applied to genuinely decoded GIF frames, and
    * only the sampled frames' 8-byte hashes leave the decode site
    * (the binary payload and the skipped frames' pixels never enter a
    * shuffle — at 100 TB the whole video corpus reduces to ~8 bytes ×
    * sampled frames before any exchange). Undecodable payloads are
    * dropped, as in the other fingerprint extractors.
    */
  def videoFrameFingerprints(
      ds: Dataset[MediaRecord],
      every: Int = 1,
      batchSize: Int = 64
  ): DataFrame = {
    require(every >= 1, s"frame stride must be >= 1, got $every")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
        videoFrameHashes(r.media).toSeq.flatMap(_.iterator.zipWithIndex.collect {
          case (fp, k) if k % every == 0 => (r.id, k.toLong, fp)
        })
      })
    }.toDF("id", "frame_idx", "fp")
  }

  /** Video near-duplicate pairs: two videos are near if ANY of their
    * sampled frames' aHashes land within `maxHamming` — the standard
    * keyframe-signature approach. The sampled frame fingerprints run
    * through the shared [[hammingNearDupPairsFromFps]] banding (which
    * tolerates several fp rows per id and already de-dups identical
    * `(id_a, id_b, fpa, fpb)` combinations), then collapse to one row
    * per video pair: the minimum frame-pair hamming plus how many
    * distinct near fp-pairs supported it. Scale shape: decode once
    * per video into the persisted frame-fp scan (8 bytes × sampled
    * frames per video), banding bounds the candidate space exactly as
    * for stills, and the final pair aggregation shuffles only
    * near-pair rows.
    */
  def videoNearDupPairs(
      ds: Dataset[MediaRecord],
      every: Int = 2,
      maxHamming: Int = 3,
      maxBucket: Int = 100000
  ): DataFrame = {
    val fps = registerCache(videoFrameFingerprints(ds, every)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    hammingNearDupPairsFromFps(fps.select(col("id"), col("fp")), maxHamming, maxBucket)
      .groupBy("doc_a", "doc_b")
      .agg(min("hamming").as("hamming"),
        count(lit(1)).as("n_near_fp_pairs"))
  }
}
