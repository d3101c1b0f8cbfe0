package graft

import graft.ext.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSuite {

  test("decodeStub histogram counts every byte exactly once") {
    val bytes = Array.tabulate(256)(_.toByte)
    val hist = Multimodal.decodeStub(bytes)
    assert(hist.sum == 256)
    assert(hist.forall(_ == 16)) // uniform bytes → 16 per 16-wide bin
  }

  test("resizeStub bounds payload size deterministically") {
    val bytes = Array.tabulate(1000)(_.toByte)
    val small = Multimodal.resizeStub(bytes, 100)
    assert(small.length == 100)
    assert(small.toSeq == Multimodal.resizeStub(bytes, 100).toSeq)
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 100).toSeq == Seq[Byte](1, 2))
  }

  test("frameSampleStub strides frames") {
    val video = Array.tabulate(40)(_.toByte) // 10 frames of 4 bytes
    val frames = Multimodal.frameSampleStub(video, frameBytes = 4, every = 3)
    assert(frames.length == 4) // frames 0,3,6,9
    assert(frames.head.toSeq == Seq[Byte](0, 1, 2, 3))
  }

  test("decodeImage decodes PNG and BMP fixtures to exact dimensions and histogram") {
    // hand-built 2x2 image: pixels (0,0)=black, (1,0)=white, (0,1)=mid
    // gray 128, (1,1)=pure red. Integer luminance: 0, 255, 128,
    // (299*255)/1000 = 76 → bins 0, 15, 8, 4.
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0x808080); img.setRGB(1, 1, 0xff0000)
    for (fmt <- Seq("png", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK should ship a $fmt writer")
      val Some((gotFmt, w, h, hist)) = Multimodal.decodeImage(bos.toByteArray)
      assert(gotFmt == fmt, s"format: $gotFmt")
      assert((w, h) == ((2, 2)))
      val expected = Array.fill(Multimodal.HistBins)(0L)
      expected(0) = 1; expected(15) = 1; expected(8) = 1; expected(4) = 1
      assert(hist.toSeq == expected.toSeq, s"hist ${hist.toSeq}")
    }
    // non-image payloads are None → callers fall back to the stub
    assert(Multimodal.decodeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte]()).isEmpty)
    // truncated PNG: signature matches but decode fails cleanly
    val png = { val b = new java.io.ByteArrayOutputStream(); javax.imageio.ImageIO.write(img, "png", b); b.toByteArray }
    assert(Multimodal.decodeImage(png.take(20)).isEmpty)
  }

  test("syntheticPng round-trips through a real ImageIO decode to the analytic features") {
    for (id <- Seq(0L, 1L, 7L, 42L, 499L)) {
      val Some((fmt, w, h, hist)) = Multimodal.decodeImage(Multimodal.syntheticPng(id))
      assert(fmt == "png")
      assert(w == 1 + (id % 8).toInt && h == 1 + (id % 5).toInt, s"id $id: ${(w, h)}")
      val expected = Array.fill(Multimodal.HistBins)(0L)
      for (x <- 0 until w; y <- 0 until h) {
        val g = ((31 * id + 7 * x + 13 * y) % 256).toInt
        expected((g * Multimodal.HistBins) >> 8) += 1
      }
      assert(hist.toSeq == expected.toSeq, s"id $id: ${hist.toSeq} vs ${expected.toSeq}")
    }
  }

  test("attachMedia builds binary payload + typed metadata") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, "hello"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val rec = Multimodal.attachMedia(df, "doc_id", "text").collect()(0)
    assert(rec.getAs[Array[Byte]]("media").toSeq == "hello".getBytes("UTF-8").toSeq)
    assert(rec.getStruct(2).getAs[Long]("nBytes") == 5L)
  }

  /** Analytic aHash replaying imageFingerprint64 from the synthetic
    * pixel formula — the same computation the DuckDB oracle does.
    */
  private def analyticFp(id: Long): Long = {
    val w = 1 + (id % 8).toInt
    val h = 1 + (id % 5).toInt
    val lums = Array.tabulate(64) { p =>
      val sx = (p % 8) * w / 8
      val sy = (p / 8) * h / 8
      ((31 * id + 7 * sx + 13 * sy) % 256).toInt
    }
    val mean = lums.map(_.toLong).sum / 64
    lums.zipWithIndex.foldLeft(0L) { case (fp, (l, p)) =>
      if (l > mean) fp | (1L << p) else fp
    }
  }

  test("imageFingerprint64: real decode matches the analytic aHash bit-for-bit") {
    for (id <- 0L until 200L) {
      val Some(fp) = Multimodal.imageFingerprint64(Multimodal.syntheticPng(id))
      assert(fp == analyticFp(id), s"id $id: ${fp.toBinaryString} vs ${analyticFp(id).toBinaryString}")
    }
    assert(Multimodal.imageFingerprint64("not an image".getBytes).isEmpty)
  }

  test("imageNearDupPairs equals brute-force hamming <= 3 (banding is exact, not probabilistic)") {
    import spark.implicits._
    // ids spanning several dim classes plus the 1280-periodic exact-dup
    // families the synthetic formula produces
    val ids = ((0L until 150L) ++ Seq(1280L, 1285L, 1297L, 2560L, 2565L)).toSeq
    val recs = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticPng(id), Multimodal.MediaMeta("png", 0, 0, 0L)))
    val got = Multimodal.imageNearDupPairs(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val fps = ids.map(id => id -> analyticFp(id)).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      hd = java.lang.Long.bitCount(fps(a) ^ fps(b)) if hd <= 3
    } yield (a, b, hd.toLong)).toSet
    assert(want.nonEmpty, "fixture produced no near-dup pairs — weak test")
    assert(got == want,
      s"missed: ${(want -- got).take(5)}; spurious: ${(got -- want).take(5)}")
    // the exact-dup family is present: same id mod lcm(40, 256) = 1280
    assert(got.contains((0L, 1280L, 0L)) && got.contains((1280L, 2560L, 0L)))
  }

  test("imageDedupFull recovers hamming-0 cliques past the bucket cap (the r11 residual)") {
    import spark.implicits._
    // every id % 40 == 0 synthetic image is 1x1 (dims 1+id%8 x 1+id%5),
    // so its 8x8 sample grid sees one pixel: lum > mean never holds and
    // the fingerprint is 0 for ALL of them — exactly the monochrome-
    // boilerplate mega-clique the imageNearDupPairs scaladoc warns
    // about. maxBucket=2 forces BucketCap.subSplit to shatter the fp-0
    // chunk buckets, so the banded tier alone must lose cross-sub
    // hamming-0 pairs; the exact tier must still link every member to
    // the clique's min id, cap-independent.
    val clique = (0L to 10L).map(_ * 40L)
    val recs = clique.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticPng(id), Multimodal.MediaMeta("png", 0, 0, 0L)))
    val full = Multimodal.imageDedupFull(recs, maxBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wantStars = clique.drop(1).map(id => (0L, id, 0L)).toSet
    assert(full.filter(_._3 == 0L) == wantStars,
      s"exact tier must be exactly the min-id star: ${full.filter(_._3 == 0L)}")
    // and the capped banded tier alone genuinely misses some of the
    // clique's pairs (11 members = 55 in full) — the residual this
    // operator exists to close
    val allPairs = (for (a <- clique; b <- clique if a < b) yield (a, b)).size
    val bandedOnly = Multimodal.imageNearDupPairs(recs, maxBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bandedOnly.size < allPairs,
      s"cap never bit (banded found all $allPairs clique pairs) — weak test")
  }

  test("incrementalImageDups gates a batch against history fingerprints like brute force") {
    import spark.implicits._
    def recsOf(ids: Seq[Long]) = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticPng(id), Multimodal.MediaMeta("png", 0, 0, 0L)))
    val all = (0L until 200L) ++ Seq(1280L, 1284L, 2560L)
    val (batchIds, histIds) = all.partition(_ % 4 == 0)
    val history = Multimodal.imageFingerprints(recsOf(histIds))
    val got = Multimodal.incrementalImageDups(history, recsOf(batchIds)).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getBoolean(4))))
      .toMap

    val hFp = histIds.map(id => id -> analyticFp(id))
    for (b <- batchIds) {
      val fp = analyticFp(b)
      val exact = hFp.filter(_._2 == fp).map(_._1).sorted.headOption
      val nears = hFp.map { case (hid, hf) => (hid, java.lang.Long.bitCount(fp ^ hf)) }
        .filter { case (_, hd) => hd >= 1 && hd <= 3 }
      val best = nears.sortBy { case (hid, hd) => (hd, hid) }.headOption
      val (e, n, h, nu) = got(b)
      assert(e == exact, s"batch $b exact: $e vs $exact")
      assert(n == best.map(_._1) && h == best.map(_._2.toLong),
        s"batch $b near: ($n, $h) vs $best")
      assert(nu == (exact.isEmpty && best.isEmpty), s"batch $b is_new")
    }
    // the fixture exercises every verdict shape, including the
    // near-only path (near_dup set, exact null)
    assert(got.values.exists(_._1.nonEmpty), "no exact dup in fixture — weak test")
    assert(got.values.exists(v => v._1.isEmpty && v._2.nonEmpty),
      "no near-only dup in fixture — weak test")
    assert(got.values.exists(_._4), "no new doc in fixture")
  }

  test("image gate two-day lifecycle: fp table round-trips parquet, day-2 dups flagged") {
    import spark.implicits._
    def recsOf(ids: Seq[Long]) = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticPng(id), Multimodal.MediaMeta("png", 0, 0, 0L)))
    val tmp = tempDir("graft-imggate")
    // day 1: ingest — decode once, persist ONLY the (id, fp) table
    val day1 = Seq(3L, 7L, 11L, 40L)
    Multimodal.imageFingerprints(recsOf(day1)).write.parquet(s"$tmp/fps")
    // day 2: 1283 = 3 + 1280 is a perceptual exact dup of day-1 id 3;
    // 0 is a flat 1x1 image (fp 0) like day-1 id 40; 6 is fresh; 999
    // is an undecodable payload — it still owes a verdict row (is_new)
    val day2 = recsOf(Seq(1283L, 0L, 6L)).union(Seq(Multimodal.MediaRecord(
      999L, "not an image".getBytes("UTF-8"), Multimodal.MediaMeta("bin", 0, 0, 0L))).toDS())
    val verdicts = Multimodal.incrementalImageDups(
      spark.read.parquet(s"$tmp/fps"), day2)
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), r.getBoolean(4))).toMap
    assert(verdicts(1283L) == (Some(3L), false), s"1283: ${verdicts(1283L)}")
    assert(verdicts(0L)._1.contains(40L) && !verdicts(0L)._2, s"0: ${verdicts(0L)}")
    assert(verdicts(6L)._1.isEmpty && verdicts(6L)._2, s"6: ${verdicts(6L)}")
    assert(verdicts(999L) == (None, true), s"999 (undecodable): ${verdicts(999L)}")
  }

  // ======================= audio (real WAV) =======================

  /** Analytic replay of the synthetic WAV's samples — what the DuckDB
    * oracle computes. */
  private def analyticSamples(id: Long): Array[Int] =
    Array.tabulate(512)(i =>
      (((37 * id + 11 * (i / 8) + 3 * (i % 8)) % 256).toInt - 128) * 256)

  /** Analytic replay of audioFingerprint64 over the formula. */
  private def analyticAudioFp(id: Long): Long = {
    val s = analyticSamples(id)
    val e = Array.tabulate(64) { f =>
      (0 until 8).map(j => math.abs(s(f * 8 + j).toLong)).sum / 8
    }
    val mean = e.sum / 64
    e.zipWithIndex.foldLeft(0L) { case (fp, (v, f)) =>
      if (v > mean) fp | (1L << f) else fp
    }
  }

  test("decodeWav: real javax.sound parse returns exact PCM samples, both endiannesses") {
    for (id <- 0L until 200L) {
      val Some((rate, samples)) = Multimodal.decodeWav(Multimodal.syntheticWav(id))
      assert(rate == 8000, s"id $id rate $rate")
      assert(samples.toSeq == analyticSamples(id).toSeq, s"id $id samples diverge")
    }
    // big-endian 16-bit PCM (AIFF-style byte order inside a WAV
    // container) decodes to the same values
    val vals = Array[Int](-32768, -1, 0, 1, 257, 32767)
    val be = new Array[Byte](vals.length * 2)
    for (i <- vals.indices) {
      be(2 * i) = ((vals(i) >> 8) & 0xff).toByte; be(2 * i + 1) = (vals(i) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 1, true, true)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(be), fmt, vals.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((r2, s2)) = Multimodal.decodeWav(bos.toByteArray)
    assert(r2 == 44100 && s2.toSeq == vals.toSeq, s"big-endian: $r2 ${s2.toSeq}")
    // non-audio payloads are None → callers fall back to the stub seam
    assert(Multimodal.decodeWav("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.syntheticPng(7L)).isEmpty)
  }

  test("audioFingerprint64: real decode matches the analytic energy hash bit-for-bit") {
    for (id <- 0L until 200L) {
      val Some(fp) = Multimodal.audioFingerprint64(Multimodal.syntheticWav(id))
      assert(fp == analyticAudioFp(id),
        s"id $id: ${fp.toBinaryString} vs ${analyticAudioFp(id).toBinaryString}")
    }
    // clips shorter than 64 samples can't fill 64 frames → None
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](40)), fmt, 20L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.audioFingerprint64(bos.toByteArray).isEmpty)
    assert(Multimodal.audioFingerprint64("noise".getBytes).isEmpty)
  }

  test("audioNearDupPairs equals brute-force hamming <= 3 through the shared banding") {
    import spark.implicits._
    // the energy hash depends on id only through 37·id mod 256, so ids
    // 256 apart are exact dups; nearby classes give the 1..3 tier
    val ids = ((0L until 150L) ++ Seq(256L, 260L, 271L, 512L)).toSeq
    val recs = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticWav(id), Multimodal.MediaMeta("wav", 0, 0, 0L)))
    val got = Multimodal.audioNearDupPairs(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps = ids.map(id => id -> analyticAudioFp(id)).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      hd = java.lang.Long.bitCount(fps(a) ^ fps(b)) if hd <= 3
    } yield (a, b, hd.toLong)).toSet
    assert(want.exists(_._3 == 0L) && want.exists(_._3 > 0L),
      "fixture lacks an exact or near tier — weak test")
    assert(got == want,
      s"missed: ${(want -- got).take(5)}; spurious: ${(got -- want).take(5)}")
    assert(got.contains((0L, 256L, 0L)) && got.contains((256L, 512L, 0L)))
  }

  test("audioQuality computes the QA metrics exactly and drops undecodables") {
    import spark.implicits._
    val ids = (0L until 100L).toSeq
    val recs = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticWav(id), Multimodal.MediaMeta("wav", 0, 0, 0L)))
      .union(Seq(Multimodal.MediaRecord(
        999L, "static".getBytes("UTF-8"), Multimodal.MediaMeta("bin", 0, 0, 0L))).toDS())
    val got = Multimodal.audioQuality(recs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(!got.contains(999L), "undecodable payload must be dropped")
    for (id <- ids) {
      val s = analyticSamples(id)
      val want = (
        s.length.toLong,
        s.map(v => v.toLong * v).sum / s.length,
        s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong,
        s.map(v => math.abs(v.toLong)).max,
        s.count(v => math.abs(v.toLong) >= 32000).toLong,
        s.count(v => math.abs(v.toLong) <= 256).toLong)
      assert(got(id) == want, s"id $id: ${got(id)} vs $want")
    }
    // the fixture exercises clipping and silence (full-scale negative
    // peak -32768 and near-zero samples both occur)
    assert(got.values.exists(_._5 > 0), "no clipped sample in fixture — weak test")
    assert(got.values.exists(_._6 > 0), "no silent sample in fixture — weak test")
  }

  // ================== video (real multi-frame GIF) ==================

  /** Analytic replay of frame k's aHash from the synthetic GIF's pixel
    * formula. */
  private def analyticFrameFp(id: Long, k: Int): Long = {
    val w = 4 + (id % 5).toInt
    val h = 5 + (id % 4).toInt
    val lums = Array.tabulate(64) { p =>
      ((31 * id + 17 * k + 7 * ((p % 8) * w / 8) + 13 * ((p / 8) * h / 8)) % 256).toInt
    }
    val mean = lums.map(_.toLong).sum / 64
    lums.zipWithIndex.foldLeft(0L) { case (fp, (l, p)) =>
      if (l > mean) fp | (1L << p) else fp
    }
  }

  test("videoFrameHashes: real multi-frame GIF decode matches the analytic per-frame aHash") {
    // brute-forces the whole (w 4-8, h 5-8, frames 2-4) envelope the
    // synthetic fixture lives in — this is the test that pins the JDK
    // GIF codec's losslessness there (heights 2-4 hit a JDK writer bug
    // and are deliberately outside the fixture's dimension formula)
    for (id <- 0L until 300L) {
      val Some(hashes) = Multimodal.videoFrameHashes(Multimodal.syntheticGif(id))
      assert(hashes.length == 2 + (id % 3).toInt, s"id $id frames ${hashes.length}")
      for (k <- hashes.indices)
        assert(hashes(k) == analyticFrameFp(id, k),
          s"id $id frame $k: ${hashes(k).toBinaryString} vs ${analyticFrameFp(id, k).toBinaryString}")
    }
    assert(Multimodal.videoFrameHashes("not a video".getBytes("UTF-8")).isEmpty)
    // a single-frame still decodes as a 1-frame "video" — fine; an
    // empty payload is None
    assert(Multimodal.videoFrameHashes(Array[Byte]()).isEmpty)
  }

  test("videoFrameFingerprints samples every n-th genuinely decoded frame") {
    import spark.implicits._
    val ids = (0L until 60L).toSeq
    val recs = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticGif(id), Multimodal.MediaMeta("gif", 0, 0, 0L)))
    val got = Multimodal.videoFrameFingerprints(recs, every = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      id <- ids
      k <- 0 until (2 + (id % 3).toInt) if k % 2 == 0
    } yield (id, k.toLong) -> analyticFrameFp(id, k)).toMap
    assert(got == want, s"sampled frame fps diverge (got ${got.size}, want ${want.size})")
  }

  test("videoNearDupPairs equals brute-force min-hamming over sampled frame pairs") {
    import spark.implicits._
    val ids = (0L until 150L).toSeq
    val recs = ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticGif(id), Multimodal.MediaMeta("gif", 0, 0, 0L)))
    val got = Multimodal.videoNearDupPairs(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // brute force over DISTINCT sampled-frame fps per video, matching
    // the operator's (doc_a, doc_b, fpa, fpb) de-dup
    val vfps = ids.map(id => id ->
      (0 until (2 + (id % 3).toInt)).filter(_ % 2 == 0).map(analyticFrameFp(id, _)).toSet).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      hams = for (x <- vfps(a).toSeq; y <- vfps(b).toSeq;
        hd = java.lang.Long.bitCount(x ^ y) if hd <= 3) yield hd.toLong
      if hams.nonEmpty
    } yield (a, b) -> ((hams.min, hams.size.toLong))).toMap
    assert(want.nonEmpty, "fixture produced no video near-dups — weak test")
    assert(got == want, s"missed: ${(want.keySet -- got.keySet).take(5)}; " +
      s"spurious: ${(got.keySet -- want.keySet).take(5)}; " +
      s"diffs: ${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(5)}")
  }

  test("extractFeatures runs batched per-partition and preserves ids") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 200L).map(i => Row(i, s"doc number $i payload"))),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val feats = Multimodal.featuresOf(df, "doc_id", "text").collect()
    assert(feats.length == 200)
    assert(feats.map(_.id).toSet == (1L to 200L).toSet)
    val f1 = feats.find(_.id == 1L).get
    assert(f1.histogram.sum == "doc number 1 payload".getBytes("UTF-8").length)
  }

  // ===== scale-calibrated clique fixtures =====

  /** The analytic target fingerprint the _cal payloads encode:
    * [[Multimodal.calBit]] with position 0 pinned set, 63 pinned
    * clear, member's diagonal bit flipped. */
  private def calTargetFp(id: Long, posOf: Int => Long, flipPos: Int): Long = {
    var fp = 0L
    for (p <- 0 until 64) {
      var b = Multimodal.calBit(id / Multimodal.CalCliqueSize, posOf(p))
      if (p == 0) b = 1
      if (p == 63) b = 0
      if (p == flipPos) b = 1 - b
      if (b == 1) fp |= 1L << p
    }
    fp
  }

  test("calibrated fixtures: real decode reproduces the chosen bits for all three modalities") {
    for (id <- Seq(0L, 1L, 7L, 123L, 4999L, 49999L)) {
      val member = (id % 4).toInt
      assert(Multimodal.imageFingerprint64(Multimodal.syntheticPngCal(id)).get ==
        calTargetFp(id, p => p.toLong, member * 9), s"image id=$id")
      assert(Multimodal.audioFingerprint64(Multimodal.syntheticWavCal(id)).get ==
        calTargetFp(id, p => 4096L + p, member * 16), s"audio id=$id")
      val frames = Multimodal.videoFrameHashes(Multimodal.syntheticGifCal(id)).get
      assert(frames.length == 3, s"video id=$id frame count")
      for (k <- 0 until 3)
        assert(frames(k) == calTargetFp(id, p => 8192L + k * 64L + p, member * 9),
          s"video id=$id frame $k")
    }
  }

  test("calibrated fixtures: near-dup output is EXACTLY 6 pairs per clique, zero cross-family") {
    // the property the fixtures exist for: output ∝ corpus (6 per
    // 4-member family), so a 1×/10× wall-clock curve over them
    // measures candidate generation, not output volume. The r13
    // single-round Lehmer fixture failed exactly this (460 489 pairs
    // from 5 000 docs ≈ 60× the designed count, growing ~quadratic).
    import spark.implicits._
    val n = 400L // 100 families
    val ids = spark.range(0, n).select(org.apache.spark.sql.functions.col("id"))
      .as[Long].repartition(4)
    val recs = ids.map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticPngCal(id), Multimodal.MediaMeta("png", 0, 0, 0L)))
    val pairs = Multimodal.imageNearDupPairs(recs).collect()
    assert(pairs.length == (n / 4 * 6).toInt, s"got ${pairs.length} pairs")
    assert(pairs.forall(r => r.getLong(0) / 4 == r.getLong(1) / 4),
      "cross-family near pair found — fixture decorrelation regressed")
  }
}
