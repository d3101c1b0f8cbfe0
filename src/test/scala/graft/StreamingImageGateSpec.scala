package graft

import graft.ext.Multimodal
import graft.streaming.{BatchTable, ImageDedupGate}
import org.apache.spark.sql.Dataset

/** The image fingerprint table's full lifecycle — append → gate →
  * compact → gate — through the shared [[BatchTable]] component (r11
  * verdict item 5): compaction must be invisible to verdicts, replay
  * must overwrite rather than duplicate, and the committed-only guard
  * must refuse to fold the latest live batch.
  */
class StreamingImageGateSpec extends SparkSuite {

  private def recsOf(ids: Seq[Long]): Dataset[Multimodal.MediaRecord] = {
    import spark.implicits._
    ids.toDS().map(id => Multimodal.MediaRecord(
      id, Multimodal.syntheticPng(id), Multimodal.MediaMeta("png", 0, 0, 0L)))
  }

  // batch 0 seeds history; batch 1 adds more (1283 dups 3 across
  // batches); batch 2 is the probe: 2560 and 1320 are flat images
  // (fp 0, dups of 0/40), 4 is fresh (hamming >= 6 from every history
  // fingerprint) — expected verdicts are brute-forced from the real
  // fingerprints below, not hand-pinned
  private val b0 = Seq(3L, 7L, 11L, 40L)
  private val b1 = Seq(1283L, 0L, 6L)
  private val b2 = Seq(2560L, 4L, 1320L)

  private def fpOf(id: Long): Long =
    Multimodal.imageFingerprint64(Multimodal.syntheticPng(id)).get

  private def verdictsOf(dir: String, batchId: Long): Map[Long, (Option[Long], Option[Long], Boolean)] =
    spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col(BatchTable.BatchCol) === batchId)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.toString.toLong),
        Option(r.get(2)).map(_.toString.toLong), r.getBoolean(4))))
      .toMap

  test("append -> gate -> compact -> gate: verdicts identical with and without compaction") {
    val plain = tempDir("graft-imggate-plain")
    val compacted = tempDir("graft-imggate-compact")

    for (dir <- Seq(plain, compacted)) {
      ImageDedupGate.gateAndIngest(recsOf(b0), s"$dir/fps", s"$dir/verdicts", batchId = 0L)
      ImageDedupGate.gateAndIngest(recsOf(b1), s"$dir/fps", s"$dir/verdicts", batchId = 1L)
    }
    // fold batch 0 into the -1 partition on one side only
    ImageDedupGate.compactFingerprints(spark, s"$compacted/fps", upToBatch = 0L)
    for (dir <- Seq(plain, compacted))
      ImageDedupGate.gateAndIngest(recsOf(b2), s"$dir/fps", s"$dir/verdicts", batchId = 2L)

    val vPlain = verdictsOf(s"$plain/verdicts", 2L)
    val vCompacted = verdictsOf(s"$compacted/verdicts", 2L)
    assert(vPlain == vCompacted, s"compaction changed verdicts: $vPlain vs $vCompacted")
    // and the verdicts match a brute-force gate against the real
    // fingerprints of the accumulated history
    val hFp = (b0 ++ b1).map(id => id -> fpOf(id))
    for (b <- b2) {
      val fp = fpOf(b)
      val exact = hFp.filter(_._2 == fp).map(_._1).minOption
      val near = hFp.map { case (h, f) => (h, java.lang.Long.bitCount(fp ^ f)) }
        .filter { case (_, hd) => hd >= 1 && hd <= 3 }
        .sortBy { case (h, hd) => (hd, h) }.headOption
      val (e, n, nu) = vPlain(b)
      assert(e == exact, s"probe $b exact: $e vs $exact")
      assert(n == near.map(_._1), s"probe $b near: $n vs $near")
      assert(nu == (exact.isEmpty && near.isEmpty), s"probe $b is_new")
    }
    // the probe batch exercises both verdict shapes
    assert(vPlain.values.exists(!_._3), "no dup in probe batch — weak test")
    assert(vPlain.values.exists(_._3), "no fresh image in probe batch — weak test")

    // compacted layout: batch-0 partition folded away, sentinel present
    val parts = new java.io.File(s"$compacted/fps").listFiles()
      .map(_.getName).filter(_.startsWith(BatchTable.BatchCol)).toSet
    assert(parts == Set(s"${BatchTable.BatchCol}=-1", s"${BatchTable.BatchCol}=1",
      s"${BatchTable.BatchCol}=2"), parts.toString)
  }

  test("streaming lifecycle via start(): checkpointed day-2 run gates only the new files") {
    import spark.implicits._
    val dir = tempDir("graft-imggate-stream")
    def mediaDs(path: String) =
      graft.streaming.StreamingExtract.source(spark, path,
        recsOf(Seq(0L)).schema).as[Multimodal.MediaRecord]

    // DAY 1: first ingest — no fingerprint table yet, everything is new
    recsOf(b0).write.mode("overwrite").parquet(s"$dir/in")
    ImageDedupGate.start(mediaDs(s"$dir/in"), s"$dir/fps", s"$dir/verdicts", s"$dir/ckpt")
      .awaitTermination(120000)
    val v1 = spark.read.parquet(s"$dir/verdicts")
    assert(v1.count() == b0.size && v1.filter(org.apache.spark.sql.functions.col("is_new"))
      .count() == b0.size, "day 1: every image is new")

    // DAY 2: new files land; the checkpoint resumes and gates ONLY the
    // new batch against the accumulated fingerprints
    recsOf(b1).write.mode("append").parquet(s"$dir/in")
    ImageDedupGate.start(mediaDs(s"$dir/in"), s"$dir/fps", s"$dir/verdicts", s"$dir/ckpt")
      .awaitTermination(120000)
    val hFp = b0.map(id => id -> fpOf(id))
    val got = spark.read.parquet(s"$dir/verdicts")
      .filter(!org.apache.spark.sql.functions.col("doc_id").isin(b0: _*))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.toString.toLong),
        Option(r.get(2)).map(_.toString.toLong), r.getBoolean(4)))).toMap
    assert(got.keySet == b1.toSet, s"day-2 verdicts cover exactly the new batch: ${got.keySet}")
    for (b <- b1) {
      val fp = fpOf(b)
      val exact = hFp.filter(_._2 == fp).map(_._1).minOption
      val near = hFp.map { case (h, f) => (h, java.lang.Long.bitCount(fp ^ f)) }
        .filter { case (_, hd) => hd >= 1 && hd <= 3 }
        .sortBy { case (h, hd) => (hd, h) }.headOption
      assert(got(b) == ((exact, near.map(_._1), exact.isEmpty && near.isEmpty)),
        s"day-2 $b: ${got(b)} vs brute ($exact, $near)")
    }

    // the fingerprint table accumulates day over day and carries no
    // pixels — one 16-byte row per decodable image
    val fps = spark.read.parquet(s"$dir/fps")
    assert(fps.count() == (b0 ++ b1).size)
    assert(fps.columns.toSet == Set("id", "fp", BatchTable.BatchCol), fps.columns.mkString(","))
  }

  test("replay of a batch overwrites its own partitions and cannot self-dup") {
    val dir = tempDir("graft-imggate-replay")
    ImageDedupGate.gateAndIngest(recsOf(b0), s"$dir/fps", s"$dir/verdicts", batchId = 0L)
    ImageDedupGate.gateAndIngest(recsOf(b1), s"$dir/fps", s"$dir/verdicts", batchId = 1L)
    val first = verdictsOf(s"$dir/verdicts", 1L)
    // crash-replay of batch 1: its prior fingerprints are already in
    // the table, but the own-partition exclusion must keep 1283's
    // verdict pointing at history id 3, not at its own prior row
    ImageDedupGate.gateAndIngest(recsOf(b1), s"$dir/fps", s"$dir/verdicts", batchId = 1L)
    assert(verdictsOf(s"$dir/verdicts", 1L) == first)
    assert(first(1283L) == ((Some(3L), None, false)), first(1283L).toString)
    // no duplicate verdict rows after replay
    val n = spark.read.parquet(s"$dir/verdicts")
      .filter(org.apache.spark.sql.functions.col(BatchTable.BatchCol) === 1L).count()
    assert(n == b1.size, s"replay duplicated verdict rows: $n")
  }

  test("the same gate lifecycle is modality-generic: audio energy hash via the fingerprints hook") {
    import spark.implicits._
    def wavRecs(ids: Seq[Long]): Dataset[Multimodal.MediaRecord] =
      ids.toDS().map(id => Multimodal.MediaRecord(
        id, Multimodal.syntheticWav(id), Multimodal.MediaMeta("wav", 0, 0, 0L)))
    val dir = tempDir("graft-audiogate")
    val hist = Seq(1L, 2L, 5L, 100L)
    ImageDedupGate.gateAndIngest(wavRecs(hist), s"$dir/fps", s"$dir/verdicts",
      batchId = 0L, fingerprints = Multimodal.audioFingerprints(_))
    // batch 1: 257 = 1 + 256 is an exact audio dup of history id 1
    // (the energy hash depends on id only through 37·id mod 256); 3 is
    // judged by brute force below; an undecodable payload still owes a
    // verdict (is_new)
    val batch = wavRecs(Seq(257L, 3L)).union(Seq(Multimodal.MediaRecord(
      999L, "not audio".getBytes("UTF-8"), Multimodal.MediaMeta("bin", 0, 0, 0L))).toDS())
    ImageDedupGate.gateAndIngest(batch, s"$dir/fps", s"$dir/verdicts",
      batchId = 1L, fingerprints = Multimodal.audioFingerprints(_))
    val got = verdictsOf(s"$dir/verdicts", 1L)
    def afp(id: Long): Long =
      Multimodal.audioFingerprint64(Multimodal.syntheticWav(id)).get
    for (b <- Seq(257L, 3L)) {
      val exact = hist.filter(h => afp(h) == afp(b)).sorted.headOption
      val near = hist.map(h => (h, java.lang.Long.bitCount(afp(h) ^ afp(b))))
        .filter { case (_, hd) => hd >= 1 && hd <= 3 }
        .sortBy { case (h, hd) => (hd, h) }.headOption
      assert(got(b) == ((exact, near.map(_._1), exact.isEmpty && near.isEmpty)),
        s"audio verdict for $b: ${got(b)}")
    }
    assert(got(257L)._1.contains(1L), "exact audio dup tier never fired — weak fixture")
    assert(got(999L) == ((None, None, true)), s"undecodable: ${got(999L)}")
  }

  test("video frames ride the gate too: frame-level fingerprints through the same lifecycle") {
    import spark.implicits._
    def gifRecs(ids: Seq[Long]): Dataset[Multimodal.MediaRecord] =
      ids.toDS().map(id => Multimodal.MediaRecord(
        id, Multimodal.syntheticGif(id), Multimodal.MediaMeta("gif", 0, 0, 0L)))
    val frameFps: Dataset[Multimodal.MediaRecord] => org.apache.spark.sql.DataFrame =
      Multimodal.videoFrameFingerprints(_, every = 2)
    val dir = tempDir("graft-videogate")
    val hist = Seq(1L, 6L, 9L, 14L)
    ImageDedupGate.gateAndIngest(gifRecs(hist), s"$dir/fps", s"$dir/verdicts",
      batchId = 0L, fingerprints = frameFps)
    // 1281 shares sampled frame 0's hash with history id 1 (31·1280 ≡ 0
    // mod 256, same dims) — the exact tier must fire across batches
    val batch = Seq(1281L, 3L, 4L)
    ImageDedupGate.gateAndIngest(gifRecs(batch), s"$dir/fps", s"$dir/verdicts",
      batchId = 1L, fingerprints = frameFps)
    val got = verdictsOf(s"$dir/verdicts", 1L)
    def fpsOf(id: Long): Set[Long] =
      Multimodal.videoFrameHashes(Multimodal.syntheticGif(id)).get
        .zipWithIndex.collect { case (fp, k) if k % 2 == 0 => fp }.toSet
    for (b <- batch) {
      val exact = hist.filter(h => fpsOf(h).exists(fpsOf(b))).sorted.headOption
      val near = (for {
        h <- hist; x <- fpsOf(b); y <- fpsOf(h)
        hd = java.lang.Long.bitCount(x ^ y) if hd >= 1 && hd <= 3
      } yield (h, hd)).sortBy { case (h, hd) => (hd, h) }.headOption
      assert(got(b) == ((exact, near.map(_._1), exact.isEmpty && near.isEmpty)),
        s"video verdict for $b: ${got(b)} vs ($exact, ${near.map(_._1)})")
    }
    assert(got(1281L)._1.contains(1L), "exact frame-dup tier never fired — weak fixture")
  }

  test("committed-only guard: folding the latest live batch throws") {
    val dir = tempDir("graft-imggate-guard")
    ImageDedupGate.gateAndIngest(recsOf(b0), s"$dir/fps", s"$dir/verdicts", batchId = 0L)
    val e = intercept[IllegalArgumentException] {
      ImageDedupGate.compactFingerprints(spark, s"$dir/fps", upToBatch = 0L)
    }
    assert(e.getMessage.contains("latest live batch"), e.getMessage)
  }

  test("duplicate history rows (compaction crash-window) cannot change a verdict") {
    val dir = tempDir("graft-imggate-dup")
    ImageDedupGate.gateAndIngest(recsOf(b0), s"$dir/fps", s"$dir/verdicts", batchId = 0L)
    // simulate the crash-between-rename-and-delete window: batch 0's
    // rows present in BOTH the sentinel partition and their original
    val src = new java.io.File(s"$dir/fps/${BatchTable.BatchCol}=0")
    val dst = new java.io.File(s"$dir/fps/${BatchTable.BatchCol}=-1")
    dst.mkdirs()
    src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(dst, f.getName).toPath)
    }
    ImageDedupGate.gateAndIngest(recsOf(b1), s"$dir/fps", s"$dir/verdicts", batchId = 1L)
    val v = verdictsOf(s"$dir/verdicts", 1L)
    assert(v(1283L) == ((Some(3L), None, false)), v(1283L).toString)
    assert(v(6L)._3, v(6L).toString)
  }
}
