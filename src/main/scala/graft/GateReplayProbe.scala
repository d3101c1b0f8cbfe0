package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase-timed replay of the media dedup gate
  * ([[graft.streaming.ImageDedupGate]]): the same 3-batch split as the
  * registered `multimodal_image_gate_replay` query, but with the
  * gate-join phase (decode + exact/near tiers, forced via persist +
  * count) timed SEPARATELY from the two sink writes (verdict log +
  * fingerprint append) — the question a capacity planner actually
  * asks of an ingest gate: how much of a batch's wall-clock is the
  * dedup decision vs the parquet IO that any ingest pays anyway.
  *
  * Body mirrors [[graft.streaming.ImageDedupGate.gateAndIngest]]
  * phase-for-phase (kept in sync by StreamingImageGateSpec's verdict
  * equivalence; the probe exists because the production body runs both
  * phases inside one call and timing them requires a barrier between).
  *
  * Usage: runMain graft.GateReplayProbe <sfDir> [reps=3] [fixture=plain|cal]
  *
  * fixture=cal swaps in the scale-calibrated clique payloads
  * ([[graft.ext.Multimodal.syntheticPngCal]]) — the plain fixture has
  * only 200 distinct fingerprints at ANY corpus size (doc_id mod 1280
  * periodicity), so its gate candidate volume grows with history ×
  * clique-density and the 100× point measures the fixture, not the
  * gate (measured: 517 s gate phase at 500 k docs). The calibrated
  * payloads hold clique size at ≤ 4, so the curve measures the
  * banded batch × history join itself.
  */
object GateReplayProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cal = args.drop(2).headOption.contains("cal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ext.Multimodal
    import graft.streaming.BatchTable

    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    def sec(ns: Long): Double = ns / 1e9

    val samples = (1 to reps).map { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_gate_probe").toString
      val fpDir = s"$root/fps"; val verdictDir = s"$root/verdicts"
      var gateNs = 0L; var writeNs = 0L
      for (b <- 0L to 2L) {
        val batch = docs.filter(col("doc_id") % 3 === b)
          .select(col("doc_id").cast("long")).as[Long]
          .repartition(spark.sparkContext.defaultParallelism)
          .map(id => Multimodal.MediaRecord(id,
            if (cal) Multimodal.syntheticPngCal(id) else Multimodal.syntheticPng(id),
            Multimodal.MediaMeta("png", 0, 0, 0L)))
        val t0 = System.nanoTime()
        val bFps = Multimodal.imageFingerprints(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val verdicts = (
          if (BatchTable.hasData(spark, fpDir))
            Multimodal.incrementalImageDupsFromFps(
              BatchTable.readExcluding(spark, fpDir, b),
              batch.toDF().select(col("id")), bFps, maxHamming = 3)
          else
            batch.toDF().select(col("id").as("doc_id"))
              .withColumn("exact_dup_id", lit(null).cast(LongType))
              .withColumn("near_dup_id", lit(null).cast(LongType))
              .withColumn("near_hamming", lit(null).cast(LongType))
              .withColumn("is_new", lit(true))
          ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        verdicts.count() // barrier: decode + gate joins all run here
        // batch 0's empty-history branch never reads bFps, which would
        // defer its PNG decode into writeBatchPartition and mis-charge
        // it to write_sec — force it so decode always lands in the gate
        // phase the barrier comment promises
        bFps.count()
        gateNs += System.nanoTime() - t0
        val t1 = System.nanoTime()
        BatchTable.writeBatchPartition(verdicts, b, verdictDir)
        BatchTable.writeBatchPartition(bFps, b, fpDir)
        writeNs += System.nanoTime() - t1
        verdicts.unpersist(); bFps.unpersist()
      }
      val t2 = System.nanoTime()
      graft.streaming.ImageDedupGate.compactFingerprints(spark, fpDir, upToBatch = 0L)
      val compactNs = System.nanoTime() - t2
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      (sec(gateNs), sec(writeNs), sec(compactNs))
    }
    val best = samples.minBy(s => s._1 + s._2 + s._3)
    val fixture = if (cal) "cal" else "plain"
    println(f"""{"probe":"gate_replay","dir":"$dir","fixture":"$fixture","docs":$nDocs,"reps":$reps,"gate_sec":${best._1}%.2f,"write_sec":${best._2}%.2f,"compact_sec":${best._3}%.2f,"total_sec":${best._1 + best._2 + best._3}%.2f}""")
    spark.stop()
  }
}
