package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Streaming ingest-time dedup gate — the day-N lifecycle of
  * [[Dedup.incrementalDupsFromSignatures]]: every arriving micro-batch
  * is (1) gated against the ACCUMULATED signature table (exact md5
  * tier + minhash near tier), its verdicts written to a verdict log,
  * then (2) its own `(id, xhash, sig)` rows written to the signature
  * table so the NEXT batch gates against it. History text is touched
  * exactly once — on the day it arrived, to build its signatures; every
  * later gate reads only the pruned signature columns (the
  * never-re-hash-history contract StreamingSpec pins by plan
  * inspection).
  *
  * REPLAY IDEMPOTENCY: both sinks are partitioned by the foreachBatch
  * `batchId` and written with DYNAMIC partition overwrite, so a batch
  * replayed after a crash (including a crash BETWEEN the two writes)
  * overwrites its own partitions instead of appending duplicates. The
  * gate reads history EXCLUDING the replaying batch's own partition
  * (partition-pruned), so a half-written prior attempt can never mark
  * a batch's docs as duplicates of themselves.
  *
  * Shape at 100 TB: the signature table is the only long-lived state
  * and it grows by one ~100-byte row per ingested document (not per
  * byte of text); each gate is two broadcast joins of the small batch
  * against a column-pruned history scan. One partition directory per
  * micro-batch is the same layout every append-only ingest log uses;
  * compaction of old batches ([[graft.operators.Bucketing]]) folds
  * them into date-grain partitions without changing the contract.
  */
object StreamingDedupGate {

  /** Partition column keying both sinks by micro-batch. */
  val BatchCol = "__batch_id"

  /** Partition value holding compacted history ([[compactSignatures]]).
    * foreachBatch ids are non-negative, so −1 never collides with a
    * live batch and is never excluded by a replay's own-partition
    * filter. */
  val CompactedBatch = -1L

  /** The foreachBatch body, usable directly in batch code too: gate
    * `batch` against the signature table at `sigDir` (absent/empty ⇒
    * everything is new — day 1), write verdicts to `verdictDir`, then
    * write the batch's signatures to `sigDir` — both keyed by
    * `batchId` so any replay overwrites rather than duplicates. */
  def gateAndIngest(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      sigDir: String,
      verdictDir: String,
      threshold: Double = 0.5,
      // no default: two direct batch-mode calls that both omitted an id
      // would silently overwrite each other's partitions — day-1 history
      // destroyed instead of appended. Every caller must key its batch.
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    // two consumers (gate + signature build) — hash the batch text once
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val verdicts =
        if (hasData(spark, sigDir))
          Dedup.incrementalDupsFromSignatures(
            // exclude this batch's own partition: on replay the prior
            // attempt's signatures must not gate the batch against
            // itself (partition filter — prunes, never scans)
            spark.read.parquet(sigDir)
              .filter(col(BatchCol) =!= batchId).drop(BatchCol),
            b, idCol, textCol, threshold)
        else
          // day 1: no history — same schema, everything new
          b.select(col(idCol).as("doc_id"))
            .withColumn("exact_dup_id", lit(null).cast(LongType))
            .withColumn("near_dup_id", lit(null).cast(LongType))
            .withColumn("near_est", lit(null).cast(DoubleType))
            .withColumn("is_new", lit(true))
      writeBatchPartition(verdicts, batchId, verdictDir)
      writeBatchPartition(Dedup.signatureTable(b, idCol, textCol), batchId, sigDir)
    } finally b.unpersist()
  }

  /** Idempotent per-batch write: dynamic overwrite replaces ONLY the
    * `__batch_id=N` partition being written, leaving other batches'
    * partitions untouched. */
  private def writeBatchPartition(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn(BatchCol, lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol)
      .parquet(dir)

  /** Maintenance pass: fold the per-batch signature partitions for
    * batches `0..upToBatch` (plus any prior compaction) into the single
    * `__batch_id=-1` partition — the small-files compaction an
    * always-on ingest needs so the history side stays a few large
    * column-pruned files instead of one directory per micro-batch.
    *
    * Safety: the folded rows are staged to a dot-prefixed temp dir
    * (invisible to partition discovery), renamed into place, and only
    * then are the source partitions deleted. A crash between rename
    * and deletes leaves some signatures present TWICE — which the gate
    * tolerates by construction: both its tiers aggregate `min(hid)`
    * over matches, so duplicate history rows cannot change a verdict
    * (spec-asserted). Re-running compaction converges.
    *
    * Committed-only rule, ENFORCED: folding a batch the checkpoint has
    * not committed would move its signatures into `__batch_id=-1`,
    * where a replay's own-partition filter (`=!= batchId`) no longer
    * excludes them — the replayed batch would gate against its own
    * prior signatures and mark every doc an exact dup of itself. The
    * only batch AvailableNow can replay is the LATEST one present, so
    * the cheap sufficient guard is `upToBatch < max live batch id in
    * sigDir`; violations throw rather than corrupt.
    */
  def compactSignatures(spark: SparkSession, sigDir: String, upToBatch: Long): Unit = {
    val base = new org.apache.hadoop.fs.Path(sigDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    val present = fs.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith(s"$BatchCol="))
      .map(n => n.substring(BatchCol.length + 1).toLong)
    val live = present.filter(_ >= 0)
    if (live.nonEmpty && upToBatch >= live.max)
      throw new IllegalArgumentException(
        s"compactSignatures(upToBatch=$upToBatch) would fold the latest live batch " +
          s"(${live.max}), which a checkpoint replay may re-run; " +
          // live.max-1 would read "-1" when only batch 0 exists —
          // colliding with the CompactedBatch sentinel, so say it plainly
          (if (live.max == 0)
             "nothing is safely compactable yet — gate the next batch first"
           else s"compact only up to ${live.max - 1} (or gate the next batch first)"))
    val foldable = present
      .filter(b => b == CompactedBatch || (b >= 0 && b <= upToBatch))
    if (foldable.isEmpty) return
    val tmp = new org.apache.hadoop.fs.Path(base, ".compact_tmp")
    fs.delete(tmp, true) // stale temp from a crashed prior run
    // one deduplicated rewrite of the folded partitions (distinct makes
    // a crash-before-delete leftover self-healing on the next run); the
    // partition column comes from the directory name, so the staged
    // files carry only the data columns
    spark.read.parquet(foldable.map(b => s"$sigDir/$BatchCol=$b"): _*)
      .distinct()
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 8))
      .write.mode("overwrite").parquet(tmp.toString)
    // drop the _SUCCESS marker so the renamed dir is pure data files
    fs.delete(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), false)
    val dest = new org.apache.hadoop.fs.Path(base, s"$BatchCol=$CompactedBatch")
    fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"compaction rename failed: $tmp -> $dest")
    foldable.filter(_ != CompactedBatch).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"$BatchCol=$b"), true)
    }
  }

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mirror Spark's hidden-file rule during the walk: parquet files
    // under '.'/'_' paths (e.g. a crashed compaction's .compact_tmp)
    // are invisible to spark.read.parquet, so they must not make
    // hasData report history that the partitioned read won't see —
    // and pruning those subtrees also keeps the walk short. Spark's
    // rule (InMemoryFileIndex.shouldFilterOutPathName) EXEMPTS
    // '_'-prefixed names containing '=' — exactly this sink's own
    // `__batch_id=N` partition directories, which must stay visible
    // or every batch would take the "day 1: no history" branch
    def hidden(name: String) =
      name.startsWith(".") || (name.startsWith("_") && !name.contains("="))
    def walk(path: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(path).exists { st =>
        if (hidden(st.getPath.getName)) false
        else if (st.isDirectory) walk(st.getPath)
        else st.getPath.getName.endsWith(".parquet")
      }
    fs.exists(p) && walk(p)
  }

  /** Wire the gate onto a stream: one [[gateAndIngest]] per
    * micro-batch, AvailableNow + checkpoint so each batch gates exactly
    * once across restarts, and the engine-supplied batchId keys both
    * sinks so a crash-replay of an incomplete batch is an overwrite,
    * not a duplicate (the day-2 restart IS the lifecycle under
    * test). */
  def start(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      sigDir: String,
      verdictDir: String,
      checkpointDir: String,
      threshold: Double = 0.5
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        gateAndIngest(b, idCol, textCol, sigDir, verdictDir, threshold, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
