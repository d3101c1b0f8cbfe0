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

  /** Partition column keying both sinks by micro-batch (shared
    * lifecycle component — see [[BatchTable]]). */
  val BatchCol: String = BatchTable.BatchCol

  /** Partition value holding compacted history ([[compactSignatures]]).
    * foreachBatch ids are non-negative, so −1 never collides with a
    * live batch and is never excluded by a replay's own-partition
    * filter. */
  val CompactedBatch: Long = BatchTable.CompactedBatch

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
        if (BatchTable.hasData(spark, sigDir))
          Dedup.incrementalDupsFromSignatures(
            // exclude this batch's own partition: on replay the prior
            // attempt's signatures must not gate the batch against
            // itself (partition filter — prunes, never scans)
            BatchTable.readExcluding(spark, sigDir, batchId),
            b, idCol, textCol, threshold)
        else
          // day 1: no history — same schema, everything new
          b.select(col(idCol).as("doc_id"))
            .withColumn("exact_dup_id", lit(null).cast(LongType))
            .withColumn("near_dup_id", lit(null).cast(LongType))
            .withColumn("near_est", lit(null).cast(DoubleType))
            .withColumn("is_new", lit(true))
      BatchTable.writeBatchPartition(verdicts, batchId, verdictDir)
      BatchTable.writeBatchPartition(Dedup.signatureTable(b, idCol, textCol), batchId, sigDir)
    } finally b.unpersist()
  }

  /** Fold committed signature batches into the `__batch_id=-1`
    * partition — [[BatchTable.compact]] (shared with the image gate);
    * see that scaladoc for the staging/rename safety story and the
    * enforced committed-only rule. */
  def compactSignatures(spark: SparkSession, sigDir: String, upToBatch: Long): Unit =
    BatchTable.compact(spark, sigDir, upToBatch)

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
