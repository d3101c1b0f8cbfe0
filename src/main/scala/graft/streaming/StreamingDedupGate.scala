package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Streaming ingest-time dedup gate — the day-N lifecycle of
  * [[Dedup.incrementalDupsFromSignatures]]: every arriving micro-batch
  * is (1) gated against the ACCUMULATED signature table (exact md5
  * tier + minhash near tier), its verdicts appended to a verdict log,
  * then (2) its own `(id, xhash, sig)` rows appended to the signature
  * table so the NEXT batch gates against it. History text is touched
  * exactly once — on the day it arrived, to build its signatures; every
  * later gate reads only the pruned signature columns (the
  * never-re-hash-history contract StreamingSpec pins by plan
  * inspection).
  *
  * Shape at 100 TB: the signature table is the only long-lived state
  * and it grows by one ~100-byte row per ingested document (not per
  * byte of text); each gate is two broadcast joins of the small batch
  * against a column-pruned history scan. The verdict log is
  * append-only, so replays under the streaming checkpoint re-gate a
  * batch idempotently only if the caller keys the verdict sink by
  * batch — the contract here matches the repo's other foreachBatch
  * sinks (AvailableNow + checkpoint ⇒ each batch lands once).
  */
object StreamingDedupGate {

  /** The foreachBatch body, usable directly in batch code too: gate
    * `batch` against the signature table at `sigDir` (absent/empty ⇒
    * everything is new — day 1), append verdicts to `verdictDir`, then
    * append the batch's signatures to `sigDir`. */
  def gateAndIngest(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      sigDir: String,
      verdictDir: String,
      threshold: Double = 0.5
  ): Unit = {
    val spark = batch.sparkSession
    // two consumers (gate + signature build) — hash the batch text once
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val verdicts =
        if (hasData(spark, sigDir))
          Dedup.incrementalDupsFromSignatures(
            spark.read.parquet(sigDir), b, idCol, textCol, threshold)
        else
          // day 1: no history — same schema, everything new
          b.select(col(idCol).as("doc_id"))
            .withColumn("exact_dup_id", lit(null).cast(LongType))
            .withColumn("near_dup_id", lit(null).cast(LongType))
            .withColumn("near_est", lit(null).cast(DoubleType))
            .withColumn("is_new", lit(true))
      verdicts.write.mode("append").parquet(verdictDir)
      Dedup.signatureTable(b, idCol, textCol)
        .write.mode("append").parquet(sigDir)
    } finally b.unpersist()
  }

  private def hasData(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s => s.getPath.getName.endsWith(".parquet"))
  }

  /** Wire the gate onto a stream: one [[gateAndIngest]] per
    * micro-batch, AvailableNow + checkpoint so each batch gates exactly
    * once across restarts (the day-2 restart IS the lifecycle under
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
      .foreachBatch { (b: DataFrame, _: Long) =>
        gateAndIngest(b, idCol, textCol, sigDir, verdictDir, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
