package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Streaming ingest-time dedup gate for EMBEDDINGS — the semantic-tier
  * sibling of [[StreamingDedupGate]], with
  * [[Dedup.incrementalEmbeddingDups]] as the per-batch body: every
  * arriving micro-batch of (id, vector) rows is (1) gated against the
  * ACCUMULATED vector store (exact = bit-identical vector, near =
  * query-directed multiprobe LSH candidates + cosine refine), its
  * verdicts written to a verdict log, then (2) its own (id, vector)
  * rows appended to the store so the NEXT batch gates against it.
  *
  * Unlike the text gate there is no separate signature materialization:
  * a 64-float vector IS its own signature input, and the LSH bucket /
  * probe keys are row-local codegen expressions — each gate re-derives
  * them in one column-pruned map pass over the store, which costs less
  * than persisting the 8-tables-exploded key rows would (8× store
  * inflation to save a row-local expression).
  *
  * REPLAY IDEMPOTENCY and the store lifecycle are [[BatchTable]]'s:
  * both sinks partition by the foreachBatch batchId with dynamic
  * overwrite, the gate reads the store EXCLUDING the replaying batch's
  * own partition, and [[compactStore]] folds committed batches into the
  * −1 partition without changing any verdict.
  *
  * The LSH shape is PINNED (not corpus-derived) — a persisted store
  * must gate every future batch under the geometry it was built with;
  * re-shaping means re-ingest (the [[Dedup.embeddingCosinePairsLsh]]
  * pinned-path contract).
  */
object EmbeddingDedupGate {

  /** Partition column keying both sinks by micro-batch. */
  val BatchCol: String = BatchTable.BatchCol

  /** The foreachBatch body, usable directly in batch code too: gate
    * `batch` against the vector store at `storeDir` (absent/empty ⇒
    * everything is new — day 1), write verdicts to `verdictDir`, then
    * append the batch's (id, vector) rows to the store — both keyed by
    * `batchId` so any replay overwrites rather than duplicates.
    */
  def gateAndIngest(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      storeDir: String,
      verdictDir: String,
      threshold: Double,
      // no default — see StreamingDedupGate.gateAndIngest: every
      // caller must key its batch or two calls overwrite each other
      batchId: Long,
      tables: Int = 8,
      bits: Int = 8,
      budget: Int = 3,
      depth: Int = 2,
      seed: Long = 42L,
      dim: Int = 64
  ): Unit = {
    val spark = batch.sparkSession
    // two consumers (gate + store append) — materialize the batch once
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val verdicts =
        if (BatchTable.hasData(spark, storeDir))
          Dedup.incrementalEmbeddingDups(
            BatchTable.readExcluding(spark, storeDir, batchId),
            b, idCol, vecCol, threshold, tables, bits, budget, depth, seed, dim)
        else
          // day 1: no history — same schema, everything new
          b.select(col(idCol).as("doc_id"))
            .withColumn("exact_dup_id", lit(null).cast(LongType))
            .withColumn("near_dup_id", lit(null).cast(LongType))
            .withColumn("near_cos", lit(null).cast(DoubleType))
            .withColumn("is_new", lit(true))
      BatchTable.writeBatchPartition(verdicts, batchId, verdictDir)
      BatchTable.writeBatchPartition(b.select(col(idCol), col(vecCol)), batchId, storeDir)
    } finally b.unpersist()
  }

  /** Fold committed store batches into the `__batch_id=-1` partition —
    * [[BatchTable.compact]]; must be invisible to every later verdict.
    */
  def compactStore(spark: SparkSession, storeDir: String, upToBatch: Long): Unit =
    BatchTable.compact(spark, storeDir, upToBatch)

  /** Wire the gate onto a stream: one [[gateAndIngest]] per
    * micro-batch, AvailableNow + checkpoint so each batch gates exactly
    * once across restarts; the engine-supplied batchId keys both sinks.
    */
  def start(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      storeDir: String,
      verdictDir: String,
      checkpointDir: String,
      threshold: Double
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        gateAndIngest(b, idCol, vecCol, storeDir, verdictDir, threshold, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
