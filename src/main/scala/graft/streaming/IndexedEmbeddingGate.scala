package graft.streaming

import graft.ext.Similarity
import graft.functions.{AnnExprs, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Embedding ingest gate over a PERSISTED signature index — the
  * at-scale sibling of [[EmbeddingDedupGate]], carrying the r18
  * build-once/probe-many lesson ([[graft.ext.AnnIndex]], measured in
  * SCALE_MEASURED_r18.json) into the streaming lifecycle.
  *
  * [[EmbeddingDedupGate]] re-derives the LSH bucket keys over the WHOLE
  * accumulated store on every micro-batch — tables × bits hyperplane
  * dot products per stored vector per batch (its class doc argues the
  * re-derivation is cheaper than persisting exploded keys, which is
  * true while the store is batch-sized). Once the store is
  * corpus-sized the trade inverts — the per-batch gate cost must be
  * probe-sized, not store-sized — so this gate persists the exploded
  * signature rows ONCE, at the ingest of the batch that created them:
  *
  *   - `storeDir/vectors`: (hid, hv) — every ingested vector once,
  *     zero-norm rows INCLUDED (the exact tier matches bit-identical
  *     vectors, and a zero vector can still exact-match).
  *   - `storeDir/sigs`: (hid, t, b) — the tables-fold SLIM key rows
  *     (~16 B each, the [[graft.ext.AnnIndex]] layout), zero-norm rows
  *     EXCLUDED (a zero vector never near-matches: its cosine is 0/0;
  *     dropping its keys at write time is verdict-identical to
  *     [[graft.ext.Dedup.incrementalEmbeddingDups]]'s norm filter at
  *     refine time).
  *
  * A gate is then: broadcast the batch's multiprobe keys → equi-join
  * the slim signature table → distinct (doc_id, hid) → rehydrate ONLY
  * surviving candidates from `vectors/` → cosine refine → top-1.
  * Cosine is deterministic per pair, so scoring after the distinct is
  * verdict-identical to the in-flight operator's score-then-distinct
  * (IndexedEmbeddingGateSpec pins frame equality against
  * [[EmbeddingDedupGate]] batch by batch). Per-batch work touching the
  * store: one 16 B/row column-pruned sigs scan (map-side, against a
  * broadcast) and a candidate-proportional vector rehydrate — no
  * store-wide hashing, no vector bytes through the key fold.
  *
  * MEASURED trade vs the (fixed) in-flight gate (EmbGateProbe at
  * 200 k / 1 M × 64-dim and 200 k × 1024-dim stores —
  * recordings/emb_gate_r18.jsonl): NOT the topK probes' 7.5× — the
  * gate has no hot-bucket census to amortize. At dim 64 the in-flight
  * gate wins (~11-13 s vs 15-19 s per 5 k batch at 1 M: one fused
  * map-side pass beats sigs-scan + candidate rehydrate when a sig row
  * costs as much as the 64-dim vector row it replaces); at 1024 dims
  * the two are within local-mode noise. This gate's structural edge —
  * fold bytes fixed at 16 B/row while the in-flight fold's payload
  * grows ∝ dim (32 × 8.2 KB/row at 1024 dims) — is a
  * scan/shuffle-bytes argument local NVMe hides; on a real cluster
  * pick by dim × batch size. (The probe's bigger catch was in the
  * in-flight operator itself: its pre-fix probe fold broadcast the
  * batch VECTORS through the tables × keys expansion and died on
  * maxResultSize at 1024 dims — see Dedup.incrementalEmbeddingDups.)
  *
  * Both sinks and the two store tables run [[BatchTable]]'s lifecycle:
  * partitioned by the foreachBatch batchId with dynamic overwrite
  * (replay overwrites, never duplicates), history reads exclude the
  * replaying batch's own partition, and [[compactStore]] folds
  * committed batches of BOTH tables into the −1 partition without
  * moving a verdict. The LSH shape is PINNED (not corpus-derived): the
  * persisted keys ARE the geometry, so re-shaping means re-ingest —
  * the same contract as the in-flight gate, now load-bearing on disk.
  */
object IndexedEmbeddingGate {

  /** Partition column keying all four tables by micro-batch. */
  val BatchCol: String = BatchTable.BatchCol

  /** The geometry a store's persisted signature rows pin: planes are a
    * pure function of (tables, bits, seed, dim), and probe keys of
    * those plus (budget, depth). Persisted once at the first ingest
    * under `storeDir/shape`; every later gate FAILS FAST on a
    * mismatch — silently probing an 8x8 store with 16x12 keys would
    * produce wrong near-dup candidates with no error (r18 advice).
    */
  final case class GateShape(tables: Int, bits: Int, budget: Int,
      depth: Int, seed: Long, dim: Int)

  private def shapePath(storeDir: String) = s"$storeDir/shape"

  private def writeShape(spark: SparkSession, storeDir: String, s: GateShape): Unit = {
    // temp-then-rename, like the AnnIndex manifest: a crash mid-write
    // must leave either no shape file or a complete one — a torn file
    // here would make every later gate fail unreadably instead of
    // pinning (r19 advice). Format: the AnnIndex key=value manifest
    // style — the shape is six scalars of metadata, and the 1-row
    // parquet it replaces cost a Spark job to write and one per GATE
    // CALL to read (driver fixed cost, guide §5; r22).
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(storeDir))
    val tmp = new org.apache.hadoop.fs.Path(s"${shapePath(storeDir)}.tmp")
    fs.delete(tmp, true)
    val out = fs.create(tmp, true)
    try out.write(
      (s"tables=${s.tables}\nbits=${s.bits}\nbudget=${s.budget}\n" +
        s"depth=${s.depth}\nseed=${s.seed}\ndim=${s.dim}\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(shapePath(storeDir))),
      s"shape pin rename failed: $tmp -> ${shapePath(storeDir)}")
  }

  /** The pinned shape of an existing store, if one was ever ingested.
    * Reads the key=value shape file; a shape DIRECTORY is the pre-r22
    * 1-row parquet layout, still honored so existing stores keep their
    * pin across the format change. */
  def readShape(spark: SparkSession, storeDir: String): Option[GateShape] = {
    val p = new org.apache.hadoop.fs.Path(shapePath(storeDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else if (fs.getFileStatus(p).isDirectory)
      spark.read.parquet(shapePath(storeDir)).collect().headOption.map(r =>
        GateShape(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getInt(5)))
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      val kv = txt.split("\n").iterator.filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
      Some(GateShape(kv("tables").toInt, kv("bits").toInt, kv("budget").toInt,
        kv("depth").toInt, kv("seed").toLong, kv("dim").toInt))
    }
  }

  private def pinOrCheckShape(spark: SparkSession, storeDir: String,
      s: GateShape): Unit =
    readShape(spark, storeDir) match {
      case Some(pinned) =>
        require(pinned == s,
          s"IndexedEmbeddingGate store at $storeDir pins shape $pinned " +
            s"but this gate was called with $s — the persisted signature " +
            "rows ARE the geometry; re-shaping means re-ingest")
      case None =>
        // a NON-EMPTY store with no shape file predates shape pinning
        // (or lost its pin): writing whatever shape THIS gate happens
        // to be called with would silently legitimize a mismatched
        // geometry — exactly the bug pinning exists to stop. Refuse;
        // pinning is only safe at first ingest (r19 advice).
        require(!BatchTable.hasData(spark, s"$storeDir/sigs"),
          s"IndexedEmbeddingGate store at $storeDir has ingested " +
            "signature rows but no pinned shape (pre-pinning store or " +
            "lost pin) — refusing to pin a geometry after the fact. " +
            "Re-ingest the store, or restore the original shape file " +
            "if the geometry is known.")
        writeShape(spark, storeDir, s)
    }

  /** The foreachBatch body, usable directly in batch code: gate
    * `batch` against the persisted signature index at `storeDir`
    * (absent/empty ⇒ everything is new — day 1), write verdicts to
    * `verdictDir`, then append the batch's slim signature rows and
    * vectors so the NEXT batch probes them. Verdicts are
    * frame-identical to [[EmbeddingDedupGate.gateAndIngest]] under the
    * same pinned shape.
    */
  def gateAndIngest(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      storeDir: String,
      verdictDir: String,
      threshold: Double,
      // no default — every caller must key its batch (see
      // StreamingDedupGate.gateAndIngest)
      batchId: Long,
      tables: Int = 8,
      bits: Int = 8,
      budget: Int = 3,
      depth: Int = 2,
      seed: Long = 42L,
      dim: Int = 64
  ): Unit = {
    import graft.functions.DotProductExpr.dot
    val spark = batch.sparkSession
    // first ingest pins the shape on disk; every later gate (including
    // one routed through start()) fails fast on a mismatch
    pinOrCheckShape(spark, storeDir, GateShape(tables, bits, budget, depth, seed, dim))
    val planes = Similarity.hyperplanesPrefix(tables, bits, dim, seed)
    // cast ONCE at ingest: the store holds array<double> so no later
    // batch re-casts history (float->double is exact, so the exact
    // tier's array equality is unchanged); persisted: the batch feeds
    // the gate AND both store appends
    val b = batch.select(col(idCol).as("doc_id"), col(vecCol).cast("array<double>").as("bv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val verdicts =
        if (BatchTable.hasData(spark, s"$storeDir/vectors")) {
          val hVec = BatchTable.readExcluding(spark, s"$storeDir/vectors", batchId)
          val hSigs = BatchTable.readExcluding(spark, s"$storeDir/sigs", batchId)
          // EXACT tier: bit-identical vector, min earlier id (duplicate
          // store rows from a compaction crash-window can't change a min)
          val exactM = hVec.join(broadcast(b), col("hv") === col("bv"))
            .groupBy("doc_id").agg(min("hid").as("exact_dup_id"))
          // NEAR tier, probe side: the batch's query-directed multiprobe
          // keys, SLIM (no vectors through the fold), broadcast; a
          // zero-norm batch vector never near-matches, so its probe rows
          // are dropped here rather than at refine — verdict-identical
          val bKeys = b.filter(VectorOps.norm(col("bv")) > 0)
            .select(col("doc_id"),
              posexplode(AnnExprs.lshProbeKeys(col("bv"), planes, budget, depth))
                .as(Seq("t", "bs")))
            .select(col("doc_id"), col("t"), explode(col("bs")).as("b"))
          // one map-side pass over the 16 B/row signature table — the
          // store-sized hashing EmbeddingDedupGate re-pays per batch is
          // already on disk
          val cand = hSigs.join(broadcast(bKeys), Seq("t", "b"))
            .select("doc_id", "hid").distinct()
          // rehydrate ONLY surviving candidates; deterministic per-pair
          // cosine makes score-after-distinct == score-then-distinct.
          // UNHINTED: when the candidate set fits a broadcast (the
          // common small-batch case) AQE keeps the store map-side; a
          // forced shuffle_hash measured a full store exchange on
          // every batch (EmbGateProbe, 1M store)
          val scored = cand
            .join(hVec, Seq("hid"))
            .join(broadcast(b), Seq("doc_id"))
            .withColumn("bn", sqrt(dot(col("bv"), col("bv"))))
            .withColumn("hn", sqrt(dot(col("hv"), col("hv"))))
            // zero-norm guard kept even though sigs exclude such rows:
            // 0/0 = NaN and NaN >= tau is TRUE under Spark's ordering
            .filter(col("bn") > 0 && col("hn") > 0)
            .withColumn("cos", round(dot(col("bv"), col("hv")) / (col("bn") * col("hn")), 4))
            .filter(col("cos") >= threshold)
            .select("doc_id", "hid", "cos")
          val w = Window.partitionBy("doc_id").orderBy(col("cos").desc, col("hid").asc)
          val best = scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
            .select(col("doc_id"), col("hid").as("near_dup_id"), col("cos").as("near_cos"))
          b.select("doc_id")
            .join(broadcast(exactM), Seq("doc_id"), "left")
            .join(broadcast(best), Seq("doc_id"), "left")
            .withColumn("is_new", col("exact_dup_id").isNull && col("near_dup_id").isNull)
        } else
          // day 1: no history — same schema, everything new
          b.select(col("doc_id"))
            .withColumn("exact_dup_id", lit(null).cast(LongType))
            .withColumn("near_dup_id", lit(null).cast(LongType))
            .withColumn("near_cos", lit(null).cast(DoubleType))
            .withColumn("is_new", lit(true))
      BatchTable.writeBatchPartition(verdicts, batchId, verdictDir)
      BatchTable.writeBatchPartition(
        b.select(col("doc_id").as("hid"), col("bv").as("hv")),
        batchId, s"$storeDir/vectors")
      BatchTable.writeBatchPartition(
        b.filter(VectorOps.norm(col("bv")) > 0)
          .select(col("doc_id").as("hid"),
            posexplode(AnnExprs.lshBuckets(col("bv"), planes)).as(Seq("t", "b"))),
        batchId, s"$storeDir/sigs")
    } finally b.unpersist()
  }

  /** Fold committed batches of BOTH store tables into the −1 partition
    * ([[BatchTable.compact]]); must be invisible to every later verdict
    * (spec-asserted).
    */
  def compactStore(spark: SparkSession, storeDir: String, upToBatch: Long): Unit = {
    BatchTable.compact(spark, s"$storeDir/vectors", upToBatch)
    BatchTable.compact(spark, s"$storeDir/sigs", upToBatch)
  }

  /** Wire the gate onto a stream: one [[gateAndIngest]] per
    * micro-batch, AvailableNow + checkpoint so each batch gates exactly
    * once across restarts; the engine-supplied batchId keys all sinks.
    * Shape parameters thread through to [[gateAndIngest]] (r18 advice:
    * a hard-wired default here silently mixed geometries with a store
    * built at a non-default shape — now the store's pinned shape also
    * fails the first mismatched batch fast).
    */
  def start(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      storeDir: String,
      verdictDir: String,
      checkpointDir: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 8,
      budget: Int = 3,
      depth: Int = 2,
      seed: Long = 42L,
      dim: Int = 64
  ): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        gateAndIngest(b, idCol, vecCol, storeDir, verdictDir, threshold, batchId,
          tables, bits, budget, depth, seed, dim)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
