package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch cost probe for the two embedding ingest gates — the r18
  * question carried from the ANN indexes to the STREAMING lifecycle:
  * once the accumulated store is corpus-sized, how much of a
  * micro-batch's gate cost is store-side work
  * ([[graft.streaming.EmbeddingDedupGate]] re-derives the LSH keys
  * over the whole store every batch) vs the probe-sized cost the
  * persisted-signature gate ([[graft.streaming.IndexedEmbeddingGate]])
  * pays?
  *
  * Protocol: day-0 ingests the corpus minus the probe batches through
  * each gate (timed separately — that is the indexed gate's one-time
  * signature-materialization cost), then `nBatches` daily-sized
  * batches gate one after another through BOTH gates under the SAME
  * derived production shape (adaptiveLshBits / multiprobeTables /
  * multiprobeBudget / multiprobeDepth of the store size — the pinned
  * 8×8 default is a fixture shape; a store this size would have been
  * built with its derived geometry). Each batch's verdicts are
  * compared frame-exactly between the gates (`identical` bit — the
  * probe re-records IndexedEmbeddingGateSpec's identity pin at corpus
  * scale).
  *
  * Usage: runMain graft.EmbGateProbe <sfDir|synth:N:D> [batchRows=5000] [nBatches=3]
  *
  * `synth:N:D` swaps the corpus for N deterministic D-dim vectors
  * (every 10th row a perturbation of the row 9 before it, so near-dup
  * verdicts stay non-vacuous) — the HIGH-DIM regime the 64-dim
  * testdata cannot reach: production text embeddings are 768-4096
  * dims, where a slim sig row (tables × 16 B) is 1-2 orders below the
  * vector row it replaces and the two gates should finally separate.
  */
object EmbGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batchRows = args.drop(1).headOption.map(_.toLong).getOrElse(5000L)
    val nBatches = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup
    import graft.streaming.{BatchTable, EmbeddingDedupGate, IndexedEmbeddingGate}

    def fmt(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // a gate that cannot run the point at all (the r18 high-dim
    // finding: the pre-fix in-flight gate's vector-carrying probe fold
    // died on maxResultSize at 1024 dims) records -1, not a crash
    def timedSafe(f: => Unit): Double =
      try timed(f)._2 catch {
        case e: Throwable =>
          System.err.println(s"[emb-gate-probe] gate failed: ${e.getMessage}")
          -1.0
      }

    val synth = "^synth:(\\d+):(\\d+)$".r
    val (emb, dimUsed) = dir match {
      case synth(nStr, dStr) =>
        val nn = nStr.toLong; val d = dStr.toInt
        // deterministic pseudo-random components via murmur3 hash —
        // NOT sin(linear arg): correlated margins concentrate LSH
        // buckets and the probe measures the fixture's skew, not the
        // gate (the multimodal cal-fixture lesson). Every 10th row of
        // the TOP half perturbs its bottom-half mirror, so tail
        // batches carry genuine near-dups of STORED rows (a same-batch
        // near never fires — the gate excludes its own partition).
        // Timing fixture only, not an oracle surface.
        def comps(idExpr: String) = s"transform(sequence(1, $d), " +
          s"i -> cast((hash($idExpr, i) % 1000) / 1000.0 as float))"
        val base = spark.range(nn).select(col("id").as("vec_id"),
          expr(comps("vec_id")).as("embedding"))
        val half = nn / 2
        val near = expr(s"transform(sequence(1, $d), " +
          s"i -> cast((hash(vec_id - $half, i) % 1000) / 1000.0 + 0.001 * cos(i) as float))")
        (base.withColumn("embedding",
          when(col("vec_id") % 10 === 9 && col("vec_id") >= half, near)
            .otherwise(col("embedding"))), d)
      case _ => (Tables.embeddings(spark, dir), 64)
    }
    val n = emb.count()
    // vec_ids are NOT contiguous in the replicated corpora — rank the
    // ids once so the day-0/batch split is by position, not value
    val ids = emb.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    // fail loud instead of clamping: a clamp would overlap the day-0
    // ingest with batch 1 on the same rows and double-ingest them
    // (r18 advice)
    require(n > batchRows.toLong * nBatches,
      s"corpus n=$n must exceed batchRows*nBatches=${batchRows.toLong * nBatches}")
    val day0Max = ids((n - batchRows * nBatches - 1).toInt)
    def batchCut(i: Int): (Long, Long) = {
      val lo = (n - batchRows * (nBatches - i)).toInt
      val hi = (n - batchRows * (nBatches - i - 1) - 1).toInt
      (ids(lo), ids(hi))
    }

    val bits = Dedup.adaptiveLshBits(n)
    val tables = Dedup.multiprobeTables(bits)
    val budget = Dedup.multiprobeBudget(bits)
    val depth = Dedup.multiprobeDepth(bits)
    val threshold = 0.45
    println(s"""{"probe":"emb_gate_shape","dir":"$dir","n":$n,""" +
      s""""shape":"${tables}t x ${bits}b qd:$budget:$depth","dim":$dimUsed,"batch_rows":$batchRows,""" +
      s""""n_batches":$nBatches}""")

    val root = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_emb_gate_probe").getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val inflight = s"$root/inflight"; val indexed = s"$root/indexed"
    val day0 = emb.filter(col("vec_id") <= day0Max)

    // day-0 ingest: the in-flight gate stores vectors only; the indexed
    // gate ALSO materializes the tables-fold slim signature rows — the
    // build-once cost every later batch amortizes
    val (_, d0In) = timed(EmbeddingDedupGate.gateAndIngest(
      day0, "vec_id", "embedding", s"$inflight/store", s"$inflight/verdicts",
      threshold, batchId = 0L, tables = tables, bits = bits,
      budget = budget, depth = depth, dim = dimUsed))
    val (_, d0Ix) = timed(IndexedEmbeddingGate.gateAndIngest(
      day0, "vec_id", "embedding", s"$indexed/store", s"$indexed/verdicts",
      threshold, batchId = 0L, tables = tables, bits = bits,
      budget = budget, depth = depth, dim = dimUsed))
    println(s"""{"probe":"emb_gate_day0","dir":"$dir","store_rows":${n - batchRows * nBatches},""" +
      s""""inflight_secs":${fmt(d0In)},"indexed_secs":${fmt(d0Ix)}}""")

    val verdictCols = Seq("doc_id", "exact_dup_id", "near_dup_id", "near_cos", "is_new")
    for (i <- 0 until nBatches) {
      val (lo, hi) = batchCut(i)
      val batch = emb.filter(col("vec_id") >= lo && col("vec_id") <= hi)
      val bid = i + 1L
      val tIn = timedSafe(EmbeddingDedupGate.gateAndIngest(
        batch, "vec_id", "embedding", s"$inflight/store", s"$inflight/verdicts",
        threshold, batchId = bid, tables = tables, bits = bits,
        budget = budget, depth = depth, dim = dimUsed))
      val tIx = timedSafe(IndexedEmbeddingGate.gateAndIngest(
        batch, "vec_id", "embedding", s"$indexed/store", s"$indexed/verdicts",
        threshold, batchId = bid, tables = tables, bits = bits,
        budget = budget, depth = depth, dim = dimUsed))
      def v(base: String) = spark.read.parquet(s"$base/verdicts")
        .filter(col(BatchTable.BatchCol) === bid)
        .select(verdictCols.map(col): _*)
      val diff =
        if (tIn < 0 || tIx < 0) -1L
        else v(inflight).exceptAll(v(indexed)).count() +
          v(indexed).exceptAll(v(inflight)).count()
      val dups = if (tIx < 0) -1L else v(indexed).filter(!col("is_new")).count()
      println(s"""{"probe":"emb_gate_batch","dir":"$dir","batch":$bid,""" +
        s""""rows":${batch.count()},"inflight_secs":${fmt(tIn)},""" +
        s""""indexed_secs":${fmt(tIx)},"dup_verdicts":$dups,"identical":${diff == 0}}""")
    }
    spark.stop()
  }
}
