package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based bitext candidate mining (Artetxe & Schwenk, ACL 2019
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings" — the LASER/CCMatrix recipe): a cross-corpus pair
  * (src, tgt) is a translation candidate when its cosine stands out
  * FROM EACH SIDE'S NEIGHBORHOOD, not merely when it is high — raw
  * cosine thresholds fail under hubness (some vectors are near
  * everything). The ratio margin rescales each pair's cosine by the
  * mean cosine of both endpoints' k nearest neighbors:
  *
  *   margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
  *
  * and pairs with margin > ~1 (better than both neighborhoods'
  * average) are mined, best-first.
  *
  * Spark shape: two ranked top-k lists (forward src→tgt, backward
  * tgt→src) are the ONLY corpus-scale work — here the exact
  * [[Similarity.bruteTopK]] so the DuckDB oracle can replay every
  * rank; at 100 TB swap the list maker for any approximate tier
  * ([[Similarity.lshTopK]], or a persisted [[AnnIndex]] probe) via
  * [[marginFromLists]], which takes the lists as data. Everything
  * after the lists is rank-scale, not corpus-scale: two k-row-per-
  * anchor aggregates (the neighborhood sums), one join of the forward
  * pairs onto the two sum tables, and a row-local integer margin.
  *
  * Determinism contract: cosines are the family's 4-decimal rounding,
  * discretized to integer e4 units row-locally; neighborhood sums are
  * then EXACT integer sums (order-independent under any partitioning)
  * and the margin is one integer multiply-divide —
  * `margin_micro = 2·cos_e4·cntA·cntB·10⁶ div (sumA·cntB + sumB·cntA)`
  * (the cnt cross-multiplication is the avg-of-avgs in integer space;
  * cnt < k at the corpus edge must divide exactly like the oracle).
  * No libm, no float accumulation — the driver hashes bit-exact.
  *
  * Side ids must be disjoint across the two corpora (the usual
  * cross-lingual setting; [[Similarity.bruteTopK]]'s self-pair
  * exclusion compares ids, so a collision would silently drop a
  * legitimate cross-side pair).
  */
object Bitext {

  /** Mine margin-scored candidates with exact top-k lists (oracle
    * path). Returns one row per forward top-k pair passing
    * `minMarginMicro`: (src_id, tgt_id, cos_e4, margin_micro),
    * strongest margin first per src. k is the neighborhood size (the
    * paper uses 4).
    */
  def marginMine(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      minMarginMicro: Long = 1000000L
  ): DataFrame = {
    val fwd = Similarity.bruteTopK(tgt, src, idCol, vecCol, k)
    val bwd = Similarity.bruteTopK(src, tgt, idCol, vecCol, k)
    marginFromLists(fwd, bwd, minMarginMicro)
  }

  /** The production-scale miner (the r18 verdict's "tier boundary"
    * fix): persisted [[AnnIndex]] LSH indexes as the list makers,
    * probed in bounded query batches, margins over the materialized
    * lists. The in-flight composition out-spilled 77 GB of local disk
    * at 500 k vectors/side (recordings/bitext_r18.jsonl): with corpus
    * as queries the whole candidate stream — probe fold × corpus
    * collisions, pre-distinct — lives in ONE job's shuffle files,
    * which are only freed when the job ends. This shape bounds it
    * structurally:
    *
    *   - Each side is indexed ONCE ([[AnnIndex.lshIndexWrite]]: slim
    *     16 B signature rows + vectors, hot-bucket census) — corpus
    *     hashing is paid once per side, not once per direction per
    *     retry.
    *   - The query side probes in `probeBatches` disjoint hash
    *     buckets, each batch a SEPARATE job whose k-rows-per-query
    *     result is appended to a parquet list table; its shuffle files
    *     free at job end, so peak disk is ~1/probeBatches of the
    *     single-shot candidate stream. Per-query top-k is independent
    *     of batching, so the union is row-identical to one shot
    *     (BitextSpec pins it).
    *   - The probe shape auto-couples ([[Similarity.lshAutoShape]]):
    *     corpus-as-queries selects the dedup coupling, never the
    *     flat-deep retrieval fold that died at 100 k/side.
    *
    * Margins then run over rank-scale rows ([[marginFromLists]]).
    * Sized at 500 k×500 k on the dev box in
    * recordings/bitext_r19.jsonl; certified against the DuckDB oracle
    * by `bitext_margin_mine_indexed` (2-batch probing, per-side
    * derived shapes).
    */
  def marginMineIndexed(
      spark: org.apache.spark.sql.SparkSession,
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      workDir: String,
      k: Int = 4,
      minMarginMicro: Long = 1000000L,
      probeBatches: Int = 1,
      probeBudget: Int = 0,
      probeDepth: Int = 0,
      srcCount: Long = -1L,
      tgtCount: Long = -1L,
      indexesPrebuilt: Boolean = false,
      concurrentBatches: Int = 1
  ): DataFrame = {
    val nS = if (srcCount >= 0L) srcCount else src.count()
    val nT = if (tgtCount >= 0L) tgtCount else tgt.count()
    if (!indexesPrebuilt)
      indexSides(spark, src, tgt, idCol, vecCol, workDir, nS, nT)
    def lists(idxPath: String, queries: DataFrame, nQ: Long, outDir: String): DataFrame = {
      val nb = math.max(1, probeBatches)
      // each probe batch lands in its OWN directory, overwritten whole:
      // a run killed between batches leaves some complete dirs and at
      // most one torn one, and a plain retry overwrites every batch dir
      // before anything reads them — the final union reads EXACTLY the
      // nb dirs this run wrote (a torn leftover beyond them is
      // invisible), so the list tables can never be read half-appended
      // (r19 verdict #3; BitextSpec pins retry-over-torn identity)
      val batchDir = (bi: Int) => s"$outDir/pbatch$bi"
      def probeOne(bi: Int): Unit = {
        val qb = if (nb <= 1) queries
          else queries.filter(pmod(hash(col(idCol)), lit(nb)) === lit(bi))
        // queriesCount is the FULL query side, not the batch: the
        // auto-shape and broadcast-tier decisions must be the
        // single-shot ones on EVERY batch, or a batch small enough to
        // cross a boundary would probe a different shape and break the
        // batching-is-row-invisible contract (it also skips three
        // LIMITed count jobs per probe)
        AnnIndex.lshTopKIndexed(spark, idxPath, qb, idCol, vecCol, k,
            probeBudget = probeBudget, probeDepth = probeDepth,
            queriesCount = nQ)
          .write.mode("overwrite").parquet(batchDir(bi))
      }
      val cc = math.max(1, math.min(concurrentBatches, nb))
      if (cc <= 1) (0 until nb).foreach(probeOne)
      else {
        // batches are disjoint and each is its own job whose shuffle
        // files free at job end, so a bounded number can run
        // concurrently: peak disk grows to ~cc/probeBatches of the
        // single-shot stream (still bounded) while idle scheduler gaps
        // between sequential jobs close — Spark's scheduler is
        // thread-safe for concurrent job submission
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(cc)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence((0 until nb).map(bi => Future(probeOne(bi)))), Duration.Inf)
        finally pool.shutdown()
      }
      // batch-count manifest, written AFTER every batch dir is complete:
      // a post-hoc reader (graft.BitextQuality) reads exactly pbatch0..
      // nb-1 instead of globbing subdirectories — a stale pbatch dir
      // from an earlier wider run, or the torn dir of a killed run,
      // must never join the audited list tables (r20 ADVICE)
      writeBatchCount(spark, outDir, nb)
      spark.read.parquet((0 until nb).map(batchDir): _*)
    }
    val fwd = lists(s"$workDir/tgt_index", src, nS, s"$workDir/fwd_lists")
    val bwd = lists(s"$workDir/src_index", tgt, nT, s"$workDir/bwd_lists")
    marginFromLists(fwd, bwd, minMarginMicro)
  }

  private def writeBatchCount(spark: org.apache.spark.sql.SparkSession,
      outDir: String, nb: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/_batches")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(nb.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The batch count a completed [[marginMineIndexed]] run recorded for
    * its `fwd_lists`/`bwd_lists` directory — fails loud when absent
    * (the run was killed before its lists completed, or predates the
    * manifest): a reader globbing subdirectories instead would pick up
    * stale or torn batch dirs the miner's own union deliberately
    * excludes.
    */
  def listBatchDirs(spark: org.apache.spark.sql.SparkSession,
      outDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/_batches")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no _batches manifest under $outDir — the mining run did not " +
        "complete its list table (or predates the batch manifest); " +
        "refusing to guess which pbatch dirs belong to it")
    val in = fs.open(p)
    val nb = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    val dirs = (0 until nb).map(bi => s"$outDir/pbatch$bi")
    dirs.foreach(d => require(
      fs.exists(new org.apache.hadoop.fs.Path(d)),
      s"manifest names $nb batch dirs but $d is missing — torn run"))
    dirs
  }

  /** Build the two per-side persisted LSH indexes [[marginMineIndexed]]
    * probes (`workDir/tgt_index`, `workDir/src_index`) — exposed so a
    * pipeline that mines several batches against the same corpus
    * snapshot can pay the build once and call [[marginMineIndexed]]
    * with `indexesPrebuilt = true` per batch.
    */
  def indexSides(
      spark: org.apache.spark.sql.SparkSession,
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      workDir: String,
      srcCount: Long = -1L,
      tgtCount: Long = -1L
  ): Unit = {
    val nS = if (srcCount >= 0L) srcCount else src.count()
    val nT = if (tgtCount >= 0L) tgtCount else tgt.count()
    AnnIndex.lshIndexWrite(tgt, idCol, vecCol, s"$workDir/tgt_index", n = nT)
    AnnIndex.lshIndexWrite(src, idCol, vecCol, s"$workDir/src_index", n = nS)
  }

  /** Derive the mining floor from the candidate margin DISTRIBUTION
    * instead of a fixture-tuned constant (the pinned `1200000` the
    * registered oracle cells keep was r18/r19 review feedback): the
    * floor is the exact rank-based `quantile` of the POSITIVE
    * candidate margins — the ⌈q·N⌉-th smallest `margin_micro` — so
    * mining keeps the top (1−q) tail of the margin distribution the
    * lists actually produced, the held-out-threshold posture of
    * Artetxe & Schwenk §4 rather than a constant tuned on one fixture.
    *
    * Restricting to positive margins is ALSO the determinism contract:
    * integer division on positives agrees between Spark's `div`
    * (truncating) and an oracle's floor division, so the selected
    * rank's value — and therefore the floor and the mined set — replay
    * exactly; a quantile that would land in the (engine-ambiguous)
    * negative mass fails loud instead.
    *
    * Scale shape: the distribution is RANK-scale (|src|·k candidate
    * rows, never corpus²), and the rank pick is a two-pass exact
    * selection — count per distinct margin VALUE (one hash aggregate
    * over the lists), then a cumulative walk over the value histogram
    * to the first value whose running count reaches ⌈q·N⌉. The only
    * single-task structure is the histogram walk, bounded by the
    * margin VALUE DOMAIN (micro-ratios cluster in ~[1, 3·10⁶]), never
    * by candidate rows — the r20 `orderBy().limit(⌈q·N⌉)` selection
    * gathered q·N longs through one task and capped N at Int.MaxValue
    * (r20 verdict nit). Same selected value by construction: the
    * ⌈q·N⌉-th smallest element equals the smallest value v with
    * count(margin ≤ v) ≥ ⌈q·N⌉.
    */
  def deriveMarginFloor(
      fwd: DataFrame,
      bwd: DataFrame,
      quantile: Double = 0.9
  ): Long = {
    require(quantile > 0.0 && quantile < 1.0, s"quantile $quantile outside (0, 1)")
    val margins = marginFromLists(fwd, bwd, 1L).select("margin_micro")
    val hist = margins.groupBy("margin_micro").agg(count(lit(1)).as("_n"))
    val cnt = hist.agg(coalesce(sum("_n"), lit(0L))).collect()(0).getLong(0)
    require(cnt > 0, "no positive-margin candidate pairs to derive a floor from")
    val idx = math.max(1L, math.ceil(quantile * cnt).toLong)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("margin_micro").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    hist.withColumn("_cum", sum("_n").over(w))
      .filter(col("_cum") >= idx)
      .agg(min("margin_micro")).collect()(0).getLong(0)
  }

  /** The margin computation over ANY pair of ranked lists — the
    * production seam: feed forward/backward lists from an approximate
    * tier (LSH, IVF, a persisted index probe) and the margin math is
    * unchanged. Lists must carry (query_id, neighbor_id, cos) with
    * the family's 4-decimal cosine; the forward list's pairs are the
    * candidates, both lists define the neighborhoods.
    */
  def marginFromLists(
      fwd: DataFrame,
      bwd: DataFrame,
      minMarginMicro: Long
  ): DataFrame = {
    def e4(df: DataFrame) = df.select(
      col("query_id"), col("neighbor_id"),
      floor(col("cos") * 1e4 + 0.5).cast("long").as("cos_e4"))
    val f = e4(fwd)
    val b = e4(bwd)
    // neighborhood sums: exact integer, order-independent; cnt kept
    // for the corpus edge (an anchor with fewer than k neighbors)
    val nnA = f.groupBy(col("query_id").as("src_id"))
      .agg(sum("cos_e4").as("sum_a"), count(lit(1)).as("cnt_a"))
    val nnB = b.groupBy(col("query_id").as("tgt_id"))
      .agg(sum("cos_e4").as("sum_b"), count(lit(1)).as("cnt_b"))
    f.select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"), col("cos_e4"))
      .join(nnA, Seq("src_id"))
      .join(nnB, Seq("tgt_id"))
      // avg-of-avgs in integer space: 2·cos/(sumA/cntA + sumB/cntB)
      .withColumn("denom", col("sum_a") * col("cnt_b") + col("sum_b") * col("cnt_a"))
      // a non-positive neighborhood denominator means the margin ratio
      // is meaningless (hostile all-negative neighborhoods) — excluded
      .filter(col("denom") > 0)
      .withColumn("margin_micro",
        expr("2 * cos_e4 * cnt_a * cnt_b * 1000000 div denom"))
      .filter(col("margin_micro") >= minMarginMicro)
      .select("src_id", "tgt_id", "cos_e4", "margin_micro")
  }
}
