package graft.ext

import graft.functions.SketchExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find corpus documents that share word
  * n-grams with a benchmark (eval) set — the standard contamination
  * check an LLM training pipeline runs before training, so evaluation
  * results aren't inflated by memorized test items.
  *
  * Shape at 100 TB: the corpus side never shuffles whole documents —
  * each doc's distinct n-gram hashes come from the row-local codegen
  * shingle pass ([[graft.functions.HashShinglesExpr]], same
  * md5-60-bit-mod-m hash as the dedup family, so the DuckDB oracle
  * replays it exactly), then explode + a BROADCAST join against the
  * eval set's distinct grams. Benchmarks are small by nature (KBs–MBs),
  * so the eval gram set always fits a broadcast; non-matching corpus
  * grams die map-side and the only shuffle is the matched (doc, eval,
  * gram) rows — proportional to actual contamination, not corpus size.
  * Output is integer-only (shared / total gram counts), so the
  * cross-engine hash is trivially stable; callers derive ratios.
  */
object Decontaminate {

  /** Per (corpus doc, eval doc) contamination report: documents sharing
    * at least `minShared` distinct n-gram hashes with an eval doc.
    * Columns: `doc_id, eval_id, shared_grams, n_grams` (the corpus
    * doc's distinct-gram count, for ratio thresholds downstream).
    */
  def ngramContamination(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      evalSet: DataFrame,
      evalId: String,
      evalText: String,
      n: Int = 3,
      m: Long = DedupConstants.P,
      minShared: Long = 1L
  ): DataFrame = {
    val grams = (text: String) => SketchExprs.hashShingles(Dedup.shingleCol(text, n), m)
    // n_grams rides the explode and the groupBy key (functionally
    // dependent on doc_id) — no second pass over the corpus for sizes
    val cGrams = corpus.select(
      col(corpusId).as("doc_id"),
      grams(corpusText).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"), explode(col("gs")).as("g"))
    val eGrams = evalSet.select(
      col(evalId).as("eval_id"),
      explode(grams(evalText)).as("g"))
      .distinct()
    cGrams.join(broadcast(eGrams), "g")
      .groupBy("doc_id", "eval_id", "n_grams")
      .agg(countDistinct(col("g")).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
      .select("doc_id", "eval_id", "shared_grams", "n_grams")
  }

  /** SEMANTIC contamination: corpus vectors whose cosine to some eval
    * vector clears `tau` — catches the paraphrased / translated /
    * reformatted benchmark leakage the n-gram check is blind to
    * (different surface forms, same meaning → same embedding
    * neighborhood). Reports each contaminated corpus doc with its
    * single best-matching eval doc (highest rounded cosine, ties to
    * the smallest eval id).
    *
    * Shape at 100 TB: benchmarks are small by nature, so the eval side
    * is BROADCAST and the corpus streams map-side through one codegen
    * dot product per (corpus, eval) pair — linear in the corpus, and
    * the only shuffle is the contaminated rows (∝ contamination, not
    * corpus size) into the per-doc top-1 rank. For benchmark suites
    * too large to broadcast, swap the candidate stage for the LSH
    * bucketing of [[Dedup.embeddingCosinePairsLsh]] — the refine and
    * rank are unchanged.
    */
  /** `excludeSelfPairs` skips (train_id == eval_id) pairs and is OFF by
    * default: corpus and benchmark ids usually come from DIFFERENT
    * namespaces, where a coincidental id collision must still be
    * reported as contamination. Turn it on only when both sides share
    * one id namespace (e.g. self-checking a corpus against its own
    * held-out slice, as the registered query's %10 split could).
    */
  def embeddingContamination(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      evalSet: DataFrame,
      evalId: String,
      evalVec: String,
      tau: Double,
      excludeSelfPairs: Boolean = false
  ): DataFrame = {
    import graft.functions.DotProductExpr.dot
    import org.apache.spark.sql.expressions.Window
    // zero-norm rows are excluded on both sides: they can never clear a
    // positive τ, and under ANSI their cosine is a runtime
    // divide-by-zero (same exclusion the whole cosine family applies)
    val c = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(corpusId).as("train_id"), col(corpusVec).cast("array<double>").as("tv"))
      .withColumn("tn", sqrt(dot(col("tv"), col("tv"))))
      .filter(col("tn") > 0)
    val e = broadcast(evalSet
      .select(col(evalId).as("eval_id"), col(evalVec).cast("array<double>").as("ev"))
      .withColumn("en", sqrt(dot(col("ev"), col("ev"))))
      .filter(col("en") > 0))
    val w = Window.partitionBy("train_id")
      .orderBy(col("cos").desc, col("eval_id").asc)
    (if (excludeSelfPairs) c.join(e, col("train_id") =!= col("eval_id"))
     else c.crossJoin(e))
      .withColumn("cos", round(dot(col("tv"), col("ev")) / (col("tn") * col("en")), 4))
      .filter(col("cos") >= tau)
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select("train_id", "eval_id", "cos")
  }
}
