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
}
