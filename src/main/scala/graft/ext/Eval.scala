package graft.ext

import graft.functions.SketchExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-evaluation operators: the metrics a training-data pipeline
  * computes ABOUT its corpus and retrieval stack — retrieval NDCG,
  * annotator majority-vote resolution, confidence-bounded per-source
  * quality ranking, and per-document eval-set overlap. All outputs are
  * integer fixed-point so the cross-engine hash check is exact.
  *
  * (The reference — database_extractor.py — has no evaluation tier; it
  * extracts and pivots. These close the loop a 100 TB pipeline needs:
  * after dedup/filter/retrieval, measure what you built.)
  */
object Eval {

  /** Integer DCG discount weights: `w(i) = round(1e6 / log2(i+1))`,
    * precomputed on the driver for ranks 1..k so NDCG becomes pure
    * integer arithmetic in BOTH engines — no cross-engine float logs.
    */
  def dcgWeightsE6(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** NDCG@k of a ranked retrieval result against item labels.
    *
    * `ranked` holds `(query_id, rank, neighbor_id)` (e.g. the output of
    * [[Similarity.bruteTopK]]); `labels` maps `idCol -> labelCol`.
    * Binary relevance: a neighbor is relevant iff its label equals the
    * query's label. IDCG normalizes against the ideal ordering of the
    * RETRIEVED list (the standard label-only normalization when graded
    * judgments beyond the candidate pool don't exist); `n_rel = 0`
    * yields `ndcg_e6 = 0`.
    *
    * Shape at 100 TB: `ranked` is bounded (|queries| x k rows), so it
    * BROADCASTS into the labels scan twice (query side, neighbor side)
    * — the big labels table never shuffles and only matched rows
    * survive; the final per-query aggregate is over k-row groups.
    */
  def ndcgAtK(
      ranked: DataFrame,
      labels: DataFrame,
      idCol: String,
      labelCol: String,
      k: Int
  ): DataFrame = {
    val w = dcgWeightsE6(k)
    val cum = w.scanLeft(0L)(_ + _).tail // cum(i) = ideal DCG with i relevant
    val lab = labels.select(col(idCol).as("__id"), col(labelCol).as("__lab"))
    val withN = lab
      .join(broadcast(ranked), col("__id") === col("neighbor_id"))
      .select(col("query_id"), col("rank"), col("__lab").as("n_lab"))
    val withQ = lab
      .join(broadcast(withN), col("__id") === col("query_id"))
      .select(col("query_id"), col("rank"),
        when(col("__lab") === col("n_lab"), 1L).otherwise(0L).as("rel"))
    val wArr = array(w.map(lit): _*)
    val cumArr = array(cum.map(lit): _*)
    withQ
      .groupBy("query_id")
      .agg(
        sum(col("rel")).as("n_rel"),
        sum(col("rel") * element_at(wArr, col("rank").cast("int"))).as("dcg_e6"))
      // greatest(1, ..): ANSI element_at is 1-based; n_rel = 0 short-
      // circuits to 0 in the next column anyway
      .withColumn("idcg", element_at(cumArr, greatest(col("n_rel"), lit(1L)).cast("int")))
      .withColumn("ndcg_e6",
        when(col("n_rel") === 0L, 0L)
          .otherwise(expr("(dcg_e6 * 1000000) div idcg")))
      .select("query_id", "n_rel", "dcg_e6", "ndcg_e6")
  }

  /** MRR@k of a ranked retrieval result against item labels: per
    * query, the reciprocal rank of the FIRST relevant neighbor (label
    * equals the query's label), as an exact integer `1e6 div rank`;
    * 0 when no retrieved neighbor is relevant. The companion to
    * [[ndcgAtK]] when only the first hit matters (known-item search,
    * dedup-candidate lookup).
    *
    * Shape at 100 TB: identical to [[ndcgAtK]] — the bounded
    * |queries| x k ranked list broadcasts into the labels scan twice;
    * the labels table never shuffles; the final aggregate is over
    * k-row groups.
    */
  def mrrAtK(
      ranked: DataFrame,
      labels: DataFrame,
      idCol: String,
      labelCol: String
  ): DataFrame = {
    val lab = labels.select(col(idCol).as("__id"), col(labelCol).as("__lab"))
    val withN = lab
      .join(broadcast(ranked), col("__id") === col("neighbor_id"))
      .select(col("query_id"), col("rank"), col("__lab").as("n_lab"))
    val withQ = lab
      .join(broadcast(withN), col("__id") === col("query_id"))
      .select(col("query_id"), col("rank"),
        when(col("__lab") === col("n_lab"), 1L).otherwise(0L).as("rel"))
    withQ
      .groupBy("query_id")
      .agg(min(when(col("rel") === 1L, col("rank"))).cast("long").as("__first"))
      .withColumn("first_rel_rank", coalesce(col("__first"), lit(0L)))
      .withColumn("rr_e6",
        when(col("__first").isNull, 0L).otherwise(expr("1000000 div __first")))
      .select("query_id", "first_rel_rank", "rr_e6")
  }

  /** Recall@k of an approximate retrieval result against the exact
    * one: per query, how many of the true top-k the index recovered
    * (`hits`) and the recall in basis points. The acceptance metric
    * for every ANN tier — run on a bounded sampled query set, since
    * the exact side is the expensive one at corpus scale.
    *
    * Shape at 100 TB: both inputs are |queries| x k rows (top-k lists,
    * not corpora); the join and aggregate are bounded by construction.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1L))
    exact.select("query_id", "neighbor_id")
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .withColumn("recall_bp", expr(s"(hits * 10000) div $k"))
  }

  /** Majority-vote label resolution (annotation aggregation): per key,
    * the modal label with a deterministic tie-break (highest vote
    * count, then lexicographically smallest label). Emits the winning
    * label, its votes, the key's total observations, and the agreement
    * ratio in basis points (`votes * 10000 div total`).
    *
    * Shape at 100 TB: one (key, label) hash aggregate with map-side
    * combine does the heavy reduction; the arg-max window then runs
    * over the already-reduced distinct pairs (bounded by the label
    * vocabulary per key), not raw observations.
    */
  def majorityLabel(
      df: DataFrame,
      keyCol: String,
      labelCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = df
      .groupBy(col(keyCol), col(labelCol).as("label"))
      .agg(count(lit(1)).as("votes"))
    val total = Window.partitionBy(col(keyCol))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(col("votes").desc, col("label").asc)
    counted
      .withColumn("total", sum(col("votes")).over(total))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .withColumn("agree_bp", expr("(votes * 10000) div total"))
      .select(col(keyCol), col("label"), col("votes"), col("total"), col("agree_bp"))
  }

  /** Per-group quality ranking by the Wilson score lower bound (z = 2,
    * ~97.7% one-sided): ranks groups by how confident we are the true
    * good-doc rate is high, so a 4/4 source does not outrank a 96/100
    * one. With z = 2 the bound simplifies to
    * `(s + 2 - 2*sqrt(s(n-s)/n + 1)) / (n + 4)`.
    *
    * The inner term is evaluated in doubles with the SAME expression
    * shape in Spark and the DuckDB oracle — IEEE 754 multiply / divide
    * / sqrt are correctly rounded, so both engines produce the
    * identical double — then floored to e6 fixed point immediately;
    * everything after is integer arithmetic.
    *
    * Shape at 100 TB: a single hash aggregate (count + conditional
    * count) with map-side combine; output is |groups| rows.
    */
  def wilsonQuality(
      df: DataFrame,
      groupCol: String,
      good: org.apache.spark.sql.Column
  ): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(good, 1L).otherwise(0L)).as("n_good"))
      .withColumn("__r",
        floor(sqrt(col("n_good").cast("double")
          * (col("n_docs") - col("n_good")).cast("double")
          / col("n_docs").cast("double") + lit(1.0)) * lit(1000000.0))
          .cast("long"))
      .withColumn("wilson_e6", expr("((n_good + 2) * 1000000 - 2 * __r) div (n_docs + 4)"))
      .select(col(groupCol), col("n_docs"), col("n_good"), col("wilson_e6"))

  /** Cross-split leakage audit: near-duplicate pairs whose members
    * landed in DIFFERENT dataset splits — the contamination path a
    * random split leaves open (train memorizes, test rewards it) and
    * the reason splits should hash a canonical/cluster id, not the raw
    * doc id. `pairs` is any dedup pair report (`doc_a, doc_b`);
    * `splits` maps `idCol -> splitCol`. Emits only the leaking pairs
    * with both split labels.
    *
    * Shape at 100 TB: split assignment is a scan-side hash column (no
    * shuffle); the pair set (∝ actual duplication) joins against it
    * twice on the doc id — matched rows only. Run it as the acceptance
    * gate after [[Pipeline.datasetSplit]]; a non-empty result means
    * re-split on the dedup-cluster representative.
    */
  def splitLeakage(
      pairs: DataFrame,
      splits: DataFrame,
      idCol: String,
      splitCol: String
  ): DataFrame = {
    val s = splits.select(col(idCol).as("__id"), col(splitCol).as("__split"))
    pairs.select("doc_a", "doc_b")
      .join(s, col("doc_a") === col("__id"))
      .withColumnRenamed("__split", "split_a").drop("__id")
      .join(s, col("doc_b") === col("__id"))
      .withColumnRenamed("__split", "split_b").drop("__id")
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b", "split_a", "split_b")
  }

  /** Per-document eval-set overlap score: the fraction (in basis
    * points) of a corpus doc's distinct word n-gram hashes that appear
    * anywhere in the eval set — [[Decontaminate.ngramContamination]]'s
    * per-pair report collapsed to the per-doc contamination SCORE used
    * for threshold-based filtering. Docs with zero overlap are kept
    * (score 0); docs with fewer than `n` words have no n-grams and are
    * dropped, mirroring the shingle definition.
    *
    * Shape at 100 TB: same as decontamination — row-local codegen
    * shingle hashes, explode, broadcast join against the (small by
    * nature) eval gram set; non-matching grams die map-side, and the
    * per-doc gram counts ride the explode so the corpus is scanned
    * once.
    */
  def ngramOverlap(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      evalSet: DataFrame,
      evalText: String,
      n: Int = 3,
      m: Long = DedupConstants.P
  ): DataFrame = {
    val grams = (text: String) => SketchExprs.hashShingles(Dedup.shingleCol(text, n), m)
    val cGrams = corpus.select(
      col(corpusId).as("doc_id"),
      grams(corpusText).as("gs"))
      .filter(size(col("gs")) >= 1)
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"), explode(col("gs")).as("g"))
    val eGrams = evalSet.select(explode(grams(evalText)).as("g")).distinct()
    val matched = cGrams.join(broadcast(eGrams), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("shared_grams"))
    cGrams.select("doc_id", "n_grams").distinct()
      .join(matched, Seq("doc_id"), "left")
      .withColumn("shared_grams", coalesce(col("shared_grams"), lit(0L)))
      .withColumn("overlap_bp", expr("(shared_grams * 10000) div n_grams"))
      .select("doc_id", "n_grams", "shared_grams", "overlap_bp")
  }
}
