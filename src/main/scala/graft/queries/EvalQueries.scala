package graft.queries

import graft.Tables
import graft.ext.{Dedup, DedupConstants, Eval, Pipeline, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-evaluation suite: retrieval NDCG against embedding labels,
  * majority-vote label resolution over events, Wilson-bounded
  * per-source quality ranking, and per-document eval-set overlap.
  * Every metric is emitted in integer fixed point (weights precomputed
  * on the driver, shared verbatim with the oracle SQL), so the
  * cross-engine hash check is exact.
  */
object EvalQueries extends QueryGroup {

  private val NdcgK = 10
  private val QCount = 20
  private val GoodChars = 250
  private val Dim = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Retrieval quality of the brute-force top-10 (queries vec_id<20):
    // binary relevance = label match; integer DCG weights.
    "ndcg_at_k" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ranked = Similarity.bruteTopK(
        emb, emb.filter(col("vec_id") < QCount), "vec_id", "embedding", NdcgK)
        .select("query_id", "rank", "neighbor_id")
      Eval.ndcgAtK(ranked, emb.select("vec_id", "label"), "vec_id", "label", NdcgK)
        .orderBy("query_id")
    }),

    // MRR over the same ranked list as ndcg_at_k: reciprocal rank of
    // the first same-label neighbor, exact integer 1e6 div rank —
    // the known-item-search companion to NDCG's graded view.
    "mrr_at_k" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ranked = Similarity.bruteTopK(
        emb, emb.filter(col("vec_id") < QCount), "vec_id", "embedding", NdcgK)
        .select("query_id", "rank", "neighbor_id")
      Eval.mrrAtK(ranked, emb.select("vec_id", "label"), "vec_id", "label")
        .orderBy("query_id")
    }),

    // Modal event_type per user with deterministic tie-break — the
    // annotation-aggregation shape (votes desc, then label asc).
    "label_majority" -> ((s, dir) => {
      Eval.majorityLabel(Tables.events(s, dir), "user_id", "event_type")
        .orderBy("user_id")
    }),

    // Per-source good-doc rate ranked by the Wilson lower bound (z=2):
    // small perfect sources do not outrank large near-perfect ones.
    "quality_wilson" -> ((s, dir) => {
      Eval.wilsonQuality(Tables.documents(s, dir), "source",
        col("n_chars") >= GoodChars)
        .orderBy(col("wilson_e6").desc, col("source"))
    }),

    // Recall@5 of the LSH ANN tier vs the exact brute-force top-5 —
    // the index-acceptance metric, first-class and oracle-checked
    // (both sides are seeded/deterministic, so recall is too).
    "ann_recall_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteTopK(emb, qs, "vec_id", "embedding", 5)
      val approx = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, n = emb.count())
      Eval.recallAtK(exact, approx, 5).orderBy("query_id")
    }),

    // Same acceptance metric for the IVF tier (nProbe-bounded probe
    // set instead of hash buckets) — recall is per-query, so a probe
    // config that strands a region shows up as specific low rows, not
    // a diluted average.
    "ann_recall_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteTopK(emb, qs, "vec_id", "embedding", 5)
      val approx = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5, n = emb.count())
      Eval.recallAtK(exact, approx, 5).orderBy("query_id")
    }),

    // Cross-split leakage audit: MinHash near-dup pairs split across
    // train/val/test by the hash split — the contamination a raw-id
    // split leaves open. Non-empty result = re-split on cluster reps.
    "split_leakage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      val splits = Pipeline.datasetSplit(docs.select("doc_id"), "doc_id",
        valPermille = 100, testPermille = 100)
      Eval.splitLeakage(pairs, splits, "doc_id", "split")
        .orderBy("doc_a", "doc_b")
    }),

    // Per-doc contamination score: fraction (basis points) of the
    // doc's distinct 3-gram hashes present anywhere in the eval split
    // (doc_id % 20 = 0), zero-overlap docs kept.
    "ngram_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Eval.ngramOverlap(
        docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 20 === 0), "text")
        .orderBy("doc_id")
    })
  )

  // ---- oracle SQL, generated from the same constants ----

  /** Rank -> integer discount weight, inlined from [[Eval.dcgWeightsE6]]. */
  private val wCase = Eval.dcgWeightsE6(NdcgK).zipWithIndex
    .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
    .mkString("CASE t.rank ", " ", " ELSE 0 END")

  /** n_rel -> ideal DCG (cumulative weights), same driver constants. */
  private val cumCase = Eval.dcgWeightsE6(NdcgK).scanLeft(0L)(_ + _).tail.zipWithIndex
    .map { case (c, i) => s"WHEN ${i + 1} THEN $c" }
    .mkString("CASE n_rel ", " ", " ELSE 1 END")

  val oracleSql: Map[String, String] = Map(

    "ndcg_at_k" ->
      s"""WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${SimilarityQueries.cosSql("q", "c")} AS cos
  FROM embeddings q JOIN embeddings c ON q.vec_id < $QCount AND q.vec_id <> c.vec_id),
t AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM pairs) WHERE rank <= $NdcgK),
rel AS (
  SELECT t.query_id,
    CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel,
    CASE WHEN ql.label = nl.label THEN $wCase ELSE 0 END AS w
  FROM t
  JOIN embeddings ql ON ql.vec_id = t.query_id
  JOIN embeddings nl ON nl.vec_id = t.neighbor_id),
agg AS (
  SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel,
    CAST(sum(w) AS BIGINT) AS dcg_e6
  FROM rel GROUP BY 1)
SELECT query_id, n_rel, dcg_e6,
  CAST(CASE WHEN n_rel = 0 THEN 0
       ELSE (dcg_e6 * 1000000) // ($cumCase) END AS BIGINT) AS ndcg_e6
FROM agg ORDER BY query_id""",

    "mrr_at_k" ->
      s"""WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${SimilarityQueries.cosSql("q", "c")} AS cos
  FROM embeddings q JOIN embeddings c ON q.vec_id < $QCount AND q.vec_id <> c.vec_id),
t AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM pairs) WHERE rank <= $NdcgK),
m AS (
  SELECT t.query_id, min(t.rank) AS first_rel
  FROM t
  JOIN embeddings ql ON ql.vec_id = t.query_id
  JOIN embeddings nl ON nl.vec_id = t.neighbor_id
  WHERE ql.label = nl.label GROUP BY 1)
SELECT qq.query_id,
  CAST(coalesce(m.first_rel, 0) AS BIGINT) AS first_rel_rank,
  CAST(CASE WHEN m.first_rel IS NULL THEN 0 ELSE 1000000 // m.first_rel END AS BIGINT) AS rr_e6
FROM (SELECT DISTINCT query_id FROM t) qq LEFT JOIN m ON qq.query_id = m.query_id
ORDER BY qq.query_id""",

    // Wraps the two (deterministic) ANN oracles verbatim as subqueries
    // — same constants, same hyperplanes — and counts the overlap.
    "ann_recall_lsh" ->
      s"""WITH b AS (SELECT query_id, neighbor_id FROM (${SimilarityQueries.oracleSql("ann_topk_brute")})),
l AS (SELECT query_id, neighbor_id FROM (${SimilarityQueries.oracleSql("ann_topk_lsh")}))
SELECT b.query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST((count(l.neighbor_id) * 10000) // 5 AS BIGINT) AS recall_bp
FROM b LEFT JOIN l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id""",

    "ann_recall_ivf" ->
      s"""WITH b AS (SELECT query_id, neighbor_id FROM (${SimilarityQueries.oracleSql("ann_topk_brute")})),
l AS (SELECT query_id, neighbor_id FROM (${SimilarityQueries.oracleSql("ann_topk_ivf")}))
SELECT b.query_id,
  CAST(count(l.neighbor_id) AS BIGINT) AS hits,
  CAST((count(l.neighbor_id) * 10000) // 5 AS BIGINT) AS recall_bp
FROM b LEFT JOIN l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id""",

    // Wraps the MinHash-pair oracle verbatim; split spelling identical
    // to dataset_split's (same md5 hash family, same permilles).
    "split_leakage" ->
      s"""WITH p AS (SELECT doc_a, doc_b FROM (${DedupQueries.oracleSql("dedup_minhash_lsh")})),
s AS (
  SELECT doc_id,
    CASE WHEN ${PipelineQueries.duckHash("doc_id")} % 1000 >= 900 THEN 'test'
         WHEN ${PipelineQueries.duckHash("doc_id")} % 1000 >= 800 THEN 'val'
         ELSE 'train' END AS split
  FROM documents)
SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
FROM p
JOIN s sa ON sa.doc_id = p.doc_a
JOIN s sb ON sb.doc_id = p.doc_b
WHERE sa.split <> sb.split
ORDER BY p.doc_a, p.doc_b""",

    "label_majority" ->
      """WITH c AS (
  SELECT user_id, event_type AS label, CAST(count(*) AS BIGINT) AS votes
  FROM events GROUP BY 1, 2),
t AS (
  SELECT user_id, label, votes,
    CAST(sum(votes) OVER (PARTITION BY user_id) AS BIGINT) AS total,
    row_number() OVER (PARTITION BY user_id ORDER BY votes DESC, label ASC) AS r
  FROM c)
SELECT user_id, label, votes, total,
  CAST((votes * 10000) // total AS BIGINT) AS agree_bp
FROM t WHERE r = 1 ORDER BY user_id""",

    "quality_wilson" ->
      s"""WITH a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN n_chars >= $GoodChars THEN 1 ELSE 0 END) AS BIGINT) AS n_good
  FROM documents GROUP BY 1),
r AS (
  SELECT source, n_docs, n_good,
    CAST(floor(sqrt(CAST(n_good AS DOUBLE) * CAST(n_docs - n_good AS DOUBLE)
                    / CAST(n_docs AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT) AS rr
  FROM a)
SELECT source, n_docs, n_good,
  CAST(((n_good + 2) * 1000000 - 2 * rr) // (n_docs + 4) AS BIGINT) AS wilson_e6
FROM r ORDER BY wilson_e6 DESC, source""",

    "ngram_overlap" ->
      s"""${DedupQueries.shingleCtes(DedupConstants.P)},
cg AS (
  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams, unnest(hs) AS g
  FROM hs WHERE doc_id % 20 <> 0),
eg AS (SELECT DISTINCT unnest(hs) AS g FROM hs WHERE doc_id % 20 = 0),
mt AS (
  SELECT cg.doc_id, CAST(count(DISTINCT cg.g) AS BIGINT) AS shared_grams
  FROM cg JOIN eg ON cg.g = eg.g GROUP BY 1),
base AS (SELECT DISTINCT doc_id, n_grams FROM cg)
SELECT base.doc_id, base.n_grams,
  COALESCE(mt.shared_grams, 0) AS shared_grams,
  CAST((COALESCE(mt.shared_grams, 0) * 10000) // base.n_grams AS BIGINT) AS overlap_bp
FROM base LEFT JOIN mt ON base.doc_id = mt.doc_id
ORDER BY base.doc_id"""
  )
}
