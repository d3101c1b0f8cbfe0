package graft.queries

import graft.Tables
import graft.ext.{Hybrid, Lexical, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical-model suite over `documents`: the bigram-LM fluency score,
  * BM25-family retrieval, PMI collocation mining, and the RRF hybrid
  * fusion of the lexical and semantic retrievers. Everything is pure
  * integer fixed-point, so the DuckDB oracles replay the full
  * computation (counts, joins, fixed-point folds) bit-for-bit.
  */
object LexicalQueries extends QueryGroup {

  /** Fixed retrieval probe; mid-frequency corpus terms. */
  private val Bm25Terms = Seq("vector", "stream", "window", "merge", "quality")
  private val Bm25K = 15

  /** Hybrid fusion: retrieval depth of each input list, fused top-k,
    * and the semantic probe's query vector id.
    */
  private val RrfDepth = 20
  private val RrfK = 10
  private val RrfQueryVec = 0

  /** Collocation floor and output size. */
  private val PmiMinCount = 3
  private val PmiK = 20

  /** Hashed-DSIR feature-space size (fixed regardless of vocabulary). */
  private val DsirBuckets = 4096

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CCNet-style LM quality gate: mean bigram conditional probability
    // (micro units) per doc, trained on the corpus itself. Vocabulary
    // joins are shuffle joins BY DESIGN (see Lexical scaladoc).
    "lm_bigram_score" -> ((s, dir) => {
      Lexical.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // BM25-family top-15 for a fixed 5-term query; integer fixed-point
    // scoring, rational idf surrogate (see Lexical scaladoc).
    "bm25_topk" -> ((s, dir) => {
      Lexical.bm25TopK(Tables.documents(s, dir), "doc_id", "text", Bm25Terms, Bm25K)
    }),

    // Top-20 adjacent-pair collocations by rational PMI (count floor 3)
    // — tokenizer merge candidates / multi-word expressions.
    "pmi_top_pairs" -> ((s, dir) => {
      Lexical.pmiTopPairs(Tables.documents(s, dir), "text", PmiMinCount, PmiK)
    }),

    // CCNet per-language quality terciles: head/middle/tail cut of
    // each language's bigram-LM ranking — the filter that keeps
    // low-resource languages from being dropped by a global cut.
    "ccnet_buckets" -> ((s, dir) => {
      Lexical.ccnetBuckets(Tables.documents(s, dir), "doc_id", "text", "lang")
        .orderBy("doc_id")
    }),

    // DSIR importance weights: resample the raw corpus toward the
    // trusted target slice (source = 'src0') by unigram log-count
    // ratios in exact integer floor-log2 space.
    "dsir_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Lexical.dsirWeights(docs, docs.filter(col("source") === "src0"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // CCNet used as CCNet uses it (Wenzek §4.4): the tercile cut GATES
    // the corpus — keep head+middle, drop tail — and the kept slice
    // flows into downstream token accounting (the input to a mixture /
    // token-budget plan). Exercises the bucket column as a filter, not
    // just a label.
    "ccnet_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Lexical.ccnetBuckets(docs, "doc_id", "text", "lang")
        .filter(col("ccnet_bucket") =!= "tail")
        .join(docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")), Seq("doc_id"))
        .select("doc_id", "lang", "lm_score_micro", "ccnet_bucket", "n_tokens")
        .orderBy("doc_id")
    }),

    // DSIR at the paper's actual scale shape: features hashed into a
    // fixed-size bucket space, so the ratio table broadcasts and the
    // per-token scoring join is map-side.
    "dsir_weights_hashed" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Lexical.dsirWeightsHashed(
        docs, docs.filter(col("source") === "src0"), "doc_id", "text", DsirBuckets)
        .orderBy("doc_id")
    }),

    // Hybrid retrieval: BM25 top-20 (lexical) fused with exact-cosine
    // top-20 neighbors of vector 0 (semantic, doc_id ≡ vec_id) by
    // reciprocal-rank fusion — integer micro contributions, exact sum.
    "hybrid_rrf" -> ((s, dir) => {
      val lex = Lexical.bm25TopK(Tables.documents(s, dir), "doc_id", "text", Bm25Terms, RrfDepth)
        .withColumn("rank",
          // input is the <= RrfDepth-row top-k list; the bounded (non-
          // foldable) partition key says so to the planner (no warning)
          row_number().over(Window.partitionBy(graft.ext.Pipeline.boundedPartKey(col("doc_id")))
            .orderBy(col("score_micro").desc, col("doc_id").asc)))
        .select("doc_id", "rank")
      val emb = Tables.embeddings(s, dir)
      val sem = Similarity.bruteTopK(
        emb, emb.filter(col("vec_id") === RrfQueryVec), "vec_id", "embedding", RrfDepth)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Hybrid.rrfFuse(Seq(lex, sem), "doc_id", "rank", RrfK)
    })
  )

  /** The BM25 pipeline as a reusable WITH-body ending in `bmtop`
    * (doc_id, score_micro, n_terms — ordered, limited to `k`), shared
    * by the standalone oracle and the hybrid-fusion oracle.
    */
  private def bm25Ctes(k: Int): String = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tl AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         (CAST(sum(dl) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS avgdl_milli
  FROM tl),
tf AS (
  SELECT doc_id, term, CAST(max(dl) AS BIGINT) AS dl, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM tl) x
  WHERE term IN ($termList)
  GROUP BY doc_id, term),
dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
per AS (
  SELECT tf.doc_id,
    ((((st.n_docs - dfr.df) * 1000000 + 500000) // (dfr.df + 1))
      * ((tf.tf * 2200 * 1000)
         // (tf.tf * 1000
             + (1200 * (250 + (750 * ((tf.dl * 1000000) // st.avgdl_milli)) // 1000)) // 1000)))
    // 1000000 AS s_micro
  FROM tf JOIN dfr USING (term) CROSS JOIN st),
bmtop AS (
  SELECT doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM per GROUP BY doc_id
  ORDER BY score_micro DESC, doc_id ASC LIMIT $k)"""
  }

  /** The bigram-LM pipeline as a reusable WITH-body ending in `lm`
    * (doc_id, n_bigrams, lm_score_micro), shared by the standalone
    * oracle and the CCNet tercile oracle.
    */
  private def lmCtes: String =
    """t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g),
uni AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(toks) AS w1 FROM t) u GROUP BY 1),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
per AS (
  SELECT bg.doc_id, (big.c2 * 1000000) // uni.c1 AS p_micro
  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)),
lm AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(CAST(sum(p_micro) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS lm_score_micro
  FROM per GROUP BY doc_id)"""

  val oracleSql: Map[String, String] = Map(

    // Spark's skew-proof two-phase rank (per-(lang,block) + broadcast
    // prefix) is a total order on (lm_score_micro, doc_id) within
    // lang — at oracle scale the plain window IS that order, so DuckDB
    // replays the tercile cut with one row_number().
    "ccnet_buckets" ->
      s"""WITH $lmCtes,
ranked AS (
  SELECT lm.doc_id, d.lang, lm.lm_score_micro,
    CAST(row_number() OVER (
      PARTITION BY d.lang ORDER BY lm.lm_score_micro ASC, lm.doc_id ASC) AS BIGINT) AS r,
    CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n
  FROM lm JOIN documents d USING (doc_id))
SELECT doc_id, lang, lm_score_micro,
  CASE ((r - 1) * 3) // n WHEN 2 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END
    AS ccnet_bucket
FROM ranked ORDER BY doc_id""",

    // Exact integer floor-log2 replay: flog2(x) = length(bin(x+1)) - 1
    // is engine-identical (binary-string length, no libm). Every token
    // of `raw` appears in the source count table by construction, so
    // the ratio join is effectively inner on the full corpus.
    "dsir_weights" ->
      """WITH sc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c_s
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) s GROUP BY 1),
tc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c_t
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        WHERE source = 'src0') s GROUP BY 1),
ns AS (SELECT CAST(sum(c_s) AS BIGINT) AS n_s FROM sc),
nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t FROM tc),
lr AS (
  SELECT sc.w,
    CAST((length(bin(COALESCE(tc.c_t, 0) + 1)) - 1)
       - (length(bin(sc.c_s + 1)) - 1)
       + (length(bin(ns.n_s + 1)) - 1)
       - (length(bin(nt.n_t + 1)) - 1) AS BIGINT) AS lr
  FROM sc LEFT JOIN tc USING (w) CROSS JOIN ns CROSS JOIN nt),
ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lr.lr) AS BIGINT) AS dsir_logw
FROM ex JOIN lr USING (w)
GROUP BY ex.doc_id ORDER BY ex.doc_id""",

    "ccnet_pipeline" ->
      s"""WITH $lmCtes,
ranked AS (
  SELECT lm.doc_id, d.lang, lm.lm_score_micro,
    CAST(row_number() OVER (
      PARTITION BY d.lang ORDER BY lm.lm_score_micro ASC, lm.doc_id ASC) AS BIGINT) AS r,
    CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n
  FROM lm JOIN documents d USING (doc_id)),
cut AS (
  SELECT doc_id, lang, lm_score_micro,
    CASE ((r - 1) * 3) // n WHEN 2 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END
      AS ccnet_bucket
  FROM ranked)
SELECT cut.doc_id, cut.lang, cut.lm_score_micro, cut.ccnet_bucket,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
FROM cut JOIN documents d USING (doc_id)
WHERE cut.ccnet_bucket <> 'tail'
ORDER BY cut.doc_id""",

    // Same replay with the token pre-hashed into the fixed bucket
    // space via the repo's portable 60-bit md5 prefix.
    "dsir_weights_hashed" ->
      s"""WITH sw AS (
  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $DsirBuckets AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) s),
tw AS (
  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $DsirBuckets AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        WHERE source = 'src0') s),
sc AS (SELECT f, CAST(count(*) AS BIGINT) AS c_s FROM sw GROUP BY 1),
tc AS (SELECT f, CAST(count(*) AS BIGINT) AS c_t FROM tw GROUP BY 1),
ns AS (SELECT CAST(sum(c_s) AS BIGINT) AS n_s FROM sc),
nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t FROM tc),
lr AS (
  SELECT sc.f,
    CAST((length(bin(COALESCE(tc.c_t, 0) + 1)) - 1)
       - (length(bin(sc.c_s + 1)) - 1)
       + (length(bin(ns.n_s + 1)) - 1)
       - (length(bin(nt.n_t + 1)) - 1) AS BIGINT) AS lr
  FROM sc LEFT JOIN tc USING (f) CROSS JOIN ns CROSS JOIN nt),
ex AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $DsirBuckets AS f
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) s)
SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lr.lr) AS BIGINT) AS dsir_logw
FROM ex JOIN lr USING (f)
GROUP BY ex.doc_id ORDER BY ex.doc_id""",

    "lm_bigram_score" ->
      s"""WITH $lmCtes
SELECT doc_id, n_bigrams, lm_score_micro FROM lm ORDER BY doc_id""",

    "bm25_topk" ->
      s"""WITH ${bm25Ctes(Bm25K)}
SELECT doc_id, score_micro, n_terms FROM bmtop""",

    "pmi_top_pairs" ->
      s"""WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(toks) AS w FROM t) u GROUP BY 1),
n AS (SELECT CAST(sum(c1) AS BIGINT) AS n_tokens FROM uni),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
  FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g) bg
  GROUP BY 1, 2 HAVING count(*) >= $PmiMinCount)
SELECT big.w1, big.w2, big.c2,
       CAST(((big.c2 * 1000000) // ua.c1) * n.n_tokens // ub.c1 AS BIGINT) AS pmi_micro
FROM big
JOIN uni ua ON big.w1 = ua.w
JOIN uni ub ON big.w2 = ub.w
CROSS JOIN n
ORDER BY pmi_micro DESC, big.w1 ASC, big.w2 ASC LIMIT $PmiK""",

    "hybrid_rrf" ->
      s"""WITH ${bm25Ctes(RrfDepth)},
lex AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INTEGER) AS rank
  FROM bmtop),
q AS (SELECT embedding FROM embeddings WHERE vec_id = $RrfQueryVec),
semranked AS (
  SELECT c.vec_id AS doc_id,
    CAST(row_number() OVER (ORDER BY ${SimilarityQueries.cosSql("q", "c")} DESC, c.vec_id ASC)
         AS INTEGER) AS rank
  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> $RrfQueryVec),
sem AS (SELECT doc_id, rank FROM semranked ORDER BY rank LIMIT $RrfDepth),
u AS (
  SELECT doc_id, CAST(1000000 // (60 + rank) AS BIGINT) AS rrf FROM lex
  UNION ALL
  SELECT doc_id, CAST(1000000 // (60 + rank) AS BIGINT) AS rrf FROM sem)
SELECT doc_id, CAST(sum(rrf) AS BIGINT) AS rrf_micro,
       CAST(count(*) AS BIGINT) AS n_lists
FROM u GROUP BY doc_id
ORDER BY rrf_micro DESC, doc_id ASC LIMIT $RrfK"""
  )
}
