package graft.queries

import graft.Tables
import graft.ext.Lexical
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lexical-model suite over `documents`: the bigram-LM fluency score
  * and BM25-family retrieval. Both are pure integer fixed-point, so
  * the DuckDB oracles replay the full computation (counts, joins,
  * fixed-point folds) bit-for-bit.
  */
object LexicalQueries extends QueryGroup {

  /** Fixed retrieval probe; mid-frequency corpus terms. */
  private val Bm25Terms = Seq("vector", "stream", "window", "merge", "quality")
  private val Bm25K = 15

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
    })
  )

  val oracleSql: Map[String, String] = Map(

    "lm_bigram_score" ->
      """WITH t AS (
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
  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(CAST(sum(p_micro) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS lm_score_micro
FROM per GROUP BY doc_id ORDER BY doc_id""",

    "bm25_topk" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (
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
  FROM tf JOIN dfr USING (term) CROSS JOIN st)
SELECT doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro,
       CAST(count(*) AS BIGINT) AS n_terms
FROM per GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT $Bm25K"""
    }
  )
}
