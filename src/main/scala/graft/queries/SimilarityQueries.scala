package graft.queries

import graft.Tables
import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search suite over `embeddings` (64-dim float vectors).
  * The brute-force top-k has a full DuckDB oracle (same double-precision
  * fold, same rounded-cosine tie-break); the LSH and IVF variants are
  * approximate-by-design, so the oracle is the recall spec in
  * SimilaritySpec rather than SQL (driver records rows-only).
  */
object SimilarityQueries extends QueryGroup {

  private val K = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact cosine top-5 for query vectors vec_id < 10.
    "ann_topk_brute" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed approximate top-5 (8 tables x 8 bits, re-ranked
    // exactly). Rows-only check here; recall >= 0.8 asserted in
    // SimilaritySpec against the brute-force baseline.
    "ann_topk_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
    }),

    // IVF approximate top-5 (centroid stride 50, nProbe 3) — the
    // bucketed-layout scale path. Rows-only + recall spec.
    "ann_topk_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ann_topk_brute" ->
      s"""WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    round(
      list_sum(list_transform(generate_series(1, 64),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(generate_series(1, 64),
           i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(generate_series(1, 64),
           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))
    , 4) AS cos
  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT query_id, rank, neighbor_id, cos FROM ranked
WHERE rank <= $K ORDER BY query_id, rank"""
  )
}
