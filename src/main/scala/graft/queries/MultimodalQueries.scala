package graft.queries

import graft.Tables
import graft.ext.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing as contract queries.
  *
  * `multimodal_features`: documents' text bytes play the role of
  * opaque (non-image) media payloads; features are the deterministic
  * stub-decode byte histograms (integers — exact cross-engine
  * compare). The oracle recomputes the histogram from character codes,
  * valid because the corpus is pure ASCII (byte == code point).
  *
  * `multimodal_image_decode`: a REAL `javax.imageio` round-trip,
  * hash-checked — each doc_id deterministically synthesizes a tiny
  * grayscale PNG ([[Multimodal.syntheticPng]]), executors decode it
  * back with a real ImageReader, and because PNG is lossless the
  * decoded width / height / luminance histogram are analytically
  * predictable from doc_id alone — which is what the DuckDB oracle
  * computes, no image library involved. A wrong decode (dimensions,
  * pixel values, luminance math) breaks the hash.
  */
object MultimodalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, dir) => {
      val feats = Multimodal.featuresOf(Tables.documents(s, dir), "doc_id", "text")
      val histCols = (0 until Multimodal.HistBins).map(b => col("histogram")(b).as(s"hist_$b"))
      feats.toDF()
        .select(Seq(col("id").as("doc_id"), col("nBytes").as("n_bytes")) ++ histCols: _*)
        .orderBy("doc_id")
    }),

    "multimodal_image_decode" -> ((s, dir) => {
      import s.implicits._
      val recs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
        .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticPng(id),
          Multimodal.MediaMeta("png", 0, 0, 0L)))
      val feats = Multimodal.extractFeatures(recs)
      val histCols = (0 until Multimodal.HistBins).map(b => col("histogram")(b).as(s"hist_$b"))
      feats.toDF()
        .select(Seq(col("id").as("doc_id"), col("format"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height")) ++ histCols: _*)
        .orderBy("doc_id")
    }),

    // image near-dup via 64-bit aHash fingerprints + hamming banding:
    // the REAL decode feeds the fingerprint, and the oracle replays it
    // analytically from the synthetic pixel formula (see oracle CTEs)
    "multimodal_image_neardup" -> ((s, dir) => {
      import s.implicits._
      val recs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
        .map(id => Multimodal.MediaRecord(id, Multimodal.syntheticPng(id),
          Multimodal.MediaMeta("png", 0, 0, 0L)))
      Multimodal.imageNearDupPairs(recs).orderBy("doc_a", "doc_b")
    })
  )

  private val histSelect = (0 until Multimodal.HistBins).map { b =>
    s"""len(list_filter(generate_series(1, length(text)),
       i -> (ascii(substr(text, i, 1)) * ${Multimodal.HistBins}) // 256 = $b)) AS hist_$b"""
  }.mkString(",\n  ")

  private val imageHistSelect = (0 until Multimodal.HistBins).map { b =>
    s"""CAST(len(list_filter(flatten(list_transform(generate_series(0, doc_id % 8),
       x -> list_transform(generate_series(0, doc_id % 5),
            y -> (31 * doc_id + 7 * x + 13 * y) % 256))),
       g -> (g * ${Multimodal.HistBins}) // 256 = $b)) AS BIGINT) AS hist_$b"""
  }.mkString(",\n  ")

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
  $histSelect
FROM documents ORDER BY doc_id""",

    "multimodal_image_decode" ->
      s"""SELECT doc_id, 'png' AS format,
  CAST(1 + doc_id % 8 AS BIGINT) AS width,
  CAST(1 + doc_id % 5 AS BIGINT) AS height,
  $imageHistSelect
FROM documents ORDER BY doc_id""",

    // replays imageFingerprint64 analytically: sample the synthetic
    // image's pixel formula on the 8x8 nearest-neighbor grid, mean-
    // threshold into bits, band into 16-bit chunks for candidates, and
    // count differing bits for the exact hamming verify
    "multimodal_image_neardup" ->
      """WITH samp AS (
  SELECT doc_id, unnest(generate_series(0, 63)) AS pos FROM documents),
lums AS (
  SELECT doc_id, pos,
    ((31 * doc_id + 7 * (((pos % 8) * (1 + doc_id % 8)) // 8)
                  + 13 * (((pos // 8) * (1 + doc_id % 5)) // 8)) % 256) AS lum
  FROM samp),
m AS (SELECT doc_id, sum(lum) // 64 AS mean FROM lums GROUP BY 1),
bits AS (
  SELECT l.doc_id, l.pos, CASE WHEN l.lum > m.mean THEN 1 ELSE 0 END AS b
  FROM lums l JOIN m USING (doc_id)),
chunks AS (
  SELECT doc_id, pos // 16 AS chunk,
    sum(b * (CAST(1 AS BIGINT) << (pos % 16))) AS cval
  FROM bits GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cval = b.cval
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT c.doc_a, c.doc_b,
    CAST(sum(CASE WHEN x.b != y.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM cand c
  JOIN bits x ON x.doc_id = c.doc_a
  JOIN bits y ON y.doc_id = c.doc_b AND y.pos = x.pos
  GROUP BY 1, 2)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
ORDER BY doc_a, doc_b"""
  )
}
