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
FROM documents ORDER BY doc_id"""
  )
}
