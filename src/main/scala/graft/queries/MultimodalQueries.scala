package graft.queries

import graft.Tables
import graft.ext.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing as a contract query: documents' text bytes play
  * the role of media payloads; features are the deterministic
  * stub-decode byte histograms (integers — exact cross-engine compare).
  * The oracle recomputes the histogram from character codes, valid
  * because the corpus is pure ASCII (byte == code point).
  */
object MultimodalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, dir) => {
      val feats = Multimodal.featuresOf(Tables.documents(s, dir), "doc_id", "text")
      val histCols = (0 until Multimodal.HistBins).map(b => col("histogram")(b).as(s"hist_$b"))
      feats.toDF()
        .select(Seq(col("id").as("doc_id"), col("nBytes").as("n_bytes")) ++ histCols: _*)
        .orderBy("doc_id")
    })
  )

  private val histSelect = (0 until Multimodal.HistBins).map { b =>
    s"""len(list_filter(generate_series(1, length(text)),
       i -> (ascii(substr(text, i, 1)) * ${Multimodal.HistBins}) // 256 = $b)) AS hist_$b"""
  }.mkString(",\n  ")

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
  $histSelect
FROM documents ORDER BY doc_id"""
  )
}
