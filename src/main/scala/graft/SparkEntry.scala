package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query groups live under `graft.queries`; this object only aggregates.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("daily_extract")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[QueryGroup] = Seq(
    ReferenceQueries,
    RelationalQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    MultimodalQueries,
    FunctionQueries,
    PipelineQueries,
    WarehouseQueries,
    GraphQueries,
    LexicalQueries,
    AnalyticsQueries,
    EvalQueries,
    SourceQueries
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_.queries).reduce(_ ++ _)

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    groups.map(_.oracleSql).reduce(_ ++ _)
}
