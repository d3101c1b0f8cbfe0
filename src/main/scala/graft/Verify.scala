package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (local iteration only; the driver passes 2):
    // comma-separated query names to dump instead of the full set
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // name → Spark result schema (DDL), dumped beside oracle_sql.json so
    // the driver's type-sensitive hash gate and tools/check.py's DESCRIBE
    // type sweep share one recorded source of truth (r12's
    // multimodal_video_frames HUGEINT-vs-LONG bug class).
    val schemas = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // name → result row count, for tools/check.py's non-vacuity gate: a
    // 0-row result whose oracle is ALSO empty hashes green (empty ==
    // empty), which hid dedup_embedding_lsh_wide's dead 12-bit pin for
    // a round — the count makes emptiness visible to the harness.
    val rowCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // count from the WRITTEN parquet (metadata-bound), not the plan —
        // a second action on fn's DataFrame would recompute the query
        rowCounts += name -> spark.read.parquet(s"$outDir/$name").count()
        schemas += name -> df.schema.toDDL
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free operator-persisted intermediates; unpersistSpanCaches also
      // empties the span-cache registry so a long session doesn't retain
      // every window-table plan object (clearCache alone frees storage
      // but leaves the buffer growing)
      graft.ext.Dedup.unpersistSpanCaches()
      graft.ext.Multimodal.unpersistCaches()
      graft.ext.Analytics.unpersistCaches()
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // On a partial run (`only` set), MERGE into any existing recording
    // instead of clobbering it — a filtered local iteration would
    // otherwise shrink spark_schema.json to the subset and the next
    // full-file consumer (tools/check.py's type sweep) would lose the
    // other 170+ entries. Jackson is already on the Spark classpath.
    def writeMerged(path: String, fresh: collection.Map[String, String]): Unit = {
      val p = Paths.get(path)
      val prior: Map[String, String] =
        if (only.isDefined && Files.exists(p)) {
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
            .readValue(Files.readString(p), classOf[java.util.LinkedHashMap[String, String]])
          scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap
        } else Map.empty
      val merged = prior ++ fresh
      Files.writeString(p, merged.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    }
    writeMerged(s"$outDir/spark_schema.json", schemas)
    writeMerged(s"$outDir/rowcounts.json", rowCounts.map { case (k, v) => k -> v.toString })
    spark.stop()
  }
}
