package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The driver's testdata has shipped `events.ts` in THREE encodings
  * across rounds: Parquet INT64 TIMESTAMP(NANOS) (read as raw longs —
  * r1-r9), TIMESTAMP_NTZ micros (isAdjustedToUTC=0 — r10), and plain
  * TIMESTAMP is what any Spark job writes. The r10 regeneration broke 3
  * registered queries and 14 tests at once; this spec makes the suite
  * encoding-proof by staging the SAME fixture in all three layouts and
  * asserting (a) every registered query analyzes against each, and
  * (b) a sampled events-heavy subset returns identical values.
  */
class TsEncodingSpec extends SparkSuite {

  private val src = "/root/testdata/sf0.001"

  /** Stage a full fixture dir: symlink every table, replace events with
    * the requested ts encoding.
    */
  private def stage(encode: DataFrame => DataFrame): String = {
    val dir = tempDir("graft-enc")
    val srcDir = new java.io.File(src)
    srcDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      if (f.getName != "events.parquet")
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(dir, f.getName), f.toPath)
    }
    // Tables.events normalizes whatever the driver currently ships to a
    // session-tz view; re-encode from that canonical form
    encode(Tables.events(spark, src))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nanosDir = stage(
    _.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L))
  private lazy val ntzDir = stage(
    _.withColumn("ts", col("ts").cast("timestamp_ntz")))
  private lazy val utcDir = stage(
    _.withColumn("ts", col("ts").cast("timestamp")))

  private val encodings = Seq("long-nanos" -> (() => nanosDir),
    "ntz-micros" -> (() => ntzDir), "utc-micros" -> (() => utcDir))

  test("every registered query analyzes under all three ts encodings") {
    for ((enc, dir) <- encodings) {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, dir()).queryExecution.assertAnalyzed(); None }
        catch { case e: Throwable => Some(s"[$enc] $name: ${e.getMessage.take(120)}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }

  /** Collect with timestamp columns normalized to epoch micros so NTZ
    * and TZ outputs (equal under the pinned UTC session tz) compare as
    * the same values; order-canonicalized for ties.
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          unix_micros(col(f.name).cast("timestamp")).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*).collect().map(_.toSeq.mkString("|")).toSeq.sorted
  }

  test("events-heavy queries return identical values under all three encodings") {
    // every ts-consuming family: range filter, tumbling/hopping windows,
    // RANGE-frame rolling stats, gap detection, resample, sessions,
    // tz shift, the flagship daily extract
    val sample = Seq("time_range_filter", "window_agg_1h", "hopping_window_agg",
      "rolling_user_stats", "series_gaps", "resample_last_long", "sessionize",
      "time_shift", "daily_extract")
    val missing = sample.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"sample names drifted from the registry: $missing")
    for (name <- sample) {
      val Seq(a, b, c) = encodings.map { case (_, dir) =>
        canon(SparkEntry.queries(name)(spark, dir()))
      }
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a == b, s"$name: long-nanos vs ntz-micros results differ")
      assert(b == c, s"$name: ntz-micros vs utc-micros results differ")
    }
  }
}
