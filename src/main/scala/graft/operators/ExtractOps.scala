package graft.operators

import graft.config.FilterSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's operator surface (SURVEY §2), each as a composable
  * `DataFrame => DataFrame`. The reference split these across a
  * server-side Flux pipeline and client-side pandas
  * (`/root/reference/src/database_extractor/database_extractor.py:291-298,
  * 335-355`); here they are one declarative Catalyst plan — range and row
  * filters reach the Parquet scan as pushed filters, column pruning is
  * automatic, and the window-last aggregation gets map-side partial
  * aggregation (SURVEY §4).
  */
object ExtractOps {

  /** P1 — `range(start:, stop:)`: half-open `[start, stop)` prune on the
    * time column (`database_extractor.py:292`). Pushed to Parquet
    * row-group stats / partition pruning by Catalyst; at 100 TB the table
    * should be date-partitioned on `to_date(timeCol)` so this prunes
    * whole partitions.
    */
  def timeRange(timeCol: String, startUtc: String, stopUtc: String)(df: DataFrame): DataFrame =
    df.filter(
      col(timeCol) >= to_timestamp(lit(startUtc), "yyyy-MM-dd'T'HH:mm:ss'Z'") &&
      col(timeCol) < to_timestamp(lit(stopUtc), "yyyy-MM-dd'T'HH:mm:ss'Z'"))

  /** P2/P3 — row filter from the reference's two documented filter forms
    * (`database_extractor.py:294`, `README.md:38-39`): regex match or
    * equality on one column. Parsed, never spliced as text (SURVEY §2.11).
    */
  def rowFilter(spec: FilterSpec)(df: DataFrame): DataFrame = spec match {
    case FilterSpec.Regex(c, pat) => df.filter(col(c).rlike(pat))
    case FilterSpec.Equals(c, v)  => df.filter(col(c) === lit(v))
  }

  def rowFilter(filterString: String)(df: DataFrame): DataFrame =
    rowFilter(FilterSpec.parse(filterString))(df)

  /** F4 — `timeShift(duration: Nh)` (`database_extractor.py:293`): shift
    * output timestamps by the tz offset so they read as local wall time.
    */
  def timeShift(timeCol: String, hours: Int)(df: DataFrame): DataFrame =
    if (hours == 0) df
    else df.withColumn(timeCol, col(timeCol) + expr(s"INTERVAL $hours HOURS"))

  /** P4 — negative projection; drop listed columns iff present, silently
    * skipping missing ones (`drop_columns`, `database_extractor.py:326-332`).
    * Spark's `drop` has exactly those semantics.
    */
  def dropCols(columns: Seq[String])(df: DataFrame): DataFrame =
    df.drop(columns: _*)

  /** R1 — pivot long→wide (`database_extractor.py:295`): one row per
    * `rowKey`, one column per distinct `columnKey` value, cells from
    * `valueCol`. Pass `knownKeys` whenever the key domain is known — it
    * skips the driver-side distinct-collect job Spark otherwise runs
    * (`spark.sql.pivotMaxValues` caps it at 10k); at 100 TB prefer
    * [[pivotWideMap]], which never widens the schema.
    */
  def pivotWide(
      rowKey: String,
      columnKey: String,
      valueCol: String,
      knownKeys: Option[Seq[String]] = None
  )(df: DataFrame): DataFrame = {
    val g = df.groupBy(col(rowKey))
    val p = knownKeys.fold(g.pivot(columnKey))(ks => g.pivot(columnKey, ks))
    p.agg(first(col(valueCol), ignoreNulls = true))
  }

  /** R1 at scale — the non-widening pivot: `map<columnKey, value>` per
    * row key. Constant-width schema regardless of key cardinality, no
    * driver-side key collection; the 100 TB escape hatch of SURVEY §7.4.1.
    */
  def pivotWideMap(
      rowKey: String,
      columnKey: String,
      valueCol: String
  )(df: DataFrame): DataFrame =
    df.groupBy(col(rowKey))
      .agg(map_from_entries(collect_list(struct(col(columnKey), col(valueCol)))).as("values"))

  /** A1/A2 — resample to a uniform grid, last non-null value per column
    * per bin (`resample(rule="1s").last()`, `database_extractor.py:347`).
    *
    * pandas `.last()` takes the last *non-null* per column; Spark's
    * `last(ignoreNulls)` is partition-order-sensitive, so instead use
    * `max_by(c, ts-where-c-non-null)` — order-independent, safe under
    * shuffles, and still a single hash aggregate with map-side partials.
    * Empty bins are never materialized (= Flux `createEmpty: false` and
    * the pandas `dropna(all)` composition, SURVEY §7.4.3).
    */
  def resampleLast(timeCol: String, every: String, valueCols: Seq[String])(df: DataFrame): DataFrame = {
    val aggs = valueCols.map { c =>
      max_by(col(c), when(col(c).isNotNull, col(timeCol))).as(c)
    }
    df.groupBy(window(col(timeCol), every).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select((col("w.start").as(timeCol) +: valueCols.map(col)): _*)
  }

  /** A2 in long format: per (bin, series) last value — the pre-pivot
    * variant used when the pivot is deferred or mapped ([[pivotWideMap]]).
    */
  def resampleLastLong(
      timeCol: String,
      every: String,
      seriesCol: String,
      valueCol: String
  )(df: DataFrame): DataFrame =
    df.groupBy(window(col(timeCol), every).as("w"), col(seriesCol))
      .agg(max_by(col(valueCol), when(col(valueCol).isNotNull, col(timeCol))).as(valueCol))
      .select(col("w.start").as(timeCol), col(seriesCol), col(valueCol))

  /** Gap-filled forward-fill resample: [[resampleLastLong]] plus the
    * empty bins the reference's `createEmpty: false` path never
    * materializes, each filled with the series' most recent value —
    * what a consumer of the 1 s grid wants when "no new point" means
    * "value unchanged" (sensor state) rather than "no data". Pure value
    * COPIES, no arithmetic, so the output hashes engine-identically.
    *
    * Scale shape: the dense grid is generated per series over that
    * series' OWN [min, max] span (`sequence` + explode — bounded by
    * span/every per series, never global-span x all-series), then one
    * window pass per series does the fill. Two shuffles total: the bin
    * aggregate and the series window.
    */
  def resampleFfill(
      timeCol: String,
      every: String,
      seriesCol: String,
      valueCol: String
  )(df: DataFrame): DataFrame = {
    val binned = resampleLastLong(timeCol, every, seriesCol, valueCol)(df)
    val grid = binned.groupBy(col(seriesCol))
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
      .select(col(seriesCol),
        explode(expr(s"sequence(__t0, __t1, interval $every)")).as(timeCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(seriesCol)).orderBy(col(timeCol))
      .rowsBetween(Long.MinValue, 0)
    grid.join(binned, Seq(seriesCol, timeCol), "left")
      .withColumn("__filled", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueCol).isNull)
      .select(col(timeCol), col(seriesCol), col("__filled").as(valueCol), col("is_gap"))
  }

  /** Linearly interpolated resample: like [[resampleFfill]] but interior
    * gaps take the lerp between the surrounding observed bins
    * (pandas `interpolate(method="linear")` on the reference's grid).
    * Every gap is interior by construction — the per-series grid spans
    * [min, max] of OBSERVED bins, so both neighbors always exist. The
    * lerp is `v0 + (v1 - v0) * (i / n)` with i, n exact bin-count
    * integers: the same IEEE op sequence in any engine, so results
    * hash identically. Same two-shuffle shape as the fill (bin
    * aggregate + series window).
    */
  def resampleInterp(
      timeCol: String,
      every: String,
      seriesCol: String,
      valueCol: String
  )(df: DataFrame): DataFrame = {
    val binned = resampleLastLong(timeCol, every, seriesCol, valueCol)(df)
    val grid = binned.groupBy(col(seriesCol))
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
      .select(col(seriesCol),
        explode(expr(s"sequence(__t0, __t1, interval $every)")).as(timeCol))
    val W = org.apache.spark.sql.expressions.Window
    val ordered = W.partitionBy(col(seriesCol)).orderBy(col(timeCol))
    val back = ordered.rowsBetween(Long.MinValue, 0)
    val fwd = ordered.rowsBetween(0, Long.MaxValue)
    grid.join(binned, Seq(seriesCol, timeCol), "left")
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__v0", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("__v1", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("__i0",
        last(when(col(valueCol).isNotNull, col("__rn")), ignoreNulls = true).over(back))
      .withColumn("__i1",
        first(when(col(valueCol).isNotNull, col("__rn")), ignoreNulls = true).over(fwd))
      .withColumn("is_gap", col(valueCol).isNull)
      .withColumn("__out",
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
            ((col("__rn") - col("__i0")).cast("double") /
              (col("__i1") - col("__i0")).cast("double"))))
      .select(col(timeCol), col(seriesCol), col("__out").as(valueCol), col("is_gap"))
  }

  /** P5 — `dropna(axis=0, how="all")` (`database_extractor.py:348`): drop
    * a row only when **every** value column is null (the time column is a
    * pandas index, excluded from the check — SURVEY §7.4.3).
    */
  def dropAllNull(valueCols: Seq[String])(df: DataFrame): DataFrame =
    df.na.drop("all", valueCols)

  /** O1 — multi-column ascending sort (`database_extractor.py:297`),
    * restricted to columns that exist (the reference's Flux sort ignores
    * unknown columns rather than failing).
    */
  def sortByCols(columns: Seq[String])(df: DataFrame): DataFrame = {
    val present = columns.filter(df.columns.contains)
    if (present.isEmpty) df else df.orderBy(present.map(c => col(c).asc): _*)
  }

  /** P6 — small-result guards (`database_extractor.py:337-343`,
    * `main.py:137,146`): `None` when below threshold. The count is the
    * only driver-side action in the pipeline, as in the reference.
    */
  def thresholdGuard(df: DataFrame, minRows: Long): Option[DataFrame] =
    if (df.count() < minRows) None else Some(df)

  /** S4 — CSV sink, daily file naming
    * (`prototype-zero_realtime-data_YYYY-MM-DD.csv`,
    * `database_extractor.py:350`). `coalesce(1)` mirrors the single-file
    * contract; at scale use [[writePartitionedByDay]] instead.
    */
  def writeDailyCsv(df: DataFrame, outDir: String, prefix: String, date: java.time.LocalDate): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/${prefix}_$date.csv")

  /** S5 — binary snapshot; parquet is the idiomatic stand-in for the
    * reference's pickle sink (`main.py:72`).
    */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** JSONL export — the lingua franca of LLM training-data handoff
    * (one JSON object per line; what tokenizer/trainer toolchains
    * ingest). Spark's json sink IS jsonl (one object per line, one
    * file per partition), so this is a thin, named wrapper plus gzip:
    * text compresses ~5×, and every downstream reader splits by file
    * anyway, so per-file gzip (not splittable within a file) costs
    * nothing when files are partition-sized.
    */
  def writeJsonl(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** The scale-path sink: one job for the whole range, partitioned by day
    * — replaces the reference's N-serial-queries backfill
    * (`main.py:140-149`) with a single shuffle (SURVEY §3.2).
    */
  def writePartitionedByDay(df: DataFrame, timeCol: String, path: String): Unit =
    df.withColumn("date", to_date(col(timeCol)))
      .write.mode("overwrite").partitionBy("date").parquet(path)

  /** Idempotent day upsert into a day-partitioned dataset: DYNAMIC
    * partition overwrite replaces only the partitions present in `df`
    * and leaves every other day untouched — so a cron re-run (late
    * data, a failed night retried) replaces its day instead of
    * duplicating it or truncating the table, the property a nightly
    * job needs to be safely re-entrant. Static overwrite (the
    * [[writePartitionedByDay]] default) would drop ALL days first.
    */
  def upsertDays(df: DataFrame, timeCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.withColumn("date", to_date(col(timeCol)))
        .write.mode("overwrite").partitionBy("date").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
