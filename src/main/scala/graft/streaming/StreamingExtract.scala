package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Genuine streaming variant of the reference's daily extract. The
  * reference's "realtime" path is a midnight cron batch over the
  * previous day with no late-data story (a point arriving after the
  * cron run is never extracted —
  * `/root/reference/main.py:39-41`, SURVEY §2.10). Structured Streaming
  * replaces it: incremental source → event-time watermark (late data
  * within the horizon is aggregated correctly, later drops are
  * explicit) → windowed last-value aggregation → partitioned sink with
  * exactly-once file commits via checkpointing.
  *
  * Scale notes: state size is bounded by (watermark horizon / window)
  * x active series — keep the watermark as tight as ingestion lag
  * allows; the sink's `partitionBy(date)` reproduces the reference's
  * daily-file layout without a driver loop.
  */
object StreamingExtract {

  /** Normalize an event-time column for watermarking: `withWatermark`
    * requires TIMESTAMP, and the driver's parquet encodes `ts` as
    * TIMESTAMP_NTZ (naive micros). NTZ→TZ is value-preserving under
    * the pinned UTC session tz and a no-op when already TIMESTAMP, so
    * every watermark path funnels through this one cast.
    */
  private def eventTime(df: DataFrame, timeCol: String): DataFrame =
    df.withColumn(timeCol, col(timeCol).cast("timestamp"))

  /** Incremental source over a parquet directory (files appearing in
    * `path` are discovered per micro-batch). Schema must be supplied —
    * streaming reads don't infer.
    */
  def source(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The reference pipeline's streaming core: per-(window, series) last
    * value with an event-time watermark. `max_by(value, time)` keeps the
    * aggregation order-independent across micro-batches exactly as in
    * the batch path (ExtractOps.resampleLastLong).
    */
  def resampleLastStream(
      df: DataFrame,
      timeCol: String,
      seriesCol: String,
      valueCol: String,
      every: String = "1 second",
      watermark: String = "1 hour"
  ): DataFrame =
    eventTime(df, timeCol).withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), every).as("w"), col(seriesCol))
      .agg(
        max_by(col(valueCol), col(timeCol)).as(valueCol),
        count(lit(1)).as("n_points"))
      .select(col("w.start").as(timeCol), col(seriesCol), col(valueCol), col("n_points"))

  /** Streaming HOPPING-window aggregate: overlapping windows (length
    * `windowLen`, sliding every `slide`) per group — the dashboard
    * shape ("events in the trailing hour, refreshed every 15 min").
    * State is one aggregate row per open (window, group); each window
    * finalizes and evicts when the watermark passes its end, exactly
    * like tumbling windows — overlap multiplies the row replication
    * (windowLen/slide ×) in the map stage, not the state lifetime.
    * Window starts are emitted as epoch seconds (the batch
    * `hopping_window_agg` contract).
    */
  def hoppingAggStream(
      df: DataFrame,
      timeCol: String,
      groupCol: String,
      valueCol: String,
      windowLen: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "1 hour"
  ): DataFrame =
    eventTime(df, timeCol).withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLen, slide).as("w"), col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"))
      .select(col("w.start").cast("long").as("ws_sec"),
        col(groupCol), col("n"), col("sum_v"))

  /** Streaming exact dedup: drop rows whose key was already seen within
    * the watermark horizon — the ingest-time guard of the batch dedup
    * family (ext/Dedup). State is keyed by `keyCols` and expires with
    * the watermark, so memory is (horizon x arrival rate), independent
    * of history. Dedup by content: pass `md5(text)` (or a MinHash band
    * key) as the key column. Stateless operators (hash sampling, PII
    * scrub, quality scores) need no streaming variant — the same
    * Column expressions run unchanged on a stream.
    */
  def dedupStream(
      df: DataFrame,
      timeCol: String,
      keyCols: Seq[String],
      watermark: String = "1 hour"
  ): DataFrame =
    eventTime(df, timeCol).withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join: each left event matched to right
    * events with the same key arriving within `[0, within]` after it —
    * e.g. clicks joined to the purchases they led to. Both sides carry
    * event-time watermarks and the time bound is part of the JOIN
    * condition, so Spark can expire join state: left rows are held for
    * watermark + `within`, right rows for the watermark — state is
    * (horizon x arrival rate) per side, independent of history. An
    * unbounded-condition stream join would accumulate forever; the
    * interval bound is what makes the operator viable at 100 TB/day.
    * Output columns are prefixed `l_` / `r_`.
    */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      within: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame = {
    val l = eventTime(left.toDF(left.columns.map("l_" + _): _*), s"l_$timeCol")
      .withWatermark(s"l_$timeCol", watermark)
    val r = eventTime(right.toDF(right.columns.map("r_" + _): _*), s"r_$timeCol")
      .withWatermark(s"r_$timeCol", watermark)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$timeCol") >= col(s"l_$timeCol") &&
        col(s"r_$timeCol") <= col(s"l_$timeCol") + expr(s"INTERVAL $within"))
  }

  /** File sink with the daily layout (`partitionBy(date)`), append mode
    * (only watermark-closed windows are emitted — the streaming
    * equivalent of the reference's end-of-day CSV).
    */
  def startFileSink(
      agg: DataFrame,
      timeCol: String,
      outPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    agg.withColumn("date", to_date(col(timeCol)))
      .writeStream
      .outputMode("append")
      .partitionBy("date")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .start(outPath)
}
