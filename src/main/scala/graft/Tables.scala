package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data (TESTDATA.md).
  * At 100 TB these would be date-partitioned directories / a catalog
  * table; the read call is the only thing that changes.
  */
object Tables {

  /** Schema catalog: parquet footer schema per table path, inferred
    * once per JVM from the file itself and replayed into every later
    * read via `.schema(...)` — the role a production catalog
    * (metastore / Iceberg manifest) plays. Without it EVERY DataFrame
    * construction pays a driver-side footer-inference pass plus its
    * 1-task schema job (~0.05–0.1 s), once per table per query — pure
    * metadata overhead across a 200-query suite. Data is still read
    * from parquet on every invocation; only the schema (metadata,
    * deterministic per fixture file) is reused. Keyed by full path, so
    * fixtures can never serve each other's schemas; `events.ts`'s
    * conf-dependent encoding is safe because every events read funnels
    * through [[events]], which pins `nanosAsLong` before first touch.
    *
    * ASSUMPTION (r21 ADVICE): fixture files are immutable for the JVM's
    * lifetime — the cache has no invalidation and is shared across
    * SparkSessions, so a parquet regenerated IN PLACE mid-JVM would be
    * read with the stale schema. That holds for every caller here (the
    * driver writes fixtures before launching, specs create fresh temp
    * paths); a long-lived service over mutable tables would key this on
    * (path, mtime, length) or use a real catalog instead.
    */
  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every query path passes through here — make sure the native
    // planner surface (top-k strategy + window-topk rewrite) is live
    graft.plans.GraftPlanner.ensure(spark)
    val path = s"$dir/$name.parquet"
    val sch = schemas.computeIfAbsent(path, _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** `events.ts` has shipped in different encodings across driver
    * rounds: Parquet INT64 TIMESTAMP(NANOS) (FIXTURES.md §B, rounds
    * 1-9) and TIMESTAMP_NTZ micros (isAdjustedToUTC=0, since round
    * 10). The nanos layout is rejected by Spark's vectorized reader —
    * read it as raw longs via the legacy conf and convert with integer
    * division (`ts div 1000` stays in Long; a double division would
    * lose precision above 2^53 ns). NTZ/TZ pass through untouched —
    * downstream consumers that need an epoch (`unix_micros`, BIGINT
    * casts, `withWatermark`) hop through `.cast("timestamp")`, a no-op
    * on TZ and value-preserving on NTZ under the pinned UTC session
    * tz. TsEncodingSpec pins all three encodings end-to-end.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // time-range filters on the converted column are opaque to the
    // parquet scan; this rule adds widened raw-nanos bounds that reach
    // row-group stats (see NanosRangePushdown)
    if (!s.experimental.extraOptimizations.contains(graft.plans.NanosRangePushdown))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.NanosRangePushdown
    val raw = table(s, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
