package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout — the co-located join answer at
  * 100 TB. A fact table written `bucketBy(n, key)` is hash-partitioned
  * on disk once; every later equi-join or aggregation on that key reads
  * the buckets as its required distribution and skips the Exchange
  * entirely — the shuffle is paid once at ingest, not per query. With
  * `sortBy(key)` the per-bucket files are also sorted, so sort-merge
  * joins can skip their Sort. This is the storage-level counterpart of
  * the runtime techniques in SCALE.md (broadcast for small dims, AQE
  * skew splits for hot keys): reach for it when the SAME large-table
  * join key appears in query after query — e.g. `doc_id` across the
  * dedup/decontaminate/sample chain, or `list` for persisted IVF
  * buckets.
  *
  * The reference has no bucketing concept (its InfluxDB server owns
  * layout); this is engine-level capability the Spark build adds.
  */
object Bucketing {

  /** Write `df` into the session catalog as `table`, hash-bucketed and
    * per-bucket sorted by `key`. Parquet under the warehouse dir; both
    * sides of a future join must use the same bucket count (or an
    * integer multiple) for the exchange to be elided.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-key bucketed tables — plans with zero Exchange when
    * bucket counts line up (assert via `.explain`; BucketingSpec pins
    * it).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Range-sorted layout: `repartitionByRange(files, cols)` +
    * `sortWithinPartitions(cols)` + write — every output file covers a
    * DISJOINT range of the sort key, and rows inside each file are
    * sorted. Parquet footer min/max stats then prune file reads for
    * range predicates on those columns (the zone-map complement to
    * [[graft.operators.Zorder]]'s multi-dimension clustering: for ONE
    * dominant range column — time, id — straight range-sorting prunes
    * strictly better). Range boundaries come from Spark's reservoir
    * sampling of the key distribution, so files are ~equal-sized even
    * on skewed keys; `files` sizes the layout (target ≈ data /
    * desired-file-bytes at 100 TB).
    */
  def writeRangeSorted(df: DataFrame, path: String, cols: Seq[String], files: Int): Unit =
    df.repartitionByRange(files, cols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction — the maintenance pass every streaming /
    * upsert sink needs: micro-batch and dynamic-partition writers
    * fragment a table into thousands of KB-sized parquet files, and a
    * 100 TB scan then pays a task launch + footer read + non-contiguous
    * IO per file. Rewrites `inPath` into ceil(inputBytes /
    * targetFileBytes) files (floor 1), sized from the SOURCE's on-disk
    * bytes (compressed parquet → compressed parquet, so the ratio
    * carries over; no row sampling or driver-side data reads).
    *
    * `sortCols` optionally restores a range-sorted layout during the
    * rewrite ([[writeRangeSorted]] semantics — compaction is the
    * natural moment to recover clustering an incremental writer
    * destroyed); otherwise a round-robin `repartition(n)` packs files
    * evenly with a full-width shuffle-free exchange.
    *
    * Writes to `outPath` + atomic-swap is left to the caller's table
    * format (overwriting the live dir in place is only safe where the
    * catalog swaps pointers); this operator does the data movement.
    * Returns the file count written.
    */
  def compactFiles(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long,
      sortCols: Seq[String] = Nil
  ): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a Hive-partitioned layout has only subdirectories at the top level;
    // rewriting it here would flatten the partition layout (and a flat
    // listStatus would sum 0 bytes → 1 output file). Partitioned tables
    // must be compacted per-partition directory.
    require(
      !fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.contains("=")),
      s"$inPath is Hive-partitioned: compact each partition directory separately")
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) bytes += s.getLen
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // recursiveFileLookup so the data read agrees with the recursive byte
    // sum above — a plain read skips nested non-partition subdirectories
    // (leftover job dirs), which would make n oversized for the rows kept
    val df = spark.read.option("recursiveFileLookup", "true").parquet(inPath)
    if (sortCols.nonEmpty) writeRangeSorted(df, outPath, sortCols, n)
    else df.repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }
}
