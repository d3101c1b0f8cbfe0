package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's single-table surface
  * (SURVEY §2.3/§2.5 mark joins and window functions ABSENT in the
  * reference; they're required for the rebuild's correctness harness and
  * the extension pipeline). Everything here is built-in Catalyst — the
  * one genuinely missing operator, the as-of join, is composed from
  * union + ordered window rather than a custom SparkPlan because the
  * composition already yields the optimal distributed algorithm: one
  * shuffle on the key, one sort, no O(n·m) expansion.
  */
object Relational {

  /** Distributed as-of join: for each left row, the latest right row with
    * `rightTime <= leftTime` on the same key (the semantics the
    * reference's pivot substitutes for when aligning sensor streams —
    * SURVEY §2.3).
    *
    * Algorithm: tag and union both sides, hash-partition by key, sort by
    * (time, tag) within partitions, and carry the right side's payload
    * forward with `last(ignoreNulls)` over an unbounded-preceding window;
    * right rows sort before left rows at equal times, giving `<=`
    * (inclusive) semantics. Cost: ONE shuffle of n+m rows — the same
    * plan a native as-of SparkPlan would produce, so no custom strategy
    * is warranted (preference (a) of the build rules). Right-side ties at
    * identical (key, time) must be pre-deduplicated by the caller for
    * deterministic output.
    *
    * Inner semantics: left rows with no preceding right row are dropped;
    * pass `keepUnmatched = true` for left-join semantics.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      keepUnmatched: Boolean = false
  ): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val rightTagged = right.select(
      col(rightKey).as("__k"),
      col(rightTime).cast("timestamp").as("__t"),
      payload.as("__v"),
      lit(0).as("__src"))
    val payloadType = rightTagged.schema("__v").dataType

    val leftTagged = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__v", lit(null).cast(payloadType))
      .withColumn("__src", lit(1))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)

    val matched = if (keepUnmatched) joined else joined.filter(col("__v").isNotNull)
    val outCols = left.columns.map(col).toSeq ++
      payloadCols.map(c => col(s"__v.$c").as(c))
    matched.select(outCols: _*)
  }

  /** Top-k rows per group by a sort expression — `row_number <= k` over a
    * partitioned window; requires deterministic tie-breaks in `order`.
    */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
