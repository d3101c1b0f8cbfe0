package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: the slowly-changing-dimension
  * (SCD type 2) merge a CDC / batch-upsert pipeline runs on every
  * load. The reference extractor only appends daily files
  * (`database_extractor.py` save path); an engine serving the same
  * data at 100 TB also needs the UPDATE path, and on an immutable
  * columnar store that is exactly the merge-into rewrite below.
  */
object Warehouse {

  /** Open-row sentinel: avoids NULL `valid_to` so every row hashes and
    * sorts identically across engines.
    */
  val OpenEnd = "9999-12-31"

  /** SCD2 merge of an update batch into a versioned dimension.
    *
    * `current` carries (`keyCol`, attrCols…, `valid_from`, `valid_to`,
    * `is_current`); `updates` carries (`keyCol`, attrCols…). Semantics
    * (the standard merge-into pair):
    *
    *   - key in both, any attribute changed → the open row is CLOSED
    *     (`valid_to` = `batchDate`, `is_current` = false) and a new
    *     open row with the update's attributes is appended
    *     (`valid_from` = `batchDate`).
    *   - key only in `updates` → INSERT as a new open row.
    *   - key unchanged or absent from `updates` → carried through
    *     untouched; closed history rows are never revisited.
    *
    * Scale shape: ONE shuffle — the full-outer equi-join of the open
    * rows against the batch on the dimension key; history rows ride a
    * union with no exchange (history is typically the large part of an
    * SCD2 table, and this plan never shuffles it). The change test is
    * row-local. Updates are assumed key-unique (CDC compaction
    * upstream), so the join never multiplies rows.
    */
  def scd2Merge(
      current: DataFrame,
      updates: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      batchDate: String
  ): DataFrame = {
    val outCols = (Seq(keyCol) ++ attrCols ++ Seq("valid_from", "valid_to", "is_current")).map(col)

    val open = current.filter(col("is_current"))
    val history = current.filter(!col("is_current"))

    val u = updates.select(
      col(keyCol).as("u_key") +: attrCols.map(a => col(a).as(s"u_$a")): _*)
    val joined = open.join(u, col(keyCol) === col("u_key"), "full_outer")

    val matched = col(keyCol).isNotNull && col("u_key").isNotNull
    val changed = matched && attrCols
      .map(a => col(a) =!= col(s"u_$a"))
      .reduce(_ || _)

    // untouched open rows: no update, or update carries identical attrs
    val carried = joined.filter(col(keyCol).isNotNull && !changed).select(outCols: _*)

    val closedRows = joined.filter(changed).select(
      (Seq(col(keyCol)) ++ attrCols.map(col) ++ Seq(
        col("valid_from"),
        lit(batchDate).as("valid_to"),
        lit(false).as("is_current"))): _*)

    val openedRows = joined
      .filter(changed || (col(keyCol).isNull && col("u_key").isNotNull))
      .select(
        (Seq(col("u_key").as(keyCol)) ++ attrCols.map(a => col(s"u_$a").as(a)) ++ Seq(
          lit(batchDate).as("valid_from"),
          lit(OpenEnd).as("valid_to"),
          lit(true).as("is_current"))): _*)

    history.select(outCols: _*)
      .unionByName(carried)
      .unionByName(closedRows)
      .unionByName(openedRows)
  }

  /** Mergeable aggregate state — incremental view maintenance for the
    * decomposable aggregates (count/sum/min/max). At 100 TB the
    * history is never re-read: each load materializes its batch's
    * state with [[aggState]], [[mergeStates]] folds it into the
    * standing state (both are one hash aggregate), and
    * [[finalizeMean]] answers from state alone. The algebra is the
    * same partial/final split Spark's own HashAggregate uses —
    * materialized across JOBS instead of stages.
    *
    * Values are integer (centi-discretized upstream) so merged sums
    * are exact under any batch split/order — associativity is real,
    * not approximate.
    */
  def aggState(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("s_cnt"), sum(col(valueCol)).as("s_sum"),
        min(col(valueCol)).as("s_min"), max(col(valueCol)).as("s_max"))

  /** Fold any number of state tables into one (associative + commutative). */
  def mergeStates(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("s_cnt").as("s_cnt"), sum("s_sum").as("s_sum"),
        min("s_min").as("s_min"), max("s_max").as("s_max"))

  /** Answer count/sum/min/max/mean from state alone (mean in exact
    * micro units of the underlying integer measure).
    */
  def finalizeMean(state: DataFrame): DataFrame =
    state.select(state.columns.map(col) :+
      expr("(s_sum * 1000000) div s_cnt").as("mean_micro"): _*)

  /** Mergeable DISTINCT-count state — the non-decomposable aggregate
    * [[aggState]] can't carry. COUNT(DISTINCT) is not algebraic (two
    * batch counts don't add), so incremental maintenance stores a
    * DataSketches HLL sketch per key instead: `distinctState` builds a
    * batch's sketches, [[mergeDistinctStates]] folds any number of
    * state tables (register-wise max — associative, commutative,
    * idempotent, so replayed batches can't inflate the answer), and
    * [[finalizeDistinct]] reads the estimate. At 100 TB this is the
    * standard "distinct users per day, any date range, without
    * re-scanning history" layout: a few KB per (key, batch) regardless
    * of cardinality, vs an exact distinct that re-shuffles every load.
    */
  def distinctState(
      df: DataFrame, keyCols: Seq[String], valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("s_hll"))

  /** Fold distinct-count states (sketch union; same lgK by construction). */
  def mergeDistinctStates(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("s_hll")).as("s_hll"))

  /** Estimated distinct count from state alone. */
  def finalizeDistinct(state: DataFrame): DataFrame =
    state.select(state.columns.filterNot(_ == "s_hll").map(col) :+
      hll_sketch_estimate(col("s_hll")).as("distinct_est"): _*)

  /** Mergeable QUANTILE state — the other non-decomposable staple
    * [[aggState]] can't carry (p50/p95/p99 latency boards). Exact
    * percentiles need a global sort per refresh; the incremental
    * layout instead keeps a fixed-width integer histogram per key:
    * `histogramState` buckets a batch's (already integer-discretized)
    * values into `binWidth`-wide bins and counts — one hash aggregate,
    * state bounded by value range / binWidth per key regardless of row
    * count. [[mergeHistogramStates]] folds states by summing per-bin
    * counts (associative + commutative, exact under any batch split).
    * [[finalizeQuantiles]] answers any permille from state alone: the
    * first bin where the cumulative count covers p‰ of the total,
    * reported as the bin's lower edge — a deterministic integer both
    * engines compute identically, with error bounded by `binWidth` by
    * construction (vs the unbounded rank error of a mis-merged
    * sketch). Values are assumed non-negative (integer `div` ==
    * floor); the per-key cumulative window runs over the BIN table,
    * bounded by bins-per-key, never the row count.
    */
  def histogramState(
      df: DataFrame, keyCols: Seq[String], valueCol: String, binWidth: Long): DataFrame =
    df.groupBy(keyCols.map(col) :+ expr(s"$valueCol div ${binWidth}L").as("s_bin"): _*)
      .agg(count(lit(1)).as("s_cnt"))

  /** Fold histogram states (per-bin count sum; same binWidth by construction). */
  def mergeHistogramStates(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy((keyCols :+ "s_bin").map(col): _*)
      .agg(sum("s_cnt").as("s_cnt"))

  /** Quantile read from histogram state alone: for each requested
    * permille, the lower edge of the first bin whose cumulative count
    * reaches ceil(p‰ · total). Long format: (keys…, p_permille,
    * q_value) — integer-exact in both engines.
    */
  def finalizeQuantiles(
      state: DataFrame, keyCols: Seq[String], permilles: Seq[Int], binWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCols.map(col): _*)
    val cum = state
      .withColumn("cum", sum("s_cnt").over(byKey.orderBy(col("s_bin"))))
      .withColumn("total", sum("s_cnt").over(byKey))
    cum
      .withColumn("p_permille", explode(array(permilles.map(p => lit(p)): _*)))
      .filter(col("cum") * 1000 >= col("p_permille") * col("total"))
      .groupBy((keyCols :+ "p_permille").map(col): _*)
      .agg((min("s_bin") * binWidth).as("q_value"))
  }

  /** Snapshot diff — the change-data-capture feed derived from two
    * immutable snapshots when the source system emits none: rows only
    * in `newDf` → `added`, only in `oldDf` → `removed`, in both with
    * any tracked attribute differing → `changed` (old and new values
    * side by side); unchanged rows are dropped. The everyday uses are
    * reconciliation (what did last night's load actually change?) and
    * feeding incremental consumers from full-dump sources.
    *
    * Scale shape: ONE shuffle per side — the full-outer equi-join on
    * the key; the change test is row-local. Diff output is
    * proportional to the churn, not the table. If both snapshots are
    * written bucketed on the key ([[graft.operators.Bucketing]]), the
    * join plans with zero Exchange and the diff is a map-side merge.
    * Keys are assumed unique per snapshot (it is a snapshot, not a
    * log), so the join never multiplies rows.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      trackedCols: Seq[String]
  ): DataFrame = {
    val o = oldDf.select(
      col(keyCol).as("o_key") +: trackedCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select(
      col(keyCol).as("n_key") +: trackedCols.map(c => col(c).as(s"new_$c")): _*)
    val joined = o.join(n, col("o_key") === col("n_key"), "full_outer")
    // null-SAFE change test: a tracked column going null <-> non-null
    // IS a change; plain =!= would yield null and silently drop the row
    val changed = trackedCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("o_key").isNull, "added")
          .when(col("n_key").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change_type").isNotNull)
      .select(
        coalesce(col("o_key"), col("n_key")).as(keyCol) +:
          col("change_type") +:
          trackedCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
