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
}
