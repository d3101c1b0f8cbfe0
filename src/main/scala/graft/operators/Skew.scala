package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys. AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default)
  * handles sort-merge joins at runtime; explicit salting is still
  * needed when (a) the skew is in an aggregation, or (b) the join
  * strategy isn't SMJ. Both helpers here are deterministic — the salt
  * derives from a caller-chosen uniform column, never from rand().
  */
object Skew {

  /** Salted inner equi-join: the left (large, skewed) side gets a
    * deterministic salt in [0, salts) hashed from `saltSource` (any
    * roughly-uniform left column, e.g. a row id); the right side is
    * replicated once per salt. A hot key's rows then spread over
    * `salts` shuffle partitions instead of one. Right-side rows
    * multiply by `salts` — keep the right side the smaller input.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int = 16
  ): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for skewed group
    * keys: aggregate (key, salt) first — spreading a hot key across
    * partitions — then merge the partials per key. `partialAggs` must
    * be decomposable (sum/count/min/max: merge = same function;
    * avg: decompose into sum+count before calling).
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      saltSource: Column,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      salts: Int = 16
  ): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
}
