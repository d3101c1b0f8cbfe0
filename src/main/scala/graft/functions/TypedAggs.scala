package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer accumulator for [[WeightedMeanCents]]. */
case class WSum(wx: Long, w: Long)

/** Custom typed UDAF (the §2.11 aggregate surface): weight-weighted
  * mean of an integer-cents amount. The accumulator is two exact Long
  * sums — associative, commutative, overflow-safe to ~9e18 cent-units
  * — so partial aggregation (map-side combine) and any shuffle order
  * give the same state, and the single final `(Σwx / 100) / Σw`
  * IEEE-division pair is engine-identical: a DOUBLE-returning
  * aggregate that still hash-matches an external oracle. The pattern
  * to copy for any money/metric UDAF under an exactness contract
  * (same rule as q5_multi_join's revenue — SCALE.md "Money/metric
  * aggregation").
  *
  * Input is (cents, weight); discretize upstream with
  * `floor(x * 100 + 0.5)` — IEEE-exact, see COVERAGE.md's float rule.
  */
object WeightedMeanCents extends Aggregator[(Long, Long), WSum, Double] {
  override def zero: WSum = WSum(0L, 0L)
  override def reduce(b: WSum, a: (Long, Long)): WSum =
    WSum(b.wx + a._1 * a._2, b.w + a._2)
  override def merge(x: WSum, y: WSum): WSum = WSum(x.wx + y.wx, x.w + y.w)
  override def finish(r: WSum): Double =
    if (r.w == 0) Double.NaN else r.wx.toDouble / 100.0 / r.w.toDouble
  override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
