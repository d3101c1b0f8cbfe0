package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so the expressions stay inside whole-stage codegen and never leave
  * the Tungsten row format (build-rule preference (a) over a custom
  * Expression, which profiling hasn't yet justified).
  */
object VectorOps {

  /** Sequential-fold dot product in double precision, as a native
    * codegen expression ([[DotProductExpr]]) — the zip_with/aggregate
    * higher-order formulation costs one interpreted lambda call per
    * element, which dominated the all-pairs similarity bench (91 s →
    * ~2 s at sf0.1). Same left-to-right accumulation order, so results
    * are bit-identical to the HOF form and to external oracles.
    */
  def dot(a: Column, b: Column): Column = DotProductExpr.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null/zero-norm inputs yield null/NaN untouched —
    * callers filter.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than cosine when vectors are
    * pre-normalized: monotone-equivalent ranking).
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)
}
