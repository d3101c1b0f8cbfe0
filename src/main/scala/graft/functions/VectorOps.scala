package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns — no UDFs; every
  * op is a compiled codegen expression ([[DotProductExpr]],
  * [[VecExprs]]), so the hot paths stay inside whole-stage codegen and
  * never leave the Tungsten row format. (History: these started as
  * `zip_with`/`aggregate` higher-order functions, whose per-element
  * interpreted lambdas dominated profile after profile — dot in r8,
  * l2sq/l2normalize in r22; each compiled form keeps the HOF's exact
  * fold order, so results are bit-identical.)
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

  /** Cosine similarity. NOT total: under ANSI mode (the Spark 4
    * default) a zero-norm input is a runtime DIVIDE_BY_ZERO error, so
    * callers must exclude zero-norm rows first (the LSH/ANN operators'
    * contract) or use [[cosineSafe]] when the operator's output must
    * still cover such rows.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine that is TOTAL on zero-norm inputs: 0.0 instead of an ANSI
    * divide-by-zero. A zero vector has no direction — scoring it
    * orthogonal-by-convention keeps τ-threshold comparisons false and
    * rank positions last instead of killing the job (or, pre-ANSI,
    * producing a NaN that sorts ABOVE every real score). The division
    * sits in the `otherwise` branch, so codegen never executes it on
    * the guarded rows. DuckDB oracle spelling: `COALESCE(cos, 0.0)`
    * (DuckDB's x/0 is NULL).
    */
  def cosineSafe(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === lit(0.0), lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Row-local L2 normalization to a unit `array<double>` — the step
    * that makes L2 ranking monotone in cosine (‖a−b‖² = 2 − 2·cos on
    * unit vectors), i.e. what lets the PQ tier answer the ANN family's
    * COSINE contract through its L2 ADC tables. Division and sqrt are
    * IEEE-exact, so the oracle's `x / sqrt(Σx²)` spelling is
    * bit-identical on every surviving (norm > 0) row.
    *
    * TOTAL on zero-norm rows (they map to the zero vector) even though
    * every caller excludes them first: the optimizer can evaluate this
    * projection on PRE-filter rows — `InferFiltersFromGenerate` pushes
    * a `size(transform(...)) > 0` predicate below a posexplode and
    * past the caller's zero-norm filter, where an unguarded ANSI
    * division kills the job on the very row the filter was about to
    * drop (hit by pqTrainCodebooks' component explode). The division
    * sits in the `otherwise` branch, so it never executes on guarded
    * rows.
    */
  def l2normalize(a: Column): Column = VecExprs.l2normalize(a)

  /** Squared L2 distance (cheaper than cosine when vectors are
    * pre-normalized: monotone-equivalent ranking). Compiled
    * ([[L2SqExpr]]) since r22 — the `aggregate(zip_with(...))` HOF
    * spelling evaluated interpreted lambdas per element in every
    * query×centroid probe ranking; same fold order, bit-identical.
    */
  def l2sq(a: Column, b: Column): Column = VecExprs.l2sq(a, b)
}
