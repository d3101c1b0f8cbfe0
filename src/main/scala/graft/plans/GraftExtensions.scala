package graft.plans

import graft.functions.DotProductExpr
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("... graft_dot(a, b) ...")` works alongside the Column
  * API. Two registration paths:
  *
  *   - [[GraftExtensions]] via `SparkSession.builder.withExtensions`
  *     (or `spark.sql.extensions=graft.plans.GraftExtensions`) — the
  *     deployment-config route;
  *   - [[GraftFunctions.register]] on a live session — the
  *     library/notebook route.
  *
  * Beyond functions it registers the whole-operator surface: the
  * nanos-pushdown optimizer rule, the top-k planner strategy, and (via
  * [[GraftPlanner.ensure]], because [[WindowTopKRewrite]] must run in
  * the LAST optimizer batch — after Spark's `InferWindowGroupLimit`
  * has inserted the node it matches — which `injectOptimizerRule`'s
  * operator-optimization slot cannot do) the window-top-k rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotFunction)
    e.injectFunction(GraftFunctions.cosineFunction)
    e.injectOptimizerRule(_ => NanosRangePushdown)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // the rewrite needs experimental.extraOptimizations (last batch);
    // hook session creation for it
    e.injectPostHocResolutionRule { session =>
      GraftPlanner.ensure(session)
      NoopResolutionRule
    }
  }
}

/** Carrier for the [[GraftExtensions]] session hook above — resolution
  * rules are the one extension point handed a live session at session
  * build time; this one only triggers [[GraftPlanner.ensure]] and
  * never alters a plan. */
object NoopResolutionRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan
}

object GraftFunctions {

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_dot(a, b) takes two array arguments")
      DotProductExpr(toDoubleArray(exprs.head), toDoubleArray(exprs(1)))
    })

  /** cosine = dot / (||a|| * ||b||), composed from three codegen dot
    * products — same formula as VectorOps.cosine, SQL-callable.
    */
  private def cosineExpr(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_cosine(a, b) takes two array arguments")
    val a = toDoubleArray(exprs.head)
    val b = toDoubleArray(exprs(1))
    Divide(
      DotProductExpr(a, b),
      Multiply(Sqrt(DotProductExpr(a, a)), Sqrt(DotProductExpr(b, b))))
  }

  val cosineFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "graft_cosine"),
    cosineExpr _)

  /** Register on an existing session (temp function scope). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProductExpr(toDoubleArray(exprs.head), toDoubleArray(exprs(1))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineExpr, "built-in")
  }
}
