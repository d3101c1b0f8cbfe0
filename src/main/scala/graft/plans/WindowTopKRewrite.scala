package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Auto-adoption of the native per-key top-k operator for the idiomatic
  * window spelling: users write
  * `row_number().over(partitionBy(key).orderBy(ord)) <= k` and get the
  * heap-based [[TopKPerKeyExec]] without calling [[TopKPerKey]].
  *
  * Spark's own `InferWindowGroupLimit` already proves the pattern — it
  * extracts the rank filter and inserts a logical [[WindowGroupLimit]]
  * below the Window — but plans it sort-based: `WindowGroupLimitExec`
  * requires a full (partition, order) local sort of ALL input rows on
  * both the partial and final passes. This rule runs after it (last
  * optimizer batch, `spark.experimental.extraOptimizations`) and swaps
  * the proven node for [[TopKPerKeyNode]]: O(n log k) heap comparisons
  * instead of an O(n log n) sort, bounded memory with the partial-pass
  * flush cap, and no sort below the exchange at all. The Window above
  * stays and recomputes `row_number` over the ≤k survivors — on grouped
  * data a sort over k-row groups, riding the exchange the final pass
  * already clustered.
  *
  * Only `row_number` rewrites: `rank`/`dense_rank` group limits must
  * keep MORE than k rows on order-ties, which a k-set cut would drop —
  * those stay on Spark's sort-based exec. Tie behavior within
  * `row_number` is arbitrary-but-k under both execs (Spark's partial
  * group limit already picks per-partition), so any query that was
  * deterministic before (total order) is bit-identical after.
  *
  * Kill switch: `spark.graft.topk.rewriteWindow=false` restores Spark's
  * plan — the escape hatch if a workload's heap constants lose to the
  * sort (e.g. k near the group size on presorted data).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topk.rewriteWindow", "true").toBoolean) plan
    else plan.transformUp {
      case WindowGroupLimit(part, order, _: RowNumber, limit, child) =>
        TopKPerKeyNode(part, order, limit, child)
    }
}

/** One-stop runtime registration of the engine's planner surface: the
  * top-k strategy (plans [[TopKPerKeyNode]]) and the window rewrite
  * (emits it). Registered together because a rule that emits a node
  * nobody plans would make queries unplannable. Idempotent and
  * synchronized — called from every [[graft.Tables]] read and from
  * [[TopKPerKey.apply]], so both the explicit API and the window
  * spelling work on an un-configured session; deployment configs get
  * the same pair via [[GraftExtensions]].
  */
object GraftPlanner {
  def ensure(spark: SparkSession): Unit = spark.experimental.synchronized {
    if (!spark.sessionState.planner.strategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations.contains(WindowTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowTopKRewrite
  }
}
