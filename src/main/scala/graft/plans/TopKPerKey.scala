package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.GraftShim

/** Whole-operator Catalyst extension (SURVEY §4 preference tier (c)):
  * per-key top-k as a custom LogicalPlan + SparkStrategy + SparkPlan.
  *
  * The DataFrame spelling — `row_number().over(partitionBy(key).orderBy
  * (...)) <= k` — plans as WindowExec: shuffle on the key, then SORT
  * THE ENTIRE PARTITION by (key, order) and buffer it, even though all
  * but k rows per key are discarded. This operator keeps the same
  * shuffle (ClusteredDistribution on the key) but replaces the full
  * sort with one bounded max-heap per key: O(n log k) comparisons, and
  * memory O(distinct keys in partition × k rows) instead of the whole
  * partition — the difference between "buffer 100 TB / shard" and
  * "hold k rows per key" on a hot-key table scan.
  *
  * Correctness contract: `order` must be a TOTAL order over the rows
  * (include a unique tiebreaker, e.g. the primary key) — ties are
  * resolved by heap arrival order otherwise, which is
  * partitioning-dependent. The operator emits the top-k SET per key
  * (first k rows under `order`), with no rank column and no emission-
  * order guarantee; sort downstream if presentation order matters.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan
) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** `partial = true` is the MAP-SIDE pass (no distribution requirement,
  * runs before the exchange): each map partition keeps its own per-key
  * heaps, cutting shuffle volume from all rows to ≤ keys×k rows per
  * map partition — the same two-phase shape as partial aggregation,
  * and the part that matters most at 100 TB (top-k of a union is the
  * top-k of per-partition top-k's, so the final pass stays exact).
  *
  * Memory bound: the partial map holds one key row + ≤k data rows PER
  * DISTINCT KEY seen, so on near-unique keys (top-k over an almost-
  * distinct key — the `dedup_exact_rows` shape on a low-duplication
  * corpus) an uncapped map would approach partition size with no
  * spill path. The partial pass therefore FLUSHES: when the map
  * exceeds `spark.graft.topk.partialMaxKeys` (default 65536) distinct
  * keys, it emits every buffered heap downstream and restarts empty.
  * Early emission is always correct — the final pass re-cuts the
  * union — it only costs shuffle volume, and only when key cardinality
  * is high enough that the partial cut was not paying for itself
  * anyway (a flushing partial degrades gracefully toward pass-
  * through). Peak memory is thus ≤ maxKeys×(k+1) rows regardless of
  * key cardinality; the `partialFlushes` SQLMetric makes the behavior
  * observable (PlansSpec pins it). The FINAL pass never flushes — it
  * must hold each clustered key's single heap to stay exact, and after
  * the partial cut its input is already ≤ keys×k rows. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Final pass: all surviving rows of a key must meet in one partition
    * for a global per-key answer; Catalyst inserts the hash Exchange
    * (or reuses a compatible distribution — e.g. bucketed layout).
    * Partial pass: runs wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override lazy val metrics = Map(
    "partialFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial map flushes (cap exceeded)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    // key cap applies ONLY to the partial pass; the final pass must hold
    // each clustered key's heap to stay exact (its input is already cut)
    val maxKeys =
      if (partial) conf.getConfString("spark.graft.topk.partialMaxKeys", "65536").toInt
      else Int.MaxValue
    val flushMetric = longMetric("partialFlushes")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap per key under `ord`: head is the WORST retained row,
      // replaced when a strictly better row arrives
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      def drain(): Iterator[InternalRow] = {
        val snap = heaps.values.toArray
        heaps.clear()
        snap.iterator.flatMap(_.iterator)
      }
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        private def advance(): Unit = {
          while (!out.hasNext && !inputDone) {
            var flushed = false
            while (iter.hasNext && !flushed) {
              val row = iter.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case Some(heap) =>
                  if (heap.size < kk) heap.enqueue(row.copy())
                  else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
                case None =>
                  if (heaps.size >= maxKeys) {
                    // cap hit on a NEW key: emit everything buffered and
                    // restart — the final pass re-cuts, so early emission
                    // trades shuffle volume for a hard memory bound
                    flushMetric += 1
                    out = drain()
                    flushed = true
                  }
                  val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
                  h.enqueue(row.copy())
                  heaps.put(key.copy(), h)
              }
            }
            if (!flushed) { inputDone = true; out = drain() }
          }
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node; injected via `GraftExtensions`
  * (injectPlannerStrategy) or at runtime through
  * `spark.experimental.extraStrategies` (what [[TopKPerKey.apply]]
  * does, so the operator works on un-configured sessions too). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      // two-phase: map-side partial cut, exchange (inserted by the
      // final's distribution requirement), exact final pass
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top-k rows per key group under a TOTAL order (include a unique
    * tiebreaker column). `orderSpec` = (column, descending?) pairs,
    * with Spark's default null ordering (desc → NULLS LAST, asc →
    * NULLS FIRST — the same as `col.desc`/`col.asc` in the window
    * spelling). Output columns = input columns (the top-k set).
    *
    * Catalyst SortOrders are built directly from attribute names
    * rather than accepting `Column`s: a `Column.desc` carries an
    * internal (connect-style) sort node that only converts at the
    * standard Dataset API boundary — inside a custom logical node it
    * would survive to execution unresolved and unserializable.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    GraftPlanner.ensure(spark)
    val sortOrder = orderSpec.map { case (name, desc) =>
      if (desc)
        SortOrder(UnresolvedAttribute(name), org.apache.spark.sql.catalyst.expressions.Descending)
      else
        SortOrder(UnresolvedAttribute(name), org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftShim.ofRows(spark,
      TopKPerKeyNode(
        keyCols.map(UnresolvedAttribute(_)), sortOrder, k,
        GraftShim.logicalPlan(df)))
  }
}
