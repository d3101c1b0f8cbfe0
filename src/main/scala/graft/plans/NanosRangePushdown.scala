package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Recovers predicate pushdown across the raw-nanos timestamp
  * conversion.
  *
  * The `events` table stores INT64 TIMESTAMP(NANOS), which Spark reads
  * as a raw long; `Tables.events` converts it with
  * `timestamp_micros(ts div 1000)`. A time-range filter on the
  * converted column — `timestamp_micros(ts div 1000) >= T` — is opaque
  * to the Parquet scan: `.explain` shows only `IsNotNull` in
  * PushedFilters, so every row group is read. At 100 TB that is the
  * difference between scanning a day and scanning years.
  *
  * This rule finds such comparisons among a Filter's top-level
  * conjuncts and ADDS a widened raw-column bound alongside them
  * (`ts >= (m-1)*1000` for lower bounds, `ts <= (m+1)*1000` for upper
  * bounds, m = the literal in micros). Adding a conjunct — rather than
  * replacing — keeps the rewrite trivially sound: the original exact
  * predicate still runs post-scan, the widened bound (1 µs slack, and
  * valid under both floor and truncating division, any sign) is what
  * reaches the Parquet row-group statistics.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations` (runtime; done by
  * `Tables.events`). Physical pushdown happens at planning time from
  * the optimized Filter, so a late optimizer batch is early enough.
  *
  * Encoding-specific BY DESIGN: this rule only exists for the
  * long-nanos layout. The TIMESTAMP_NTZ layout (the driver's encoding
  * since r10) needs no help — an NTZ range predicate reaches
  * PushedFilters natively (type coercion folds the literal instead of
  * casting the scanned column; pinned by ScaleBehaviorSpec "ntz
  * time-range filter reaches PushedFilters"), as do TIMESTAMP(ms/us)
  * columns.
  */
object NanosRangePushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(c div 1000)` and returns `c`. */
  private object NanoTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(c, Literal(1000L, LongType), _)) => Some(c)
      case _ => None
    }
  }

  private def micros(lit: Literal): Option[Long] = lit match {
    case Literal(v: Long, TimestampType) => Some(v)
    case _ => None
  }

  private def nanosLit(m: Long): Option[Literal] =
    try Some(Literal(Math.multiplyExact(m, 1000L), LongType))
    catch { case _: ArithmeticException => None }

  /** A widened, pushable raw-column bound implied by the comparison. */
  private def widenedBound(conjunct: Expression): Option[Expression] = conjunct match {
    case GreaterThanOrEqual(NanoTs(c), l: Literal) =>
      micros(l).flatMap(m => nanosLit(m - 1).map(GreaterThanOrEqual(c, _)))
    case GreaterThan(NanoTs(c), l: Literal) =>
      micros(l).flatMap(m => nanosLit(m - 1).map(GreaterThanOrEqual(c, _)))
    case LessThan(NanoTs(c), l: Literal) =>
      micros(l).flatMap(m => nanosLit(m + 1).map(LessThanOrEqual(c, _)))
    case LessThanOrEqual(NanoTs(c), l: Literal) =>
      micros(l).flatMap(m => nanosLit(m + 1).map(LessThanOrEqual(c, _)))
    // literal-first forms
    case LessThanOrEqual(l: Literal, NanoTs(c)) =>
      micros(l).flatMap(m => nanosLit(m - 1).map(GreaterThanOrEqual(c, _)))
    case GreaterThan(l: Literal, NanoTs(c)) =>
      micros(l).flatMap(m => nanosLit(m + 1).map(LessThanOrEqual(c, _)))
    case GreaterThanOrEqual(l: Literal, NanoTs(c)) =>
      micros(l).flatMap(m => nanosLit(m + 1).map(LessThanOrEqual(c, _)))
    case LessThan(l: Literal, NanoTs(c)) =>
      micros(l).flatMap(m => nanosLit(m - 1).map(GreaterThanOrEqual(c, _)))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val extras = existing.flatMap(widenedBound)
        .filterNot(x => existing.exists(_.semanticEquals(x))) // idempotent
      if (extras.isEmpty) f
      else Filter((existing ++ extras).reduce(And), child)
  }
}
