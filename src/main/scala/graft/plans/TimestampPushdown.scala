package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite time-range predicates on the converted
  * timestamp view of a raw nanosecond column into predicates on the
  * raw column itself, so they reach parquet row-group pruning.
  *
  * The `events` table stores TIMESTAMP(NANOS), which Spark reads as a
  * raw long; the friendly view exposes
  * `ts = timestamp_micros(ts_ns div 1000)`. A filter written against
  * the view compares `MicrosToTimestamp(IntegralDivide(ts_ns, 1000))`
  * with a timestamp literal — an expression the parquet source cannot
  * push. This rule turns each such comparison into an equivalent raw
  * bound (`ts_us >= T  ⟺  ts_ns >= T·1000`, `ts_us <= T  ⟺
  * ts_ns <= T·1000 + 999`, …), which data-source filter pushdown then
  * carries into row-group stats — the distributed analog of the
  * reference's B+-tree range descent (/root/reference/bplus_tree.hpp),
  * recovered automatically by the optimizer instead of by hand-written
  * raw-column filters.
  *
  * Sound for non-negative raw values and positive timestamp literals
  * (integral division truncates toward zero): both hold for real epoch
  * nanos. Literals at/below epoch 0 are left untouched.
  */
object TimestampFilterPushdown extends Rule[LogicalPlan] {

  /** Matches the µs-view of a raw ns column: MicrosToTimestamp(a div 1000). */
  private object MicrosView {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(a, Literal(1000L, LongType), _))
          if a.dataType == LongType => Some(a)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType)
          if us > 0 && us < Long.MaxValue / 1000 - 1000 => Some(us)
      case _ => None
    }
  }

  private def rewrite(e: Expression): Expression = e match {
    case GreaterThanOrEqual(MicrosView(a), TsLit(t)) =>
      GreaterThanOrEqual(a, Literal(t * 1000L, LongType))
    case GreaterThan(MicrosView(a), TsLit(t)) =>
      GreaterThan(a, Literal(t * 1000L + 999L, LongType))
    case LessThanOrEqual(MicrosView(a), TsLit(t)) =>
      LessThanOrEqual(a, Literal(t * 1000L + 999L, LongType))
    case LessThan(MicrosView(a), TsLit(t)) =>
      LessThan(a, Literal(t * 1000L, LongType))
    case EqualTo(MicrosView(a), TsLit(t)) =>
      And(GreaterThanOrEqual(a, Literal(t * 1000L, LongType)),
        LessThanOrEqual(a, Literal(t * 1000L + 999L, LongType)))
    // literal-on-the-left forms
    case GreaterThanOrEqual(TsLit(t), MicrosView(a)) =>
      LessThanOrEqual(a, Literal(t * 1000L + 999L, LongType))
    case GreaterThan(TsLit(t), MicrosView(a)) =>
      LessThan(a, Literal(t * 1000L, LongType))
    case LessThanOrEqual(TsLit(t), MicrosView(a)) =>
      GreaterThanOrEqual(a, Literal(t * 1000L, LongType))
    case LessThan(TsLit(t), MicrosView(a)) =>
      GreaterThan(a, Literal(t * 1000L + 999L, LongType))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp { case e => rewrite(e) }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

/** Installer for sessions created outside the builder (the driver's
  * Verify/Bench sessions): `spark.experimental` has no optimizer hook,
  * so this goes through `extraOptimizations`.
  */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(TimestampFilterPushdown))
      spark.experimental.extraOptimizations = existing :+ TimestampFilterPushdown
  }
}
