package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join operator — the whole-operator formulation of
  * [[graft.operators.MarketOps.asofJoin]] (which composes union +
  * window).
  *
  * Semantics: for every left row, attach the latest right row of the
  * same key with `right.ts <= left.ts` (inclusive), or nulls if none —
  * the standard trade↔quote as-of join; the reference's analog is a
  * per-symbol B+ tree descent to the greatest timestamp ≤ t
  * (/root/reference/bplus_tree.hpp + timeseries_db.hpp:38).
  *
  * Physical shape: both sides hash-cluster on the key and sort by
  * (key, ts) — exactly a sort-merge join's requirements — then a
  * single forward merge pass per partition emits matches with O(1)
  * state (the last seen right row). Cost is sort-shuffle of each side
  * once; no window state, no row multiplication, and at 100 TB the
  * per-task state is one row regardless of key cardinality or skew.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val rightArity = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val resultProj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)

      new Iterator[InternalRow] {
        private var rNext: InternalRow = _
        private var rNextKey: Any = _
        private var rNextTs: Long = 0L
        private var advanced = false
        private var matched: InternalRow = _
        private var matchedKey: Any = _

        private def pullRight(): Unit = {
          if (rIter.hasNext) {
            rNext = rIter.next()
            rNextKey = rKeyB.eval(rNext)
            rNextTs = rTsB.eval(rNext).asInstanceOf[Long]
          } else rNext = null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyB.eval(l)
          val t = lTsB.eval(l).asInstanceOf[Long]
          if (!advanced) { pullRight(); advanced = true }
          // advance right cursor through rows at-or-before (k, t)
          var cont = rNext != null
          while (cont) {
            val c = keyOrdering.compare(rNextKey, k)
            if (c < 0 || (c == 0 && rNextTs <= t)) {
              if (c == 0) { matched = rNext.copy(); matchedKey = rNextKey }
              pullRight()
              cont = rNext != null
            } else cont = false
          }
          val rSide =
            if (matched != null && keyOrdering.compare(matchedKey, k) == 0) matched
            else nullRight
          resultProj(joiner(l, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical as-of node to its exec.
  * Injectable either via `SparkSessionExtensions.injectPlannerStrategy`
  * or at runtime through `spark.experimental.extraStrategies` (used by
  * [[graft.operators.AsOf]] so driver-created sessions work too).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
