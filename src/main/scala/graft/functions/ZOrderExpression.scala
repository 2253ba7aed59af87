package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving for multi-dimensional data clustering.
  *
  * Sorting a table by `zorder(a, b)` clusters rows so that range
  * predicates on EITHER dimension prune parquet row groups via their
  * min/max statistics — the distributed analog of a composite
  * secondary index, and the layout trick the reference's
  * one-B+tree-per-symbol design cannot express at all
  * (/root/reference/bplus_tree.hpp indexes time only).
  */
object ZOrderUtil {
  /** Spread the low 32 bits of v so bit i lands at position 2i
    * (binary-magic-numbers bit interleaving, public domain).
    */
  @inline def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave the low 32 bits of x (even positions) and y (odd). */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** `graft_zorder(x, y)` — 64-bit Morton code of two non-negative
  * dimensions (each clamped to its low 32 bits). Codegen'd via a
  * static call so surrounding operators stay fused.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(x: Any, y: Any): Any =
    java.lang.Long.valueOf(ZOrderUtil.interleave(
      x.asInstanceOf[Long], y.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderUtil.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
