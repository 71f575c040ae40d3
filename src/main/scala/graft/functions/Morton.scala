package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving — the multi-dimensional clustering key
  * lakehouse layouts sort by so that ONE sort order bounds EVERY
  * participating dimension per file/partition: range-partition + sort by
  * the z-value and min/max pruning works on all interleaved columns at
  * once, not just a lexicographic prefix. Spark has no builtin; this is
  * the standard magic-number bit-spread, branch-free and codegen'd.
  */
object Morton {

  /** Spread the low 32 bits of x to the even bit positions of a long. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 32 bits of a and b: a gets the even bit
    * positions, b the odd. Total order = Z-order curve over (a, b). */
  def interleave2(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}

/** `graft_zorder2(a, b)` — 64-bit Z-value of two long dimensions
  * (low 32 bits each). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Morton.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Z-value of two long columns (Column API face). */
  def zorder2(a: Column, b: Column): Column =
    GraftBridge.column(ZOrder2(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
