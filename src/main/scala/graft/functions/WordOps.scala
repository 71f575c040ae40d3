package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit machine-word arithmetic with the reference's semantics
  * (fiat2/src/fiat2/Interpret.v:139-151 via coqutil `word`):
  * silent two's-complement wrap-around (Spark 4 runs ANSI mode, whose +,-,*
  * THROW on Long overflow — correct for fiat2's TInt = ℤ, wrong for TWord),
  * unsigned and signed (truncating, `Z.quot`/`Z.rem`) division families, and
  * total division: `divu/divs x 0 = 0`, `modu/mods x 0 = x` (Coq's `Z.div`/
  * `Z.quot` by 0 are 0; `Z.modulo`/`Z.rem` by 0 are the dividend).
  */
object WordMath {
  def wadd(a: Long, b: Long): Long = a + b
  def wsub(a: Long, b: Long): Long = a - b
  def wmul(a: Long, b: Long): Long = a * b
  def divu(a: Long, b: Long): Long =
    if (b == 0) 0L else java.lang.Long.divideUnsigned(a, b)
  def divs(a: Long, b: Long): Long = if (b == 0) 0L else a / b
  def modu(a: Long, b: Long): Long =
    if (b == 0) a else java.lang.Long.remainderUnsigned(a, b)
  def mods(a: Long, b: Long): Long = if (b == 0) a else a % b

  def apply(op: String, a: Long, b: Long): Long = op match {
    case "wadd" => wadd(a, b)
    case "wsub" => wsub(a, b)
    case "wmul" => wmul(a, b)
    case "divu" => divu(a, b)
    case "divs" => divs(a, b)
    case "modu" => modu(a, b)
    case "mods" => mods(a, b)
  }
}

/** One codegen'd binary expression per word op — a static-call primitive,
  * never an overflow-checked builtin or a UDF. */
case class WordBinOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"graft_word_$op"

  override def nullSafeEval(a: Any, b: Any): Any =
    WordMath(op, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.WordMath.$op($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordBinOp =
    copy(left = newLeft, right = newRight)
}

object WordOps {
  private def bin(op: String)(a: Column, b: Column): Column =
    GraftBridge.column(WordBinOp(
      GraftBridge.expression(a), GraftBridge.expression(b), op))

  val wadd: (Column, Column) => Column = bin("wadd")
  val wsub: (Column, Column) => Column = bin("wsub")
  val wmul: (Column, Column) => Column = bin("wmul")
  val divu: (Column, Column) => Column = bin("divu")
  val divs: (Column, Column) => Column = bin("divs")
  val modu: (Column, Column) => Column = bin("modu")
  val mods: (Column, Column) => Column = bin("mods")
  def wneg(v: Column): Column = wsub(lit(0L), v)

  /** Unsigned 64-bit compare by flipping the sign bit — plain codegen'd
    * builtins, no custom expression needed. */
  def ltu(a: Column, b: Column): Column = {
    val m = lit(Long.MinValue)
    a.bitwiseXOR(m) < b.bitwiseXOR(m)
  }
  def lts(a: Column, b: Column): Column = a < b
}
