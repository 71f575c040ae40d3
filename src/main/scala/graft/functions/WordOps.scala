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

  // WIDTH-32 family (the reference is width-parametric: `Section WithWord`,
  // fiat2/src/fiat2/Language.v:4): a 32-bit word is represented as its
  // SIGN-EXTENDED Int value in a Long column, so two's-complement wrap
  // comes from Int arithmetic and the signed family is plain Int ops.
  // (Java Int division MIN_VALUE / -1 wraps to MIN_VALUE per JLS 15.17.2 —
  // the same wrap coqutil's word gives.)
  def trunc32(a: Long): Long = a.toInt.toLong
  def wadd32(a: Long, b: Long): Long = (a.toInt + b.toInt).toLong
  def wsub32(a: Long, b: Long): Long = (a.toInt - b.toInt).toLong
  def wmul32(a: Long, b: Long): Long = (a.toInt * b.toInt).toLong
  def divu32(a: Long, b: Long): Long =
    if (b == 0) 0L
    else Integer.divideUnsigned(a.toInt, b.toInt).toLong
  def divs32(a: Long, b: Long): Long =
    if (b == 0) 0L else (a.toInt / b.toInt).toLong
  def modu32(a: Long, b: Long): Long =
    if (b == 0) trunc32(a)
    else Integer.remainderUnsigned(a.toInt, b.toInt).toLong
  def mods32(a: Long, b: Long): Long =
    if (b == 0) trunc32(a) else (a.toInt % b.toInt).toLong

  def apply(op: String, a: Long, b: Long): Long = op match {
    case "wadd" => wadd(a, b)
    case "wsub" => wsub(a, b)
    case "wmul" => wmul(a, b)
    case "divu" => divu(a, b)
    case "divs" => divs(a, b)
    case "modu" => modu(a, b)
    case "mods" => mods(a, b)
    case "wadd32" => wadd32(a, b)
    case "wsub32" => wsub32(a, b)
    case "wmul32" => wmul32(a, b)
    case "divu32" => divu32(a, b)
    case "divs32" => divs32(a, b)
    case "modu32" => modu32(a, b)
    case "mods32" => mods32(a, b)
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

  /** Width-parametric op bundle (the reference's `Context {width: Z}`,
    * fiat2/src/fiat2/Language.v:4). Supported widths: 64 (the default
    * everywhere) and 32 (sign-extended-Int-in-Long representation,
    * `WordMath.*32`). The compiler selects the bundle from
    * `Env.wordWidth`. */
  final class Width private[WordOps] (val width: Int) {
    private val sfx = width match {
      case 64 => ""
      case 32 => "32"
      case w => throw new IllegalArgumentException(
        s"unsupported word width $w (32 and 64 are implemented)")
    }
    val wadd: (Column, Column) => Column = bin("wadd" + sfx)
    val wsub: (Column, Column) => Column = bin("wsub" + sfx)
    val wmul: (Column, Column) => Column = bin("wmul" + sfx)
    val divu: (Column, Column) => Column = bin("divu" + sfx)
    val divs: (Column, Column) => Column = bin("divs" + sfx)
    val modu: (Column, Column) => Column = bin("modu" + sfx)
    val mods: (Column, Column) => Column = bin("mods" + sfx)
    def wneg(v: Column): Column = wsub(lit(0L), v)
    def ltu(a: Column, b: Column): Column =
      if (width == 64) WordOps.ltu(a, b)
      // sign-extended 32-bit words: the unsigned value is the low 32 bits
      else a.bitwiseAND(lit(0xFFFFFFFFL)) < b.bitwiseAND(lit(0xFFFFFFFFL))
    def lts(a: Column, b: Column): Column = a < b
    /** Canonicalize a literal into the width's representation. */
    def literal(v: Long): Column =
      if (width == 64) lit(v) else lit(WordMath.trunc32(v))
  }
  private val w64 = new Width(64)
  private val w32 = new Width(32)
  def forWidth(width: Int): Width = width match {
    case 64 => w64
    case 32 => w32
    case w => new Width(w) // throws with the directed message
  }
}
