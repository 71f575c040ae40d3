package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — Spark has no
  * built-in for it, yet it is the FIRST step of any text-dedup pipeline:
  * composed vs decomposed accents ("é" vs "e"+U+0301) must not defeat
  * exact-hash dedup or shingling. DuckDB's `nfc_normalize` is the oracle
  * counterpart (both implement Unicode normalization, so outputs are
  * byte-identical).
  *
  * The fast path skips the (allocating) java.text.Normalizer call for
  * strings that are pure ASCII — at corpus scale most documents are — by a
  * single pass over the bytes.
  */
object TextNormalize {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII is closed under NFC: skip the String round-trip entirely
    var i = 0
    val n = s.numBytes
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val j = s.toString
      if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
    }
  }
}

/** `graft_nfc(string)` — NFC-normalize a string column. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    TextNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextNormalize.nfc($a)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object Normalize {
  /** NFC normalization of a string column (Column API face). */
  def nfc(s: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(s)))
}
