package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for dedup fingerprints. Both are single-pass
  * primitive loops over a per-document string array, inside whole-stage
  * codegen — the map-side replacement for the round-1 explode + groupBy
  * shuffles (a 64-agg shuffle of the full token stream for simhash, a 16-agg
  * shuffle of the posting list for minhash). Nothing here needs oracle hash
  * parity: the fingerprints only GENERATE candidates, which are then verified
  * with exact Jaccard.
  */
object TextHashes {

  private def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Low 64 bits of md5 — little-endian of digest bytes 8..15, bit-identical
    * to DuckDB's `md5_number_lower`, so the oracle can replay simhash
    * end-to-end in SQL (xxh64 has no DuckDB counterpart). */
  def md5Low64(s: UTF8String): Long = {
    val d = md5.get(); d.reset()
    val b = d.digest(s.getBytes)
    var r = 0L
    var k = 15
    while (k >= 8) { r = (r << 8) | (b(k) & 0xffL); k -= 1 }
    r
  }

  /** 64-bit simhash: per-bit majority vote over md5-low64 token hashes,
    * weighted by term frequency (every occurrence votes). */
  def simhash64(toks: ArrayData): Long = {
    val n = toks.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = md5Low64(toks.getUTF8String(i))
        var j = 0
        while (j < 64) { ones(j) += ((h >>> j) & 1L).toInt; j += 1 }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (2 * ones(j) > n) fp |= (1L << j); j += 1 }
    fp
  }

  /** `perms` minhash values in one pass: min over the shingle array of the
    * seed-i xxh64 hash. Returns null for an empty array (no shingles → no
    * signature, matching the grouped form where such docs emit no rows). */
  def minhashSig(shingles: ArrayData, perms: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var p = 0
        while (p < perms) {
          val h = hash(s, p.toLong)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(toks: Any): Any =
    TextHashes.simhash64(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashes.simhash64($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class MinHashSignature(child: Expression, perms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(shingles: Any): Any =
    TextHashes.minhashSig(shingles.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.TextHashes.minhashSig($a, $perms);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

case class Md5Low64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_low64"

  override def nullSafeEval(s: Any): Any =
    TextHashes.md5Low64(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextHashes.md5Low64($a)")

  override protected def withNewChildInternal(newChild: Expression): Md5Low64 =
    copy(child = newChild)
}

object Fingerprints {
  /** 64-bit simhash of a string-array column. */
  def simhash(toks: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(toks)))

  /** Low 64 bits of md5 of a string column — bit-identical to DuckDB's
    * `md5_number_lower`, the deterministic cross-engine hash for sampling
    * decisions (xxh64 has no DuckDB counterpart). */
  def md5Low64(s: Column): Column =
    GraftBridge.column(Md5Low64(GraftBridge.expression(s)))

  /** array<long> minhash signature of a string-array column (null if empty). */
  def minhash(shingles: Column, perms: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), perms))

  /** Order-insensitive ID-SET digest aggregate: Σ (md5Low64(tag) & 2^31-1)
    * over rows — map-side combinable, and identical in DuckDB as
    * `SUM(md5_number_lower(tag) & 2147483647)`. The audit-row convention
    * shared by the curation pipeline's attrition vector, the corpus sink
    * read-back, and the snapshot diff. */
  def idsSum(tag: Column): Column = {
    import org.apache.spark.sql.functions.sum
    sum(md5Low64(tag).bitwiseAND(0x7fffffffL))
  }
}
