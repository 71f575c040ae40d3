package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-membership test as a native codegen'd expression — the explicit
  * form of Spark's own runtime semi-join reduction (InjectRuntimeFilter /
  * `spark.sql.optimizer.runtime.bloomFilter.*`): prune a fact table by a
  * sketch of the (filtered) dimension keys BEFORE the join's shuffle, so
  * ~(1 - selectivity) of the fact rows never leave their input partition.
  * Explicit beats the conf-driven rule here because it needs no
  * session-global threshold changes and the sketch parameters are chosen
  * from the measured dimension count. False positives only ever ADD rows
  * to the exact join that follows — the result is identical, which is
  * what the oracle checks.
  */
case class BloomMightContainLong(bloom: BloomFilter, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the sketch once per task via the references array — the
    // generated loop calls straight into it, no per-row deserialization
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object Bloom {

  /** Distributed sketch build (partial blooms per partition, merged on the
    * driver — `DataFrameStatFunctions.bloomFilter`): MB-sized result for
    * millions of keys, independent of fact-table size. */
  def buildLong(keys: DataFrame, colName: String,
      expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    keys.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)

  /** `bloom might-contain key` as a codegen'd boolean column. */
  def mightContain(bloom: BloomFilter, key: Column): Column =
    GraftBridge.column(BloomMightContainLong(bloom,
      GraftBridge.expression(key.cast("long"))))
}
