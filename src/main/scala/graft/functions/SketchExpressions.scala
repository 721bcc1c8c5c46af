package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expressions over driver-built sketches.
  *
  * Spark exposes `DataFrameStatFunctions.bloomFilter` to BUILD a
  * [[BloomFilter]] (a treeAggregate of partition-local bitmaps — no row
  * shuffle) but gives no public expression to PROBE one from SQL; the
  * engine's probe runs interpreted only inside Spark's own runtime-filter
  * rewrite. [[BloomMightContain]] closes that gap as a whole-stage-codegen
  * projection: the filter object ships once per task as a codegen reference
  * object (same mechanism as [[LshSignBucket]]'s plane matrix) and each row
  * costs `k` bit probes — no join, no shuffle, no per-row deserialization.
  */
object SketchExpressions {

  /** `bloom_might_contain(h)` — true iff the 64-bit hash column `h` might
    * be in `bloom` (no false negatives; false-positive rate is the filter's
    * `fpp`), codegen'd. */
  def bloomMightContain(h: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(h), bloom))
}

/** Membership probe of a LONG column against a driver-built Bloom filter.
  * The filter is a plan constant: serialized with the task binary, probed
  * in-loop inside whole-stage codegen. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bf = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
