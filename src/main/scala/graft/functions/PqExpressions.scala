package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization expressions (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector is split into
  * `m` subspaces, each quantized independently against a small codebook,
  * so a 64-dim float vector (256 B) compresses to `m` byte-sized codes —
  * the representation that lets a 100 TB corpus's index live in memory.
  * Scoring is ADC (asymmetric distance computation): the query stays
  * exact, candidates are scored through their codes' centroids.
  *
  * Both expressions are whole-stage-codegen loops over a codebook matrix
  * shipped once per task as a reference object (same mechanism as
  * [[LshSignBucket]]). The codebook is passed as FULL seed vectors;
  * subspace `s` of centroid `c` is `codebooks(c)(s·subDim ‥ (s+1)·subDim)`
  * — matching the DuckDB oracle's slice arithmetic index-for-index.
  * Distance accumulation is per-subspace-then-total (a fold of folds), the
  * same association order as the oracle's nested `list_reduce`. */
object PqExpressions {

  /** `pq_encode(v)` → int array of length `m`: per subspace, the index of
    * the L2-closest codebook centroid (first wins ties). */
  def pqEncode(v: Column, codebooks: Array[Array[Double]], m: Int): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(v), codebooks, m))

  /** `pq_adc(q, codes)` → squared-L2 ADC distance between the exact query
    * vector and a candidate's reconstructed (quantized) form. */
  def pqAdcScore(q: Column, codes: Column, codebooks: Array[Array[Double]],
                 m: Int): Column =
    GraftColumnBridge.column(
      PqAdcScore(GraftColumnBridge.expression(q),
        GraftColumnBridge.expression(codes), codebooks, m))
}

case class PqEncode(child: Expression, codebooks: Array[Array[Double]],
                    m: Int) extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def subDim: Int = codebooks(0).length / m

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dt = elemType(child)
    val sd = subDim
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < codebooks.length) {
        val cb = codebooks(c)
        var d2 = 0.0
        var d = 0
        while (d < sd) {
          val i = s * sd + d
          val diff = cb(i) - (if (i < x.numElements()) getD(x, i, dt) else 0.0)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
      val sd = subDim
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val cb = ctx.freshName("cb")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cs.length; $c++) {
         |    double[] $cb = $cs[$c];
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $sd; $d++) {
         |      int $i = $s * $sd + $d;
         |      double $diff = $cb[$i] -
         |        ($i < $v.numElements() ? ${getJava(v, i, elemType(child))} : 0.0);
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqAdcScore(left: Expression, right: Expression,
                      codebooks: Array[Array[Double]], m: Int)
    extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  private def subDim: Int = codebooks(0).length / m

  override protected def nullSafeEval(q: Any, cd: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[ArrayData]
    val dt = elemType(left)
    val sd = subDim
    var total = 0.0
    var s = 0
    while (s < m) {
      val cb = codebooks(codes.getInt(s))
      var sub = 0.0
      var d = 0
      while (d < sd) {
        val i = s * sd + d
        val diff = cb(i) - (if (i < x.numElements()) getD(x, i, dt) else 0.0)
        sub += diff * diff
        d += 1
      }
      total += sub
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cd) => {
      val cs = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
      val sd = subDim
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val sub = ctx.freshName("sub")
      val diff = ctx.freshName("diff"); val total = ctx.freshName("total")
      val cb = ctx.freshName("cb")
      s"""
         |double $total = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  double[] $cb = $cs[$cd.getInt($s)];
         |  double $sub = 0.0;
         |  for (int $d = 0; $d < $sd; $d++) {
         |    int $i = $s * $sd + $d;
         |    double $diff = $cb[$i] -
         |      ($i < $q.numElements() ? ${getJava(q, i, elemType(left))} : 0.0);
         |    $sub += $diff * $diff;
         |  }
         |  $total += $sub;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
