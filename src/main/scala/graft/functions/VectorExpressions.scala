package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * evaluate their lambdas interpreted (CodegenFallback) — ~30 µs per cosine
  * on 64-dim vectors, which dominates any all-pairs or top-k scoring stage.
  * These expressions generate a tight Java loop inside whole-stage codegen
  * instead (and provide a matching interpreted `eval` for completeness),
  * making per-pair scoring memory-bound rather than interpreter-bound.
  *
  * Arithmetic parity with the DuckDB oracle: element access widens floats to
  * double (exact), and every accumulation is a sequential left-to-right fold
  * — identical to `list_reduce(list_transform(...), (x, y) -> x + y)`.
  * Array elements are assumed non-null (embedding columns).
  */
object VectorExpressions {

  /** Cosine similarity of two float/double array columns, codegen'd. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Sign-bit LSH bucket of a float/double array column against the fixed
    * hyperplane matrix, codegen'd. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      LshSignBucket(GraftColumnBridge.expression(v), planes))

  /** 0-based index of the centroid with the maximal inner product against
    * the vector column (first wins ties), codegen'd — IVF cell assignment
    * as a pure projection. */
  def argMaxDot(v: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      ArgMaxDot(GraftColumnBridge.expression(v), centroids))

  /** Indices of the `p` centroids with the largest inner products, best
    * first (ties → lower index), codegen'd — IVF multi-probe query-side
    * cell assignment. `p = 1` yields `[argMaxDot]`. */
  def argTopPDot(v: Column, centroids: Array[Array[Double]], p: Int): Column =
    GraftColumnBridge.column(
      ArgTopPDot(GraftColumnBridge.expression(v), centroids, p))

  /** SQ8 scalar quantization of a float/double array column under a fixed
    * symmetric scale, codegen'd. */
  def sq8Encode(v: Column, scale: Double): Column =
    GraftColumnBridge.column(
      Sq8Encode(GraftColumnBridge.expression(v), scale))

  /** Integer dot product of two SQ8 code arrays, codegen'd. */
  def sq8Dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      Sq8Dot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  private[functions] def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private[functions] def getD(arr: ArrayData, i: Int, dt: DataType): Double =
    dt match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  /** Java source fragment reading element `i` of `arr` as double. */
  private[functions] def getJava(arr: String, i: String, dt: DataType): String =
    dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
}

/** `cosine_sim(a, b)` = dot(a,b) / (||a||·||b||), one fused loop. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (dtx, dty) = (elemType(left), elemType(right))
    // min of the two lengths: indexing UnsafeArrayData past its end returns
    // garbage bytes rather than throwing, which would silently corrupt
    // scores on mismatched vectors
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xa = getD(x, i, dtx); val xb = getD(y, i, dty)
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = ${getJava(a, i, elemType(left))};
         |  double $xb = ${getJava(b, i, elemType(right))};
         |  $dot += $xa * $xb; $na += $xa * $xa; $nb += $xb * $xb;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `lsh_bucket(v)`: bit `h` of the result is set iff `planes(h) · v > 0`.
  * The plane matrix is a driver-side constant shipped once per task via a
  * codegen reference object — zero per-row setup cost. */
case class LshSignBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dt = elemType(child)
    var bucket = 0
    var h = 0
    while (h < planes.length) {
      val p = planes(h)
      var dot = 0.0
      var i = 0
      val n = math.min(p.length, x.numElements())
      while (i < n) { dot += p(i) * getD(x, i, dt); i += 1 }
      if (dot > 0) bucket |= (1 << h)
      h += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val p = ctx.freshName("p")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $bucket = 0;
         |for (int $h = 0; $h < $pl.length; $h++) {
         |  double[] $p = $pl[$h];
         |  double $dot = 0.0;
         |  int ${p}_n = java.lang.Math.min($p.length, $v.numElements());
         |  for (int $i = 0; $i < ${p}_n; $i++) {
         |    $dot += $p[$i] * ${getJava(v, i, elemType(child))};
         |  }
         |  if ($dot > 0) $bucket |= (1 << $h);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `arg_top_p_dot(v)`: the 0-based indices of the `p` centroids with the
  * largest inner products against `v`, in descending-dot order (ties break
  * to the lower index — matching `ORDER BY score DESC, cell ASC` in the
  * SQL oracle). Selection is `p` passes of exclude-and-argmax over the
  * precomputed dot array — O(p · nlist), branch-free inner loops, no sort
  * — all inside whole-stage codegen. Element 0 equals [[ArgMaxDot]]. */
case class ArgTopPDot(child: Expression, centroids: Array[Array[Double]],
                      p: Int) extends UnaryExpression {
  import VectorExpressions._
  require(p >= 1 && p <= centroids.length,
    s"nprobe $p must be in [1, ${centroids.length}]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "arg_top_p_dot"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dt = elemType(child)
    val dots = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val n = math.min(cent.length, x.numElements())
      while (i < n) { dot += cent(i) * getD(x, i, dt); i += 1 }
      dots(c) = dot
      c += 1
    }
    val out = new Array[Int](p)
    val used = new Array[Boolean](centroids.length)
    var j = 0
    while (j < p) {
      // best==-1 seeds with the first unused cell, so all-NaN dots (a NaN
      // embedding poisons every product; NaN > x is always false) fall
      // back to lowest-index order instead of indexing used(-1)
      var best = -1; var bestDot = Double.NegativeInfinity
      var k = 0
      while (k < dots.length) {
        if (!used(k) && (best == -1 || dots(k) > bestDot)) {
          bestDot = dots(k); best = k
        }
        k += 1
      }
      used(best) = true; out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val dots = ctx.freshName("dots"); val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val dot = ctx.freshName("dot"); val cent = ctx.freshName("cent")
      val best = ctx.freshName("best"); val bestDot = ctx.freshName("bestDot")
      s"""
         |double[] $dots = new double[$cs.length];
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  double[] $cent = $cs[$c];
         |  double $dot = 0.0;
         |  int ${cent}_n = java.lang.Math.min($cent.length, $v.numElements());
         |  for (int $i = 0; $i < ${cent}_n; $i++) {
         |    $dot += $cent[$i] * ${getJava(v, i, elemType(child))};
         |  }
         |  $dots[$c] = $dot;
         |}
         |int[] $out = new int[$p];
         |boolean[] $used = new boolean[$cs.length];
         |for (int $j = 0; $j < $p; $j++) {
         |  // best==-1 seeds with the first unused cell (NaN-dot safety)
         |  int $best = -1; double $bestDot = Double.NEGATIVE_INFINITY;
         |  for (int $k = 0; $k < $dots.length; $k++) {
         |    if (!$used[$k] && ($best == -1 || $dots[$k] > $bestDot)) {
         |      $bestDot = $dots[$k]; $best = $k;
         |    }
         |  }
         |  $used[$best] = true; $out[$j] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `arg_max_dot(v)`: 0-based index of the centroid maximizing `c · v`
  * (strict `>`, so the first of any exactly-tied cells wins — matching
  * DuckDB's `list_indexof(l, list_max(l))`). Centroid matrix ships once per
  * task as a codegen reference object. */
case class ArgMaxDot(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = IntegerType
  override def prettyName: String = "arg_max_dot"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dt = elemType(child)
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val p = centroids(c)
      var dot = 0.0
      var i = 0
      val n = math.min(p.length, x.numElements())
      while (i < n) { dot += p(i) * getD(x, i, dt); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val p = ctx.freshName("p")
      val best = ctx.freshName("best"); val bestDot = ctx.freshName("bestDot")
      s"""
         |int $best = 0;
         |double $bestDot = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  double[] $p = $cs[$c];
         |  double $dot = 0.0;
         |  int ${p}_n = java.lang.Math.min($p.length, $v.numElements());
         |  for (int $i = 0; $i < ${p}_n; $i++) {
         |    $dot += $p[$i] * ${getJava(v, i, elemType(child))};
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sq8_encode(v)`: 8-bit scalar quantization (SQ8) of a float/double
  * vector under a fixed symmetric scale — code_i = ⌊v_i · 127 / scale⌋,
  * an int in [−127, 127] when `scale` bounds |v_i| (the caller derives it
  * from a corpus max-|v| aggregate). The cheap sibling of PQ: 4× memory
  * squeeze (8-byte double → effectively 1 byte of information per
  * dimension) with far higher fidelity than 4-subspace PQ codes, and the
  * quantized dot product is pure INTEGER arithmetic, so downstream
  * scoring ([[Sq8Dot]]) is exact, associative, and oracle-mirrorable with
  * no floating-point ordering caveats. Deterministic: floor of an IEEE
  * double product is engine-independent. */
case class Sq8Encode(child: Expression, scale: Double)
    extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dt = elemType(child)
    val n = x.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(getD(x, i, dt) * 127.0 / scale).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (int) java.lang.Math.floor(
         |    ${getJava(v, i, elemType(child))} * 127.0 / ${scale}D);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sq8_dot(a, b)`: integer dot product of two SQ8 code arrays — the
  * symmetric quantized similarity. All-long arithmetic (≤ 127² per term),
  * overflow-free to ~2⁴⁸ dimensions, bit-exact under any association
  * order. */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getInt(i).toLong * y.getInt(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.getInt($i) * $b.getInt($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
