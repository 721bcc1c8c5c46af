package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** N-dimensional Z-order (Morton) key as a native expression.
  *
  * [[graft.operators.Layout.zValue2]] composes the classic 2-D
  * mask-doubling trick from built-in functions; real `OPTIMIZE ZORDER BY`
  * takes an arbitrary column list, and the mask trick does not generalize
  * cleanly past two dimensions. [[ZOrderN]] is the general form: each of
  * the n long children is normalized onto a `bits`-wide grid
  * (`bits = min(16, 63/n)`, so the interleave always fits a positive
  * int64), and grid bit `i` of dimension `d` lands at z-bit `i·n + d` —
  * the textbook definition, as one tight loop in a shared static kernel
  * ([[ZOrderCodec]]) that both the interpreted and generated paths call.
  * For n = 2 it agrees with the mask form bit for bit (LayoutSpec pins
  * this), and the same `((g >> i) & 1) << (i·n + d)` sum is mirrorable in
  * any SQL engine with variable shifts (`q_zorder3`'s DuckDB oracle).
  */
object LayoutExpressions {

  /** Z-value of `cols` (long-typed) with per-column [min, max] grid
    * bounds — a pure projection; bounds are plan constants. */
  def zValueN(cols: Seq[Column], mins: Array[Long],
              maxs: Array[Long]): Column = {
    require(cols.nonEmpty && cols.length == mins.length &&
      cols.length == maxs.length, "one [min,max] per column")
    GraftColumnBridge.column(
      ZOrderN(cols.map(GraftColumnBridge.expression), mins, maxs))
  }
}

/** The interleave kernel, static so generated code calls it directly. */
object ZOrderCodec {

  def bitsFor(n: Int): Int = math.min(16, 63 / n)

  /** Grid-normalize then interleave; truncating division matches the 2-D
    * `div` form (non-negative operands — caller guarantees
    * `min ≤ v ≤ max` and range < 2^(63−bits)). */
  def z(vals: Array[Long], mins: Array[Long], maxs: Array[Long]): Long = {
    val n = vals.length
    val bits = bitsFor(n)
    val gridMax = (1L << bits) - 1
    var out = 0L
    var d = 0
    while (d < n) {
      val range = maxs(d) - mins(d)
      val g = if (range <= 0) 0L else (vals(d) - mins(d)) * gridMax / range
      var i = 0
      while (i < bits) { out |= ((g >> i) & 1L) << (i * n + d); i += 1 }
      d += 1
    }
    out
  }
}

case class ZOrderN(children: Seq[Expression], mins: Array[Long],
                   maxs: Array[Long]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_n"

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.length)
    var d = 0
    while (d < children.length) {
      val c = children(d).eval(input)
      if (c == null) return null
      vals(d) = c.asInstanceOf[Long]
      d += 1
    }
    ZOrderCodec.z(vals, mins, maxs)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val mn = ctx.addReferenceObj("zMins", mins, "long[]")
    val mx = ctx.addReferenceObj("zMaxs", maxs, "long[]")
    val vals = ctx.freshName("zvals")
    val evals = children.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, d) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else { $vals[$d] = ${e.value}; }
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |long[] $vals = new long[${children.length}];
        |$fill
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.ZOrderCodec.z($vals, $mn, $mx);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
