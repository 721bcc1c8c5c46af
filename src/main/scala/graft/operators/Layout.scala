package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * file-level pruning on MORE THAN ONE column.
  *
  * At 100 TB the cheapest rows are the ones never read. Parquet readers
  * prune whole files (and row groups) from min/max column statistics, but
  * the statistics only help when the layout makes them tight: a table
  * sorted by `ts` answers time-range scans from a handful of files yet
  * reads EVERY file for a `user_id` predicate, because each file's user
  * span covers the whole domain. Z-ordering interleaves the bits of
  * several normalized key columns into one sort key, so files occupy
  * compact rectangles in the key space and BOTH single-column and
  * conjunctive range predicates intersect only a sub-linear slice of the
  * files (Morton 1966; the layout behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`).
  *
  * Everything here is plain long arithmetic over built-in functions —
  * codegen'd end to end, mirrorable bit-for-bit in any SQL engine, no UDF.
  *
  * Scale shape: [[withZValue]] adds one projection after a single 1-row
  * min/max aggregate (at a lakehouse this comes free from table-level
  * stats); [[writeZOrdered]] is one range exchange on the z-value — the
  * same shuffle a plain global sort pays, buying multi-column pruning
  * instead of one-column. The write is embarrassingly parallel after the
  * exchange.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions
    * (`abcd… → a0b0c0d0…`) with the classic mask doublings; input must be
    * pre-masked to 16 bits. */
  private def spread16(x0: Column): Column = {
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Normalize a long column with known [min, max] onto the 16-bit grid
    * `[0, 65535]` by integer arithmetic (`(v − min) · 65535 div range`) —
    * truncating division in Spark and DuckDB agree on non-negative
    * operands, so the oracle can mirror it exactly. Caller guarantees
    * `min ≤ v ≤ max` and a range below 2⁴⁶ (no i64 overflow in the
    * product; every fixture and any id/epoch-day/enum-code column
    * qualifies — epoch MICROS over decades does not, normalize those to
    * days or seconds first). */
  private def grid16(v: Column, min: Long, max: Long): Column =
    if (max <= min) lit(0L)
    else call_function("div",
      (v.cast("long") - lit(min)) * lit(65535L), lit(max - min))

  /** The 2-D Z-value of `(a, b)` on a 16×16-bit grid: bits of the two
    * normalized coordinates interleaved (a even, b odd) into one 32-bit
    * Morton code. Pure projection — mins/maxes are plan constants. */
  def zValue2(a: Column, b: Column, aMin: Long, aMax: Long,
              bMin: Long, bMax: Long): Column =
    spread16(grid16(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread16(grid16(b, bMin, bMax)), 1))

  /** Add a `zval` column over two long-typed columns, deriving the grid
    * bounds from one 1-row min/max aggregate (a metadata lookup at a
    * lakehouse; here a cheap scan-reduce). */
  def withZValue(df: DataFrame, colA: String, colB: String): DataFrame = {
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"withZValue: empty input or all-null '$colA'/'$colB' — no stats to grid on")
    df.withColumn("zval",
      zValue2(col(colA), col(colB), r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
  }

  /** N-column generalization of [[withZValue]] via the native
    * [[graft.functions.ZOrderN]] expression (`bits = min(16, 63/n)` per
    * dimension): the column list a real `OPTIMIZE ZORDER BY` takes. Same
    * one-row stats aggregate, same single-projection shape. */
  def withZValueN(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "withZValueN needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.foreach(i => require(!stats.isNullAt(2 * i),
      s"withZValueN: empty input or all-null column '${cols(i)}' — no stats to grid on"))
    val mins = cols.indices.map(i => stats.getLong(2 * i)).toArray
    val maxs = cols.indices.map(i => stats.getLong(2 * i + 1)).toArray
    df.withColumn("zval", graft.functions.LayoutExpressions.zValueN(
      cols.map(c => col(c).cast("long")), mins, maxs))
  }

  /** Write `df` into `files` parquet files clustered by the Z-value of
    * `(colA, colB)`: one range exchange on `zval` (sampled split points,
    * so files get even row counts), a within-partition sort to tighten
    * row-group statistics, and the key dropped from the files — the
    * layout is the product, not the column. */
  def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
                    files: Int = 64): Unit =
    withZValue(df, colA, colB)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(dir)

  /** Per-file min/max spans of two columns — exactly the statistics a
    * parquet reader prunes with, surfaced as a DataFrame so layouts can
    * be audited and compared ([[prunedFiles]]). */
  def fileSpans(spark: SparkSession, dir: String,
                colA: String, colB: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))

  /** How many files of `dir` a conjunctive range predicate
    * `colA ∈ [aLo, aHi] ∧ colB ∈ [bLo, bHi]` must read, by the min/max
    * intersection rule parquet uses: `(files touched, files total)`. */
  def prunedFiles(spark: SparkSession, dir: String,
                  colA: String, colB: String,
                  aLo: Long, aHi: Long, bLo: Long, bHi: Long): (Long, Long) = {
    val spans = fileSpans(spark, dir, colA, colB).cache()
    try {
      val total = spans.count()
      val touched = spans.filter(
        col("a_max").cast("long") >= aLo && col("a_min").cast("long") <= aHi &&
          col("b_max").cast("long") >= bLo && col("b_min").cast("long") <= bHi)
        .count()
      (touched, total)
    } finally { spans.unpersist(); () }
  }
}
