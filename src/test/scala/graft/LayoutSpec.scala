package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Tables

class LayoutSpec extends GraftSuite {

  /** Naive bit-by-bit Morton reference (the definition, not the magic
    * masks): interleave the 16 grid bits of a (even) and b (odd). */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L)((z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1))

  private def gridRef(v: Long, min: Long, max: Long): Long =
    if (max <= min) 0L else (v - min) * 65535L / (max - min)

  test("z-value mask interleave equals the bit-by-bit Morton definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
        (1L, 2L)) ++
      Seq.fill(200)((rnd.nextLong(1L << 40).abs, rnd.nextLong(1L << 40).abs)))
    val df = rows.toDF("a", "b")
    val lo = rows.flatMap(t => Seq(t._1, t._2)).min
    val hi = rows.flatMap(t => Seq(t._1, t._2)).max
    val got = df.select(col("a"), col("b"),
        Layout.zValue2(col("a"), col("b"), lo, hi, lo, hi).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      val want = mortonRef(gridRef(a, lo, hi), gridRef(b, lo, hi))
      assert(got((a, b)) === want, s"z($a, $b)")
    }
  }

  test("z-value locality: close points share high bits, corners do not") {
    import spark.implicits._
    val z = (a: Long, b: Long) =>
      Seq((a, b)).toDF("a", "b")
        .select(Layout.zValue2(col("a"), col("b"), 0, 65535, 0, 65535))
        .head().getLong(0)
    // neighbors in both coordinates differ only in low Morton bits
    assert((z(1000, 2000) ^ z(1001, 2001)) < 16L)
    // opposite corners differ in the highest bits
    assert((z(0, 0) ^ z(65535, 65535)) > (1L << 30))
  }

  test("z-ordered layout prunes files a single-column sort cannot") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("epoch"))
    val base = java.nio.file.Files
      .createTempDirectory("graft-layout").toString
    val files = 32
    // contrast layout: the classic single-column time sort
    events.repartitionByRange(files, col("epoch"))
      .sortWithinPartitions(col("epoch"))
      .write.mode("overwrite").parquet(s"$base/by_time")
    Layout.writeZOrdered(events, s"$base/zorder", "user_id", "epoch", files)
    // both layouts hold the identical dataset
    val a = spark.read.parquet(s"$base/by_time")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$base/zorder")
      .collect().map(_.toSeq).toSet
    assert(a === b, "layout changed the data")
    // the 2-D box probe: a narrow user slice over a broad time slice
    val (uLo, uHi) = {
      val r = events.agg(min("user_id"), max("user_id")).head()
      val span = r.getLong(1) - r.getLong(0)
      (r.getLong(0), r.getLong(0) + span / 8)
    }
    val (tLo, tHi) = {
      val r = events.agg(min("epoch"), max("epoch")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (zTouch, zTotal) = Layout.prunedFiles(spark, s"$base/zorder",
      "user_id", "epoch", uLo, uHi, tLo, tHi)
    val (tTouch, tTotal) = Layout.prunedFiles(spark, s"$base/by_time",
      "user_id", "epoch", uLo, uHi, tLo, tHi)
    assert(zTotal === files && tTotal === files)
    // the time-sorted layout cannot prune on user_id at all...
    assert(tTouch === tTotal,
      s"time layout unexpectedly pruned: $tTouch/$tTotal")
    // ...the z-ordered layout reads a strict subset for the same predicate
    assert(zTouch < tTouch / 2,
      s"z-order pruned too little: $zTouch vs $tTouch files")
  }
}
