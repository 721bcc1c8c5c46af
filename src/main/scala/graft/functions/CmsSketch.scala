package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed MERGEABLE
  * aggregator — the streaming/distributed answer to "how often does each
  * of these keywords occur" when the exact token histogram is too big to
  * keep: the whole summary is d×w long counters (32 KB at the defaults)
  * with the one-sided guarantee true ≤ est ≤ true + ε·N at ε = e/w.
  *
  * Why THIS sketch is the oracle-checkable one: CMS counter updates are
  * pure sums, so the finished sketch is bit-identical under any
  * partitioning or merge order — unlike Misra-Gries/SpaceSaving, whose
  * summaries are merge-order-dependent and could never hash-match a
  * sequential DuckDB mirror. The aggregation runs as map-side partial
  * buffers merged associatively (the same shape as the Bloom build at
  * `Dedup.incrementalDedupBloom`); one 32 KB row reaches the driver.
  *
  * Bucket family: Kirsch-Mitzenmacher double hashing over the repo's
  * md5-derived 60-bit fingerprints ([[Hashing.hash64]]/[[hash64Hi]]) —
  * row i probes `pmod(h1 + i·(h2 & maskKM), w)` — so the DuckDB oracle
  * reproduces the exact counter layout from the same SQL fragments.
  */
object CmsSketch {

  /** KM bucket for depth row `i`; all terms non-negative and < 2^61, so
    * the sum stays inside int64 in every engine (same bound argument as
    * [[Hashing.maskKM]]). */
  def bucket(h1: Long, h2: Long, i: Int, w: Int): Int =
    ((h1 + i * (h2 & Hashing.maskKM)) % w).toInt

  /** JVM-side twin of the [[Hashing.hash64]]/[[Hashing.hash64Hi]] SQL
    * fragments (1-based SQL substring(1,15)/(17,15) → 0-based slices);
    * SketchSpec asserts bit-parity against the Catalyst evaluation. */
  def fingerprints(s: String): (Long, Long) = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16),
      java.lang.Long.parseLong(hex.substring(16, 31), 16))
  }

  class CmsAggregator(d: Int, w: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], t: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < d) { b(i * w + bucket(t._1, t._2, i, w)) += 1L; i += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Batch heavy hitters with sketch attribution: the exact top-k keys
    * (per-partition heaps via `TakeOrderedAndProject`, ties → key asc)
    * annotated with their count-min estimates from one corpus sketch —
    * the batch twin of [[graft.streaming.HeavyHittersStream]] and the
    * oracle-checkable bridge to it (CMS counters are pure sums, so the
    * DuckDB mirror reproduces the estimates bit-for-bit; the estimate is
    * the number the STREAMING view would serve for the same key, so
    * `est_count - n_exact` is the measured sketch error at this
    * geometry). */
  def heavyHitters(events: DataFrame, keyCol: String, k: Int = 10,
                   d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keys = events.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val sketch = keys
      .select(expr(Hashing.hash64("key")).as("h1"),
        expr(Hashing.hash64Hi("key")).as("h2"))
      .as[(Long, Long)]
      .select(new CmsAggregator(d, w).toColumn).head()
    keys.groupBy(col("key")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc).limit(k)
      .collect()
      .map { r =>
        val (h1, h2) = fingerprints(r.getString(0))
        val est = (0 until d)
          .map(i => sketch(i * w + bucket(h1, h2, i, w))).min
        (r.getString(0), r.getLong(1), est)
      }.toSeq.toDF("key", "n_exact", "est_count")
  }

  /** Materialized MERGEABLE sketch view: one CMS per `source` — the
    * pre-aggregated-cube pattern for 100 TB streams. Persist this tiny
    * table (n_sources × d·w longs) and every later rollup — any subset of
    * sources, or the whole corpus — is an element-wise counter sum over
    * the VIEW ([[rollupCounts]]), never a rescan of the corpus. Sums
    * commute and associate, so a merged sketch is bit-identical to the
    * sketch a single pass over the union would build — which is what
    * makes `q_cms_rollup` answerable by the same DuckDB oracle as the
    * single-pass `q_cms_counts`. */
  def sketchBySource(docs: DataFrame, d: Int = 4,
                     w: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"),
        explode(expr(graft.operators.TextAnalysis.tokensExpr)).as("tok"))
      .select(col("source"), expr(Hashing.hash64("tok")).as("h1"),
        expr(Hashing.hash64Hi("tok")).as("h2"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new CmsAggregator(d, w).toColumn)
      .toDF("source", "sketch")
      // geometry travels WITH the view: (d, w) pairs with the same
      // product lay counters out differently, so the product alone
      // cannot authenticate a sketch row
      .withColumn("sketch_d", lit(d))
      .withColumn("sketch_w", lit(w))
  }

  /** Point-query `targets` against the union of every sketch row in
    * `view` ([[sketchBySource]] output, or any subset of it): merge =
    * element-wise sum across the view's arrays (a `posexplode` +
    * position rollup over n_sources × d·w rows — view-sized work, the
    * corpus is never touched), then the usual min-over-depth estimate. */
  def rollupCounts(view: DataFrame, targets: Seq[String],
                   d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = view.sparkSession
    import spark.implicits._
    val merged = new Array[Long](d * w)
    // A view built with a different (d, w) would index out of bounds or
    // silently mis-estimate — even at the SAME d·w product the counter
    // layout differs, so validate the pair the view carries, not just
    // the array length. The check rides the rollup aggregation itself as
    // a per-row flag (r19): ONE action executes the (possibly inline,
    // corpus-scanning) sketchBySource pipeline exactly once — the r10-
    // advice cache-around-two-actions shape paid a cache fill plus a
    // second job per call. posexplode_OUTER keeps a row for an EMPTY
    // sketch array, so a bad geometry can never vanish from the output
    // before the flag is read.
    val rows = view
      .select(
        when(col("sketch_d") =!= d || col("sketch_w") =!= w ||
          size(col("sketch")) =!= d * w, 1).otherwise(0).as("bad"),
        col("sketch"))
      .select(col("bad"), posexplode_outer(col("sketch")).as(Seq("pos", "c")))
      .groupBy(col("pos"))
      .agg(sum(col("c")).as("c"), max(col("bad")).as("bad"))
      .collect() // bounded: d·w rows (32 KB at the default geometry)
    require(rows.forall(_.getInt(2) == 0),
      s"rollupCounts: view carries a different sketch geometry than (d=$d, w=$w)")
    rows.foreach(r => if (!r.isNullAt(0)) merged(r.getInt(0)) = r.getLong(1))
    targets.distinct.sorted.map { t =>
      val (h1, h2) = fingerprints(t)
      val est = (0 until d).map(i => merged(i * w + bucket(h1, h2, i, w))).min
      (t, est)
    }.toDF("token", "est_count")
  }

  /** Sketch the corpus token stream once, then answer point queries for
    * `targets` from the 32 KB summary. Estimates are EXACT for any token
    * whose d counters suffer no collision, and never undercount. */
  def tokenCounts(docs: DataFrame, targets: Seq[String],
                  d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(expr(graft.operators.TextAnalysis.tokensExpr)).as("tok"))
      .select(expr(Hashing.hash64("tok")).as("h1"),
        expr(Hashing.hash64Hi("tok")).as("h2"))
      .as[(Long, Long)]
    val sketch = toks.select(new CmsAggregator(d, w).toColumn).head()
    targets.distinct.sorted.map { t =>
      val (h1, h2) = fingerprints(t)
      val est = (0 until d).map(i => sketch(i * w + bucket(h1, h2, i, w))).min
      (t, est)
    }.toDF("token", "est_count")
  }
}
