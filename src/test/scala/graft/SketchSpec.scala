package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Sanity bounds for the sketch-based 100 TB paths (driver-side these are
  * rows-only checks — sketch output is engine-specific — so the accuracy
  * contract is asserted here against the exact twins at sf0.01). */
class SketchSpec extends GraftSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("approx_count_distinct is within its rsd bound of exact (5 sigma)") {
    val events = Tables.events(spark, sf001)
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
    val rows = exact.join(approx, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact_users").toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      val relErr = math.abs(a - e) / e
      // rsd 0.01 → 5 standard deviations of slack
      assert(relErr <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e (relErr $relErr)")
    }
  }

  test("percentile_approx median satisfies the rank-space median property") {
    // percentile_approx returns an actual bucket ELEMENT at (approximately)
    // the median rank — for tiny buckets that element can sit far from the
    // interpolated exact median in VALUE space, so the correct contract is
    // in RANK space: at most n/2 (+1 slack for the sketch's <1-rank error
    // at accuracy 10000) elements strictly below it, same above it.
    val events = Tables.events(spark, sf001)
    val approx = Relational.medianOverTimeApprox(events, "1 hour")
    val ranked = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(collect_list(col("value")).as("vals"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("vals"))
      .join(approx, Seq("bucket_start", "event_type"))
      .select(col("bucket_start"), col("event_type"),
        size(col("vals")).as("n"),
        size(filter(col("vals"), v => v < col("median_value"))).as("below"),
        size(filter(col("vals"), v => v > col("median_value"))).as("above"))
      .collect()
    assert(ranked.nonEmpty)
    ranked.foreach { r =>
      val n = r.getAs[Int]("n").toDouble
      val below = r.getAs[Int]("below"); val above = r.getAs[Int]("above")
      assert(below <= n / 2 + 1 && above <= n / 2 + 1,
        s"approx median splits bucket $below/$above of $n for " +
          s"${r.getAs[Any]("bucket_start")}/${r.getString(1)}")
    }
  }

  test("CMS fingerprints: JVM md5 twin is bit-identical to the SQL fragments") {
    import graft.functions.{CmsSketch, Hashing}
    val toks = Seq("join", "hash", "zzzz_absent", "ünïcode", "")
    val sql = spark.sql(toks.map(t =>
      s"SELECT ${Hashing.hash64(s"'$t'")} AS h1, " +
        s"${Hashing.hash64Hi(s"'$t'")} AS h2").mkString(" UNION ALL "))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // UNION ALL preserves no order — compare as sets of pairs
    assert(sql.toSet === toks.map(CmsSketch.fingerprints).toSet)
  }

  test("CMS never undercounts, honors the eps*N bound, exact without collisions") {
    import graft.functions.CmsSketch
    val docs = Tables.documents(spark, sf001)
    val targets = Seq("join", "hash", "filter", "window", "zzzz_absent")
    val est = CmsSketch.tokenCounts(docs, targets)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs
      .select(explode(expr(graft.operators.TextAnalysis.tokensExpr)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("tok").isin(targets: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.select(sum(size(expr(
      graft.operators.TextAnalysis.tokensExpr)))).first().getLong(0)
    val eps = math.E / 1024
    targets.foreach { t =>
      val e = exact.getOrElse(t, 0L)
      assert(est(t) >= e, s"$t undercounted: ${est(t)} < $e")
      assert(est(t) <= e + (eps * n).toLong,
        s"$t above the CMS bound: ${est(t)} vs $e + ${(eps * n).toLong}")
    }
    // a 4-token corpus cannot collide at w=1024 with overwhelming
    // probability under the fixed md5 family — the sketch must be EXACT
    import spark.implicits._
    val tiny = Seq((1L, "a b a c"), (2L, "a d")).toDF("doc_id", "text")
    val tinyEst = CmsSketch.tokenCounts(tiny, Seq("a", "b", "c", "d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tinyEst === Map("a" -> 3L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
  }

  test("batch heavy hitters: exact top-k ranks, estimates never undercount") {
    import graft.functions.CmsSketch
    val events = graft.sources.Tables.events(spark, sf)
    val got = CmsSketch.heavyHitters(events, "user_id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 10)
    // membership and counts equal the exact top-10 (ties → key asc)
    val want = events.selectExpr("CAST(user_id AS STRING) AS key")
      .where("key IS NOT NULL")
      .groupBy("key").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("key").asc)
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(t => (t._1, t._2)).toSeq === want.toSeq)
    // one-sided sketch guarantee
    got.foreach { case (k, exact, est) =>
      assert(est >= exact, s"$k: est $est < exact $exact")
    }
  }

  test("per-source sketch view rolls up bit-identically to the one-pass sketch") {
    import graft.functions.CmsSketch
    val docs = graft.sources.Tables.documents(spark, sf)
    val targets = Seq("join", "hash", "filter", "window", "zzzz_absent")
    val view = CmsSketch.sketchBySource(docs)
    // one sketch row per source, each at the full d*w geometry
    val nSources = docs.select("source").distinct().count()
    assert(view.count() === nSources)
    assert(view.selectExpr("size(sketch)").collect()
      .forall(_.getInt(0) === 4 * 1024))
    // the mergeability claim, verified end to end: estimates through the
    // per-source view ≡ estimates from one pass over the whole corpus
    val merged = CmsSketch.rollupCounts(view, targets)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val onePass = CmsSketch.tokenCounts(docs, targets)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(merged === onePass, "merged view drifted from the one-pass sketch")
    // a PARTIAL rollup stays a valid sketch of its slice: never
    // undercounts that slice's exact totals
    val one = docs.select("source").distinct()
      .orderBy("source").limit(1).head().getString(0)
    val slice = CmsSketch.rollupCounts(view.filter(col("source") === one),
        targets)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.filter(col("source") === one)
      .select(explode(expr(graft.operators.TextAnalysis.tokensExpr))
        .as("tok"))
      .filter(col("tok").isin(targets: _*))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { t =>
      assert(slice.getOrElse(t, 0L) >= exact.getOrElse(t, 0L),
        s"slice sketch undercounts $t")
    }
    // geometry refusal survives the r19 single-job fold: a view built at
    // (4, 1024) probed as (4, 512) must be refused, not mis-indexed
    val refused = intercept[IllegalArgumentException] {
      CmsSketch.rollupCounts(view, targets, d = 4, w = 512)
    }
    assert(refused.getMessage.contains("geometry"))
  }
}
