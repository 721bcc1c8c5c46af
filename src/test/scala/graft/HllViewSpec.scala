package graft

import org.apache.spark.sql.functions._

import graft.functions.HllView
import graft.sources.Tables

/** Accuracy + mergeability contract for the HLL distinct-count view
  * (driver-side `q_hll_by_source` is rows-only — DataSketches binaries
  * are engine-specific — so the guarantees live here, at sf0.01 for
  * non-trivial cardinalities). */
class HllViewSpec extends GraftSuite {

  private val sf001 = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, sf001)

  test("per-source estimates are within 5% of exact distinct counts") {
    val exact = docs
      .select(col("source"),
        explode(expr(graft.operators.TextAnalysis.tokensExpr)).as("tok"))
      .groupBy("source").agg(countDistinct(col("tok")).as("exact"))
    val est = HllView.distinctBySource(HllView.sketchBySource(docs))
    val rows = exact.join(est, "source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Long]("distinct_tokens").toDouble
      if (e < 500)
        // below the coupon-list threshold DataSketches HLL is EXACT
        assert(a === e, s"${r.getString(0)}: small-cardinality sketch " +
          s"must be exact, got $a vs $e")
      else
        // lgK=12 → ~1.6% standard error; 5% ≈ 3 sigma
        assert(math.abs(a - e) / e <= 0.05,
          s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("estimator regime: high-cardinality stream stays within 5% of exact") {
    // the documents fixture's vocabulary is tiny (~31 tokens/source — the
    // coupon-exact regime above); event_id is the one fixture column with
    // thousands of distinct values, which is where the HLL estimator
    // actually estimates
    val events = Tables.events(spark, sf001)
    val r = events
      .agg(countDistinct(col("event_id")).as("exact"),
        hll_sketch_estimate(
          hll_sketch_agg(col("event_id"), lit(12))).as("est"))
      .head()
    val e = r.getAs[Long]("exact").toDouble
    val a = r.getAs[Long]("est").toDouble
    assert(e >= 5000, "fixture must reach the estimator regime")
    assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
  }

  test("rollup over the view equals the one-pass whole-corpus sketch exactly") {
    val onePass = docs
      .select(explode(expr(graft.operators.TextAnalysis.tokensExpr)).as("tok"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(12))))
      .head().getLong(0)
    val view = HllView.sketchBySource(docs)
    val merged = HllView.rollupDistinct(view).head().getLong(0)
    // register-wise max commutes: the union sketch IS the one-pass sketch
    assert(merged === onePass,
      "view rollup must be bit-identical to a single pass over the union")
    // and a partial rollup (a source subset) never exceeds the full one
    val firstSource = view.select("source").orderBy("source")
      .head().getString(0)
    val partial = HllView
      .rollupDistinct(view.filter(col("source") === firstSource))
      .head().getLong(0)
    assert(partial <= merged && partial > 0)
  }
}
