package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileView
import graft.sources.Tables

/** Accuracy + mergeability contract for the grid-histogram quantile view
  * (the driver's hash-green check proves engine↔oracle agreement; the
  * bound against EXACT percentiles lives here). */
class QuantileViewSpec extends GraftSuite {

  private val sf001 = "/root/testdata/sf0.01"
  private lazy val events = Tables.events(spark, sf001)

  test("view quantiles are within half a bin width of the exact order statistic") {
    // The sketch's contract: its estimate lands in the SAME grid cell as
    // the ceil(q*N)-th smallest value (the type-1 quantile it computes),
    // so |est - that order statistic| <= halfBin + rounding. Interpolated
    // percentile definitions (Spark's `percentile`) sit BETWEEN order
    // statistics, which in a sparse tail can be many bins apart — that is
    // a definition difference, not sketch error, so the reference here is
    // the order statistic itself.
    val bins = 4096
    val r = events.agg(min(col("value")), max(col("value"))).head()
    val halfBin = (r.getDouble(1) - r.getDouble(0)) / bins / 2
    val byGroup = events.select(col("event_type"), col("value"))
      .collect().map(x => (x.getString(0), x.getDouble(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val est = QuantileView.quantilesByGroup(
        QuantileView.sketchBy(events, "event_type", "value", bins))
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(byGroup.nonEmpty && est.size === byGroup.size)
    byGroup.foreach { case (g, sorted) =>
      def orderStat(q: Double) =
        sorted(math.ceil(q * sorted.length).toInt - 1)
      val (p50, p95, p99) = est(g)
      Seq((p50, 0.5), (p95, 0.95), (p99, 0.99)).foreach { case (got, q) =>
        val want = orderStat(q)
        assert(math.abs(got - want) <= halfBin + 1e-6,
          s"$g p${(q * 100).round}: $got vs order statistic $want " +
            s"(halfBin $halfBin)")
      }
    }
  }

  test("rollup over the view equals the direct whole-corpus histogram walk") {
    val view = QuantileView.sketchBy(events, "event_type", "value")
    val viaView = QuantileView.rollupQuantiles(view).head()
    // direct: one group for the whole corpus, same grid
    val direct = QuantileView.quantilesByGroup(
      QuantileView.sketchBy(
        events.withColumn("all", lit("all")), "all", "value")).head()
    Seq("p50", "p95", "p99").foreach { p =>
      assert(viaView.getAs[Double](p) === direct.getAs[Double](p),
        s"$p: bin-wise view sums must equal the one-pass histogram")
    }
  }

  test("quantilesOf rejects a view mixing grid geometries") {
    val v1 = QuantileView.sketchBy(events, "event_type", "value", bins = 1024)
    val v2 = QuantileView.sketchBy(events, "event_type", "value", bins = 4096)
    val e = intercept[IllegalArgumentException] {
      QuantileView.rollupQuantiles(v1.unionByName(v2))
    }
    assert(e.getMessage.contains("grid"))
  }

  test("a zero-row view yields an empty result, not a geometry error") {
    // e.g. a streaming histogram store whose marker exists but no batch
    // has committed yet (r10 advice): the empty view has no geometry row,
    // which used to trip the "mixes grid geometries" require.
    val empty = QuantileView.sketchBy(events, "event_type", "value").limit(0)
    val byGroup = QuantileView.quantilesByGroup(empty)
    assert(byGroup.count() === 0L)
    assert(byGroup.columns.toSeq === Seq("grp", "p50", "p95", "p99"))
    val rollup = QuantileView.rollupQuantiles(empty)
    assert(rollup.count() === 0L)
    assert(rollup.columns.toSeq === Seq("p50", "p95", "p99"))
  }
}
