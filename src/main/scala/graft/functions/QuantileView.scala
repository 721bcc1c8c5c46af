package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile-sketch view — the third leg of the sketch-view
  * trilogy beside [[CmsSketch.sketchBySource]] (frequency) and
  * [[HllView.sketchBySource]] (distinct count): per-group percentiles
  * answerable over ANY group subset without rescanning the corpus.
  *
  * The sketch is a fixed-grid histogram: the value domain `[min, max]`
  * (one 1-row aggregate — table stats at a lakehouse) split into `bins`
  * equal cells, one count per non-empty `(group, bin)`. That choice is
  * deliberate, and different from t-digest/GK/KLL: those adapt their
  * cells to the data and are merge-order-dependent (or randomized), so
  * two runs — or an engine and its oracle — can legitimately disagree.
  * Grid counts are PURE SUMS: partition-order-exact, bit-identical under
  * any merge tree, and therefore the one quantile sketch a DuckDB oracle
  * can mirror hash-for-hash (`q_quantile_view` / `q_quantile_rollup` are
  * hash-green where `approx_percentile`'s sketch is rows-only). The
  * price is a FIXED error bound: the estimate lands in the same cell as
  * the `ceil(q·N)`-th order statistic (the type-1 quantile it computes),
  * so |est − that order statistic| ≤ binWidth/2 = (max−min)/(2·bins) —
  * ~0.012% of the domain at the default 4096 bins, an a-priori bound
  * t-digest cannot give without knowing the data. (Interpolating
  * definitions like Spark's `percentile` sit BETWEEN order statistics —
  * in a sparse tail those are legitimately further apart than a bin;
  * QuantileViewSpec pins the bound against the order statistic.)
  *
  * Scale shape: building the view is one hash aggregate over a 2-column
  * projection (map-side partial counts); the view is ≤ n_groups × bins
  * rows of (int, long) — KBs; every rollup (any group subset, or the
  * corpus) is a bin-wise sum over the VIEW plus one cumulative walk of
  * ≤ bins rows. Quantile queries never touch the fact table again.
  */
object QuantileView {

  /** Per-`groupCol` grid histogram of `valueCol` over the GLOBAL
    * `[min, max]` domain (shared grid = mergeable across groups). Domain
    * bounds and bin count travel with the view — a rollup against a
    * mismatched grid must fail fast, not mis-estimate. */
  def sketchBy(df: DataFrame, groupCol: String, valueCol: String,
               bins: Int = 4096): DataFrame = {
    val r = df.agg(min(col(valueCol).cast("double")),
      max(col(valueCol).cast("double"))).head()
    require(!r.isNullAt(0), s"sketchBy: empty input or all-null '$valueCol'")
    sketchByFixed(df, groupCol, valueCol, r.getDouble(0), r.getDouble(1),
      bins)
  }

  /** [[sketchBy]] with a CALLER-FIXED domain — the form a stream (or any
    * incremental builder) needs, where the grid must be pinned before
    * the data is seen. Values outside `[mn, mx]` clamp into the edge
    * cells (their rank contribution is preserved; only their position
    * within the edge cell is lost). */
  def sketchByFixed(df: DataFrame, groupCol: String, valueCol: String,
                    mn: Double, mx: Double, bins: Int = 4096): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(mx >= mn, s"domain [$mn, $mx] is empty")
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        binOf(col(valueCol).cast("double"), mn, mx, bins).as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("v_min", lit(mn))
      .withColumn("v_max", lit(mx))
      .withColumn("bins", lit(bins))
  }

  /** The grid cell of `v` — left-associative arithmetic, mirrored
    * verbatim by the DuckDB oracle (IEEE doubles make the floor
    * deterministic across engines when the expression shape matches). */
  private def binOf(v: Column, mn: Double, mx: Double, bins: Int): Column =
    if (mx <= mn) lit(0)
    else greatest(
      least(floor((v - lit(mn)) * lit(bins) / lit(mx - mn)), lit(bins - 1)),
      lit(0L)) // below-domain values (fixed grids only) clamp to cell 0
      .cast("int")

  /** Quantile estimates per group from the view: for each q, the
    * smallest bin whose cumulative count reaches `ceil(q·N)`, read out
    * at the bin's midpoint. One cumulative window over ≤ n_groups × bins
    * rows — view-sized work. */
  def quantilesByGroup(view: DataFrame,
                       qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    quantilesOf(view, Seq(col("grp")), qs)

  /** Quantiles of the UNION of every group in `view` (any caller-filtered
    * subset): bin-wise counter sums — the mergeability step — then the
    * same cumulative walk. The corpus is never rescanned. */
  def rollupQuantiles(view: DataFrame,
                      qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    quantilesOf(
      view.groupBy(col("bin"), col("v_min"), col("v_max"), col("bins"))
        .agg(sum(col("cnt")).as("cnt")),
      Nil, qs)

  private def quantilesOf(binnedRaw: DataFrame, grpCols: Seq[Column],
                          qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.map(pName).distinct.size == qs.size,
      s"quantile labels collide after rounding to whole percents: " +
        qs.map(pName).mkString(", "))
    // cache around the two actions: the geometry probe and the quantile
    // walk would otherwise each re-execute the full binning plan (3
    // scans of the fact table for a fresh sketch instead of 1); the walk
    // result is eagerly checkpointed (it is n_groups rows) so the cache
    // can be dropped before returning
    val binned = binnedRaw.cache()
    try {
      val geoms = binned.select(col("v_min"), col("v_max"), col("bins"))
        .distinct().collect()
      // zero-row view (e.g. a streaming histogram store whose marker
      // exists but no batch has committed yet): empty result with the
      // quantile schema, not a misleading "mixes grid geometries" error
      // (r10 advice). walk-over-limit(0) keeps the schema construction
      // in ONE place; the outer limit(0) drops the single null row a
      // global (grpCols-empty) aggregate emits on empty input.
      if (geoms.isEmpty)
        return walk(binned.limit(0), grpCols, qs, 0.0, 1.0, 1).limit(0)
      require(geoms.length == 1,
        "quantiles: view mixes grid geometries — rollups need one shared grid")
      val (mn, mx, bins) =
        (geoms(0).getDouble(0), geoms(0).getDouble(1), geoms(0).getInt(2))
      walk(binned, grpCols, qs, mn, mx, bins).localCheckpoint(true)
    } finally { binned.unpersist(); () }
  }

  private def pName(q: Double) = "p" + (q * 100).round

  private def walk(c0: DataFrame, grpCols: Seq[Column], qs: Seq[Double],
                   mn: Double, mx: Double, bins: Int): DataFrame = {
    val w = Window.partitionBy(grpCols: _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(grpCols: _*)
    val c = c0
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val picks = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("bin")))
        .as("b" + pName(q)) // dot-free: col("b_0.5") would parse as nested
    }
    val est = qs.map { q =>
      round(lit(mn) + (col("b" + pName(q)) + lit(0.5)) *
          lit(mx - mn) / lit(bins), 6)
        .as(pName(q))
    }
    val grouped =
      if (grpCols.nonEmpty) c.groupBy(grpCols: _*).agg(picks.head, picks.tail: _*)
      else c.agg(picks.head, picks.tail: _*)
    grouped.select((grpCols ++ est): _*)
  }
}
