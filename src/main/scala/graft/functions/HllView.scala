package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count cube via HyperLogLog sketches — the COUNT
  * DISTINCT twin of [[CmsSketch.sketchBySource]]'s frequency view.
  *
  * `COUNT(DISTINCT …)` is the one aggregate that does not decompose: a
  * per-source exact distinct CANNOT roll up (distinct tokens overlap
  * across sources), so every ad-hoc subset question re-scans the corpus.
  * The lakehouse answer is a sketch view: one HLL sketch per source
  * (Flajolet et al. 2007; Spark ships the Apache DataSketches HLL as
  * `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`), persisted as
  * a few-KB binary per group. ANY later rollup — one source, a subset,
  * the whole corpus — is a union of sketch registers over the VIEW:
  * register-wise max commutes and associates, so the union sketch is
  * IDENTICAL to the sketch a single pass over the union would build
  * (HllViewSpec pins this end to end), and the corpus is never rescanned.
  *
  * Estimates are approximate (default lgK 12 ⇒ ~1.6 % standard error —
  * the spec asserts the bound against exact twins), which is why the
  * driver checks `q_hll_by_source` rows-only, like the other sketch
  * surfaces (`q_approx_distinct_users`, `q_median_approx`).
  *
  * Scale shape: building the view is one hash aggregate (partial sketches
  * merge map-side); the view is `n_groups × ~4 KB`; every rollup is
  * view-sized work. At 100 TB this turns "distinct tokens in sources
  * {A,C,F} last month?" from a corpus scan into a millisecond merge.
  */
object HllView {

  /** One HLL sketch of the distinct token stream per source. `lgK` sets
    * the register count (2^lgK); all sketches in a view must share it so
    * unions stay register-aligned. */
  def sketchBySource(docs: DataFrame, lgK: Int = 12): DataFrame =
    docs
      .select(col("source"),
        explode(expr(graft.operators.TextAnalysis.tokensExpr)).as("tok"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), lit(lgK)).as("sketch"))

  /** Per-source distinct-token estimates from the view — the cube's leaf
    * cells, no corpus touch. */
  def distinctBySource(view: DataFrame): DataFrame =
    view.select(col("source"),
      hll_sketch_estimate(col("sketch")).as("distinct_tokens"))

  /** Distinct tokens across ALL of the view's rows (any subset the caller
    * pre-filtered): one register-wise union over n_view_rows sketches,
    * then the estimator. */
  def rollupDistinct(view: DataFrame): DataFrame =
    view.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("distinct_tokens"))
}
