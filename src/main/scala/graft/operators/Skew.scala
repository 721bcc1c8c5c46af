package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: two-phase salted aggregation.
  *
  * At 100 TB a handful of hot keys (one viral user, one empty-string
  * event_type) can pin an entire aggregation on one reducer. Salting splits
  * each key into `salts` sub-keys for the first shuffle, so the hot key's
  * rows spread across `salts` reducers; a second, tiny shuffle over the
  * partial results produces exact totals. Phase-2 input cardinality is
  * |keys|·salts regardless of row skew — the hot key costs the same as any
  * other.
  *
  * Complements (not replaces) the built-ins: map-side partial aggregation
  * already absorbs most count/sum skew, and AQE splits skewed *join*
  * partitions; explicit salting is for aggregations whose partial states
  * are large (collect_list, count-distinct buffers) where per-partition
  * combining isn't enough.
  *
  * The salt derives from a caller-supplied unique column (deterministic,
  * replay-stable) rather than `rand()` — streaming replays and speculative
  * task retries must salt identically.
  */
object Skew {

  private def salt(saltSource: Column, salts: Int): Column =
    pmod(hash(saltSource), lit(salts))

  /** Exact per-key counts via salted two-phase aggregation. */
  def saltedCount(df: DataFrame, key: String, saltSource: Column,
                  salts: Int = 16): DataFrame =
    df.groupBy(col(key), salt(saltSource, salts).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Exact per-key collected values (sorted multiset) via salted two-phase
    * aggregation — the skew-safe form of `collect_list`, whose single-phase
    * state for a hot key would be one giant buffer on one reducer. */
  def saltedCollectList(df: DataFrame, key: String, valueCol: String,
                        saltSource: Column, salts: Int = 16): DataFrame =
    df.groupBy(col(key), salt(saltSource, salts).as("__salt"))
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("__partial")))).as("values"))

  /** Exact per-key distinct counts: salt the (key, value) dedup shuffle,
    * then count distinct values per key from the deduped rows. */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df.groupBy(col(key), salt(col(valueCol), salts).as("__salt"))
      .agg(size(collect_set(col(valueCol))).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))

  /** Exact inner equi-join with a salted shuffle — the skew escape for a
    * fact⋈dim join where the dim is TOO BIG to broadcast and a hot fact
    * key would pin one reducer of a plain shuffled join.
    *
    * The fact side gets one deterministic salt per row; the dim side is
    * replicated `salts` ways (an `explode` over the salt range — a
    * projection, no shuffle of its own), and the join key becomes
    * (key, salt), so the hot key's probe rows spread across `salts`
    * reducers. Exactness is unconditional: each fact row carries exactly
    * one salt and the dim holds every (row, salt) replica, so the match
    * set per fact row is identical to the unsalted join — the salt only
    * re-deals rows to reducers. The price is dim shuffle volume × salts;
    * worth paying when fact-side skew dominates, which is why this stays
    * an explicit operator rather than a default.
    *
    * Prefer AQE's skew-join split (`spark.sql.adaptive.skewJoin`) when it
    * applies — it pays no replication until a partition actually skews.
    * Explicit salting remains for the cases AQE cannot rewrite: streaming
    * joins inside `foreachBatch` pipelines where stats lag, broadcast-hash
    * plans AQE will not split, and joins feeding a same-key aggregation
    * where the salt must survive into the grouping key (compose with
    * [[saltedCount]]'s two-phase rollup).
    *
    * The salt derives from `saltSource` (any roughly-uniform column on the
    * fact side, e.g. its primary key), never `rand()` — retries and
    * streaming replays must salt identically. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 saltSource: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val probe = fact.withColumn("__salt", salt(saltSource, salts))
    val build = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    probe.join(build,
        probe("__salt") === build("__salt") &&
          probe(factKey) === build(dimKey))
      .drop("__salt")
  }
}
