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
}
