package graft.sources

import org.apache.spark.sql.SparkSession

/** Engine-level Spark tuning shared by every main (Bench, Verify, dev
  * tools): scale-adaptive settings with env overrides, never constants
  * tuned to one host shape.
  *
  *  - `spark.shuffle.sort.bypassMergeThreshold` (default here 0, env
  *    `SPARK_GRAFT_BYPASS_THRESHOLD`): with the default 200, every
  *    exchange below 200 reduce partitions uses the bypass writer — one
  *    file PER REDUCE PARTITION per map task. At production reducer
  *    counts (>200) the sort writer is the standard path anyway; forcing
  *    it everywhere makes local runs match production behavior and
  *    removes measured ~2.5 ms/map-task of tiny-file churn (a 32-map-task
  *    micro-exchange dropped 223 ms → 137 ms median, ShuffleCostProbe).
  *
  *  `spark.sql.files.openCostInBytes` was evaluated and deliberately left
  *  at Spark's default: the fixtures are single-row-group parquet files,
  *  so byte-range splitting below one file CANNOT raise real scan
  *  parallelism — lowering open cost only added empty splits (measured
  *  q_top_brands 0.84 → 1.05 s at 256 KiB). Scan-side parallelism for
  *  CPU-dense stages is instead handled by the operators' explicit
  *  parallelism floor (Dedup.spreadByKey / scanParallelismBelow), which
  *  no-ops at warehouse scale.
  */
object EngineConf {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
}
