package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose
  * custom Catalyst expressions as `Column`s in Spark 4's unified Column
  * API. Kept to these two calls — everything else uses public API. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The cached RDD behind a `localCheckpoint`-ed Dataset, if any.
    * `Dataset.unpersist()` is a no-op for checkpointed plans (the persist
    * lives on the underlying RDD, not in the CacheManager), so iterative
    * algorithms that checkpoint per round must unpersist this RDD directly
    * to bound executor storage by one round, not by `maxIters`. */
  def checkpointRdd(ds: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  /** The session's `spark.sql.autoBroadcastJoinThreshold` in bytes
    * (−1 = broadcasting disabled). Read via `sessionState.conf` (the
    * typed SQLConf accessor is `private[sql]`) so size-gated broadcast
    * hints respect the same knob Catalyst's own join planning uses. */
  def autoBroadcastThreshold(spark: SparkSession): Long =
    spark.sessionState.conf.autoBroadcastJoinThreshold

  /** Sum of `numOutputRows` across every file-scan leaf of an EXECUTED
    * plan, descending through AQE's final plan and query stages. With
    * the vectorized parquet reader this counts DECODED rows — the rows
    * of exactly those row groups/pages that survived pushed-predicate
    * pruning (per-row filtering happens above the scan) — so specs can
    * assert "this probe decoded the candidates' row groups, not the
    * partition" from the engine's own metric. (TaskMetrics
    * `inputMetrics.bytesRead` undercounts the vectorized reader's IO on
    * local files, so byte-level metering is not usable for this.) */
  def scanOutputRows(ds: Dataset[_]): Long = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      case other => other.children.map(walk).sum
    }
    walk(ds.queryExecution.executedPlan)
  }

  /** Column names crossing each shuffle exchange in a physical plan —
    * lets PlanSpec assert that wide payloads (document text) never ride an
    * exchange. Descends into AQE's adaptive wrapper, which hides the
    * initial plan from a plain `collect`. */
  def collectShuffles(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[Seq[String]] = {
    val unwrapped = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    unwrapped.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name).toSeq
    }
  }
}
