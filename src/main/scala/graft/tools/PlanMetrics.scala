package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: execute a SparkEntry query (noop sink) and print the FINAL
  * executed plan tree with each node's SQL metrics (rows, time, spill,
  * bytes) — the SQL-tab-equivalent view the sandbox's missing UI would
  * show. Maps stage-level mysteries (JobProbe) back to operators.
  *
  * Usage: runMain graft.tools.PlanMetrics <q1,q2,...> [reps]
  */
object PlanMetrics {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.EngineConf.tuned(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def dump(plan: SparkPlan, depth: Int): Unit = {
      val interesting = plan.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) =>
          val v = m.metricType match {
            case "timing" => s"${m.value} ms"
            case "nsTiming" => s"${m.value / 1000000} ms"
            case "size" => s"${m.value / 1024} KB"
            case _ => m.value.toString
          }
          s"$k=$v"
        }.mkString(", ")
      println("  " * depth + s"${plan.nodeName}: $interesting")
      val children = plan match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          Seq(r.child)
        case p => p.children ++ p.subqueries
      }
      children.foreach(dump(_, depth + 1))
    }

    // the noop write runs its own QueryExecution; grab it (with populated
    // metrics) via the execution listener rather than the DataFrame's own
    var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = lastQe = qe
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      var t = 0.0
      (1 to reps + 1).foreach { i => // rep 0 = warmup
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        t = (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300) // listener bus drain
      println(f"\n=== $name last-rep ${t}%.3f s")
      dump(lastQe.executedPlan, 1)
    }
    spark.stop()
  }
}
