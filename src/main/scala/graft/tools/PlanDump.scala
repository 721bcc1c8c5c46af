package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` of SparkEntry queries to files.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [names]
  *   outDir  directory for `<query>_<suffix>.txt` files (created)
  *   suffix  e.g. `before` / `after`
  *   names   comma-separated query subset (default: all)
  *
  * Plans are captured WITHOUT executing the queries (AQE leaves
  * `isFinalPlan=false`; what matters for the optimization audit is the
  * Exchange count, join strategy and PushedFilters, all visible in the
  * initial plan). A one-line summary per query (exchange count, join
  * node names) is printed so a sweep can be eyeballed in the log.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), plan)
        val nEx = "(?m)^\\s*[+:]?[- ]*\\bExchange\\b".r
          .findAllIn(plan).length max
          "\\(\\d+\\) Exchange".r.findAllIn(plan).length
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
          .r.findAllIn(plan).toSeq.groupBy(identity)
          .map { case (k, v) => s"$k×${v.size}" }.toSeq.sorted.mkString(",")
        println(f"PLAN $name%-28s exchanges=$nEx%2d joins=[$joins]")
      } catch {
        case e: Throwable =>
          println(s"PLAN $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
