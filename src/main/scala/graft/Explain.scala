package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    for (name <- args(0).split(",")) {
      println(s"===== $name =====")
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      // summarize: node types + pushed filters + codegen markers
      plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.matches("^[+:*].*") || t.contains("PushedFilters") || t.contains("ReadSchema"))
          println(l.replaceAll("#\\d+L?", ""))
      }
    }
    spark.stop()
  }
}
