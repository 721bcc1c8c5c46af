package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan and cold/warm timings of one or more
  * SparkEntry queries. Usage: runMain graft.Explain q_a,q_b [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    for (name <- args(0).split(",")) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, d)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"cold: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"warm: ${(System.nanoTime() - t1) / 1e9}%6.2f s")
      df.explain("formatted")
    }
    spark.stop()
  }
}
