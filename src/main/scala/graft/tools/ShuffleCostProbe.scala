package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbenchmark: per-map-task fixed cost of a tiny exchange, as a
  * function of map-side task count — isolates the ~100 ms/task
  * shuffleWriteTime seen on q_cluster_sizes' 33-task union stage. */
object ShuffleCostProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("PROBE_BYPASS_THRESHOLD").foreach(v =>
      builder.config("spark.shuffle.sort.bypassMergeThreshold", v))
    sys.env.get("PROBE_OPEN_COST").foreach(v =>
      builder.config("spark.sql.files.openCostInBytes", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$label%-60s median=${runs(2)}%8.1f ms  min=${runs.head}%8.1f")
    }

    val rows = (1L to 5000L).map(i => (i, i % 31))
    for (slices <- Seq(1, 4, 32)) {
      val df = spark.sparkContext.parallelize(rows, slices).toDF("k", "v")
      time(s"groupBy over $slices map slices -> 32-part exchange") {
        df.groupBy($"v").count().write.format("noop").mode("overwrite").save()
      }
    }
    // same but via a LOCAL relation (driver rows, LocalTableScan)
    val ldf = rows.toDF("k", "v")
    time("groupBy over LocalTableScan (default slices)") {
      ldf.groupBy($"v").count().write.format("noop").mode("overwrite").save()
    }
    time("groupBy over LocalTableScan coalesce(1)") {
      ldf.coalesce(1).groupBy($"v").count()
        .write.format("noop").mode("overwrite").save()
    }
    // no shuffle at all, for the baseline noop cost
    time("project only over 32 slices (no exchange)") {
      spark.sparkContext.parallelize(rows, 32).toDF("k", "v")
        .select($"k" + 1).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
