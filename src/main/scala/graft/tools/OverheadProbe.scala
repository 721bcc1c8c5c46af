package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev microbenchmark: per-query-build fixed costs — parquet schema
  * inference in Tables.load vs an explicit-schema read, and the
  * `df.rdd.getNumPartitions` probe in Dedup.spreadByKey. Informs whether
  * caching fixture schemas / partition counts is worth it. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e6 / reps}%8.2f ms/op")
    }

    time("read.parquet(events) build", 50) {
      spark.read.parquet(s"$d/events.parquet")
    }
    val schema = spark.read.parquet(s"$d/events.parquet").schema
    time("read.schema(s).parquet(events) build", 50) {
      spark.read.schema(schema).parquet(s"$d/events.parquet")
    }
    time("Tables.events full load", 50) {
      graft.sources.Tables.events(spark, d)
    }
    time("df.rdd.getNumPartitions on scan", 50) {
      graft.sources.Tables.documents(spark, d).rdd.getNumPartitions
    }
    time("stats.sizeInBytes on scan", 50) {
      graft.sources.Tables.documents(spark, d)
        .queryExecution.optimizedPlan.stats.sizeInBytes
    }
    time("noop write of 1-row range", 20) {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
