package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Tables

/** Measures what the Z-order layout actually buys at scale: for the same
  * events table written as (a) a time-sorted layout and (b) a Z-ordered
  * (user × time) layout, how many files each of three probe shapes must
  * read (the min/max intersection rule parquet prunes by), and the
  * wall-clock of the filtered scans themselves.
  *
  * Probes mirror the two dashboards a 100 TB event store serves at once:
  * "one user's history" (narrow user × all time — the query a time layout
  * CANNOT prune), "what happened this hour" (all users × narrow time —
  * the time layout's home game), and the drill-down box (narrow × narrow).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.LayoutBench
  * [files=128]` — point the dir at a [[ScaleUp]] replica for the growth
  * curve. Prints one `LAYOUTBENCH {...}` JSON line.
  */
object LayoutBench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val files = if (args.nonEmpty) args(0).toInt else 128
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-layout-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("epoch"))
    val base = java.nio.file.Files
      .createTempDirectory("graft-layout-bench").toString

    val (_, tTime) = timed {
      events.repartitionByRange(files, col("epoch"))
        .sortWithinPartitions(col("epoch"))
        .write.mode("overwrite").parquet(s"$base/by_time")
    }
    val (_, tZ) = timed {
      Layout.writeZOrdered(events, s"$base/zorder", "user_id", "epoch",
        files)
    }

    val u = events.agg(min("user_id"), max("user_id")).head()
    val t = events.agg(min("epoch"), max("epoch")).head()
    val (uLo, uHi) = (u.getLong(0), u.getLong(1))
    val (tLo, tHi) = (t.getLong(0), t.getLong(1))
    val uSpan = uHi - uLo; val tSpan = tHi - tLo
    // (label, user box, time box): 1/16 slices on the narrow axes
    val probes = Seq(
      ("user_history", (uLo, uLo + uSpan / 16), (tLo, tHi)),
      ("time_window", (uLo, uHi), (tLo, tLo + tSpan / 16)),
      ("drill_down", (uLo, uLo + uSpan / 16), (tLo, tLo + tSpan / 16)))

    def scanTime(path: String, ub: (Long, Long), tb: (Long, Long)): Double = {
      val df = spark.read.parquet(path)
        .filter(col("user_id").between(ub._1, ub._2) &&
          col("epoch").between(tb._1, tb._2))
      // count forces the scan; filters reach parquet via pushdown
      timed(df.count())._2
    }

    val results = probes.map { case (label, ub, tb) =>
      val (zt, zn) = Layout.prunedFiles(spark, s"$base/zorder",
        "user_id", "epoch", ub._1, ub._2, tb._1, tb._2)
      val (tt, tn) = Layout.prunedFiles(spark, s"$base/by_time",
        "user_id", "epoch", ub._1, ub._2, tb._1, tb._2)
      val zSec = scanTime(s"$base/zorder", ub, tb)
      val tSec = scanTime(s"$base/by_time", ub, tb)
      s""""$label":{"zorder_files":$zt,"time_files":$tt,"total":$zn,""" +
        f""""zorder_scan_sec":$zSec%.3f,"time_scan_sec":$tSec%.3f}"""
        .ensuring(zn == tn)
    }

    val rows = events.count()
    println(s"""LAYOUTBENCH {"rows":$rows,"files":$files,""" +
      f""""write_time_sorted_sec":$tTime%.2f,"write_zorder_sec":$tZ%.2f,""" +
      s"""${results.mkString(",")},"dir":"$dir"}""")
    spark.stop()
  }
}
