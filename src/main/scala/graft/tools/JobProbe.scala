package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev microbenchmark: per-JOB / per-STAGE wall+metric breakdown of a
  * SparkEntry query (guide §1.1 "empirical" loop, sans UI — the sandbox
  * has no Spark UI, so a listener stands in for the Stages tab).
  *
  * Usage: runMain graft.tools.JobProbe <q1,q2,...> [reps]
  *
  * For each query: warmup run, then `reps` timed runs (noop sink, same as
  * Bench). After the LAST timed run prints one line per job and per stage:
  * wall ms, task count, summed executor run time, shuffle read/write
  * bytes, spill — the numbers that say whether time goes to scheduling
  * (many tiny jobs), shuffle, or compute.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.EngineConf.tuned(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class StageRec(jobId: Int, stageId: Int, name: String, wallMs: Long,
                        tasks: Int, runMs: Long, shRead: Long, shWrite: Long,
                        spill: Long, inBytes: Long)
    case class JobRec(jobId: Int, wallMs: Long)
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val jobStart = mutable.Map.empty[Int, Long]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart(js.jobId) = js.time
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs += JobRec(je.jobId, je.time - jobStart.getOrElse(je.jobId, je.time))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += StageRec(
          stageToJob.getOrElse(si.stageId, -1), si.stageId,
          si.name.split(" at ").headOption.getOrElse(si.name),
          (for {e <- si.completionTime; s <- si.submissionTime} yield e - s)
            .getOrElse(-1L),
          si.numTasks, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.inputMetrics.bytesRead)
      }
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val warm2 = run()
      spark.sparkContext.addSparkListener(listener)
      stages.clear(); jobs.clear()
      val times = (1 to reps).map(_ => run())
      spark.sparkContext.removeSparkListener(listener)
      // listener events are posted async; let the bus drain
      Thread.sleep(300)
      println(f"\n=== $name reps=$reps times=${times.map(t => f"$t%.3f").mkString(",")} (warm2=$warm2%.3f)")
      val perRep = jobs.size / reps
      println(s"    jobs/run=$perRep (total ${jobs.size})")
      // report the LAST rep's jobs+stages (steady state)
      jobs.takeRight(perRep).foreach { j =>
        println(f"  job ${j.jobId}%4d wall=${j.wallMs}%5d ms")
        stages.filter(s => s.jobId == j.jobId).foreach { s =>
          println(f"    stage ${s.stageId}%4d wall=${s.wallMs}%5d ms tasks=${s.tasks}%3d " +
            f"run=${s.runMs}%6d ms shR=${s.shRead / 1024}%7d KB shW=${s.shWrite / 1024}%7d KB " +
            f"in=${s.inBytes / 1024}%8d KB spill=${s.spill}%d  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
