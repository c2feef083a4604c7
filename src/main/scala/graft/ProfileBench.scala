package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query execution profiler (optimization-guide §1 "measure first"):
  * runs selected SparkEntry queries with a SparkListener attached and
  * reports, per query, the JOB count, STAGE count, TASK count, summed
  * executor task time, summed GC time, shuffle bytes read/written, and the
  * wall time — the numbers that tell scheduling overhead (many near-empty
  * tasks / BSP job latency) apart from genuine compute, which the bench's
  * single wall-clock number cannot.
  *
  * Usage: `sbt "runMain graft.ProfileBench q1 q2 ..."` — same env contract
  * as Bench (`SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`); each query gets one
  * sf0.001 warmup, then `SPARK_GRAFT_PROFILE_RUNS` (default 2) timed runs at
  * the target SF with per-run metrics (noop sink, cache cleared between
  * runs, the Bench discipline). Diagnostics only — never an artifact the
  * driver reads. */
object ProfileBench {
  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcMs = 0L
    @volatile var shufReadB = 0L
    @volatile var shufWriteB = 0L
    val jobLog = new scala.collection.mutable.ListBuffer[(Int, Long, String)]
    private val jobStartMs = new scala.collection.mutable.HashMap[Int, (Long, String)]
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      jobs += 1
      jobStartMs(j.jobId) = (j.time,
        Option(j.properties).map(_.getProperty("spark.job.description", ""))
          .getOrElse(""))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobStartMs.remove(j.jobId).foreach { case (t0, desc) =>
        jobLog += ((j.jobId, j.time - t0, desc))
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        if (m.shuffleReadMetrics != null) shufReadB += m.shuffleReadMetrics.totalBytesRead
        if (m.shuffleWriteMetrics != null) shufWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcMs = 0
      shufReadB = 0; shufWriteB = 0; jobLog.clear(); jobStartMs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc A/B lever: SPARK_GRAFT_PROFILE_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    def exec(name: String, dir: String): Unit =
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-28s run  wall_s  jobs stages tasks taskT_s  gc_s  shufR_MB shufW_MB")
    names.foreach { n =>
      try {
        spark.sparkContext.setJobDescription(s"warmup $n")
        exec(n, "/root/testdata/sf0.001")
        (1 to runs).foreach { i =>
          // listener bus is async; give stragglers a beat before reset/read
          Thread.sleep(400)
          acc.reset()
          spark.sparkContext.setJobDescription(s"timed $n")
          val t0 = System.nanoTime()
          exec(n, sfDir)
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(400)
          println(f"$n%-28s $i%3d $wall%7.2f ${acc.jobs}%5d ${acc.stages}%6d " +
            f"${acc.tasks}%5d ${acc.taskTimeMs / 1e3}%7.1f ${acc.gcMs / 1e3}%5.1f " +
            f"${acc.shufReadB / 1e6}%9.1f ${acc.shufWriteB / 1e6}%8.1f")
          if (i == runs && sys.env.contains("SPARK_GRAFT_PROFILE_JOBS"))
            acc.jobLog.toList.foreach { case (id, ms, desc) =>
              println(f"    job $id%4d ${ms}%6d ms  ${desc.take(90)}")
            }
        }
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
