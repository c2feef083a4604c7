package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** One-off profiling harness (Test/runMain graft.ProfileBench <query> [sfDir]
  * [reps]): times a SparkEntry query with the Bench methodology (noop sink,
  * cache cleared between reps) while a SparkListener tallies jobs, stages,
  * tasks and executor task-time — enough to split a slow query into
  * "cluster-side work" (Σ task time / cores) vs "driver-side everything else"
  * (planning, codegen, job-launch latency, collect()s between jobs). */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc config experiments: PROFILE_CONF="k1=v1;k2=v2"
    sys.env.get("PROFILE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        val wallMs = (for {
          a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
        } yield a - b).getOrElse(0L)
        stageInfo.compute(s.stageInfo.stageId, (_, v) =>
          (s.stageInfo.name.takeWhile(_ != '\n').take(60),
            s.stageInfo.numTasks, wallMs, if (v == null) 0L else v._4))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskTimeMs += t.taskMetrics.executorRunTime
          gcTimeMs += t.taskMetrics.jvmGCTime
          stageInfo.compute(t.stageId, (_, v) =>
            if (v == null) ("?", 0, 0L, t.taskMetrics.executorRunTime)
            else v.copy(_4 = v._4 + t.taskMetrics.executorRunTime))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      // warmup at sf0.001 (codegen + readers), not counted
      try {
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[profile] warmup of $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      (1 to reps).foreach { i =>
        Thread.sleep(300) // let the listener bus drain the previous run
        jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; gcTimeMs = 0L
        stageInfo.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain before reading the tallies
        println(f"[profile] $name run$i wall=$wall%.2fs jobs=$jobs " +
          f"stages=$stages tasks=$tasks taskTime=${taskTimeMs / 1000.0}%.2fs " +
          f"gc=${gcTimeMs / 1000.0}%.2fs " +
          f"cpuUtil=${taskTimeMs / 1000.0 / (wall * cpus.toInt) * 100}%.0f%%")
        if (i == reps && sys.env.get("PROFILE_STAGES").contains("1")) {
          import scala.jdk.CollectionConverters._
          stageInfo.asScala.toSeq.sortBy(-_._2._4).take(12).foreach {
            case (id, (nm, nt, wallMs, ttMs)) =>
              println(f"[stage] $name $id%4d tasks=$nt%4d wall=${wallMs / 1000.0}%6.2fs " +
                f"taskTime=${ttMs / 1000.0}%6.2fs  $nm")
          }
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
