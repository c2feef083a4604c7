package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement behind SCALE.md's multi-rule fan-out note: the
  * reference iterates every configured rule per message
  * (/root/reference/server.go:316-320), so its per-message cost grows with
  * the config file. Our batch analog is one compiled query per rule unioned
  * into a single job (`f5_multi_rule` at N=2) — this times that shape at
  * config-file scale (N = 1, 25, 50, 100 synthetic specs cycling through
  * the five event types × five functions × grouped/ungrouped × hour/day
  * windows) over the sf0.01 events table, to record the marginal cost of
  * one more rule instead of asserting it.
  *
  * Run: sbt 'Test/runMain graft.RuleFanoutBench'
  */
object RuleFanoutBench {
  def main(args: Array[String]): Unit = {
    import graft.model.AggregationSpec
    import graft.plan.RuleCompiler
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val envs = graft.sources.EventsAdapter.envelopes(spark, "/root/testdata/sf0.01")

    val types = Seq("click", "purchase", "view", "signup", "error")
    val fns = Seq("sum", "count", "avg", "min", "max")
    def specs(n: Int): Seq[(AggregationSpec, Long)] = (0 until n).map { i =>
      (AggregationSpec(name = s"rule$i", function = fns(i % 5),
        filteredMetricName = types(i / 5 % 5),
        groupedDimensions = if (i % 2 == 0) Seq("user_id") else Seq.empty,
        aggregatedMetricName = s"agg$i"),
        if (i % 3 == 0) 3600L else 86400L)
    }

    // three shapes per N:
    //  separate — one query submission PER RULE (the naive config loop)
    //  union    — per-rule plans unioned into one job, no shared pre-filter
    //  shared   — RuleCompiler.compileAll: one job + name-isin pre-filter
    def runSeparate(n: Int): Double = {
      val t0 = System.nanoTime()
      specs(n).foreach { case (sp, w) =>
        RuleCompiler.compile(sp, w)(envs).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    def runUnion(n: Int): Double = {
      val union = specs(n).map { case (sp, w) => RuleCompiler.compile(sp, w)(envs) }
        .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      union.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def runShared(n: Int): Double = {
      val all = RuleCompiler.compileAll(specs(n))(envs)
      val t0 = System.nanoTime()
      all.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    runShared(100) // warmup: codegen + JIT + parquet reader init for the widest job
    val counts = Seq(1, 25, 50, 100)
    val times = counts.map(n =>
      (n, runSeparate(n), runUnion(n), runShared(n)))
    println(f"${"rules"}%5s  ${"separate"}%9s  ${"union"}%9s  ${"shared"}%9s")
    times.foreach { case (n, s, u, h) =>
      println(f"$n%5d  $s%8.2fs  $u%8.2fs  $h%8.2fs") }
    def slope(f: ((Int, Double, Double, Double)) => Double): Double = {
      val (n1, nN) = (times.head._1, times.last._1)
      (f(times.last) - f(times.head)) / (nN - n1) * 1000
    }
    println(f"marginal ms/rule (1→100, sf0.01, local[32]): " +
      f"separate ${slope(_._2)}%.1f  union ${slope(_._3)}%.1f  shared ${slope(_._4)}%.1f")
    spark.stop()
  }
}
