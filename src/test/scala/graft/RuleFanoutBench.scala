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

    def run(n: Int): Double = {
      val union = specs(n).map { case (sp, w) => RuleCompiler.compile(sp, w)(envs) }
        .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      union.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run(100) // warmup: codegen + JIT + parquet reader init for the widest job
    val counts = Seq(1, 25, 50, 100)
    val times = counts.map(n => n -> run(n))
    times.foreach { case (n, t) => println(f"rules=$n%3d  total=$t%6.2f s") }
    val (n1, t1) = times.head
    val (nN, tN) = times.last
    println(f"marginal per-rule cost ≈ ${(tN - t1) / (nN - n1) * 1000}%.1f ms/rule " +
      f"(slope $n1→$nN rules, sf0.01, local[32])")
    spark.stop()
  }
}
