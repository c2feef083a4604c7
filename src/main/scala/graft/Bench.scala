package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Methodology: each query is first executed once at sf0.001 (warmup — JVM
  * JIT, codegen compilation, parquet reader init, catalog caches), then timed
  * at the target scale factor writing to the noop sink, which forces full
  * column materialization (a bare count() would let Catalyst prune most of
  * the work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Unit =
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache() // operators persist LSH relations;
                                         // don't let them accumulate across queries

    // throughput probe FIRST: after the full two-pass query sweep the JVM is
    // hot but cache-churned and the recorded eps under-reads the pipeline by
    // ~10× (38K vs 136K–1.2M when probed fresh); median of 5 timed runs
    // evens out the run-to-run swing on a contended box (r06's median-of-3
    // spread was 4.6× on identical code), and the min is recorded alongside
    // as the contention-floor bound
    val (eps, epsMin, epsRuns) = ingestThroughput(spark)

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      // a query that fails at warmup would otherwise hide until the timed
      // run — surface the message immediately
      try exec(n, "/root/testdata/sf0.001")
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup of $n failed: ${e.getMessage}")
      }
    }

    // best of two timed runs per query — evens out GC/compilation noise;
    // a failed query reports -1 instead of masquerading as a fast success
    val results = names.map { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { exec(name, sfDir); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      """"query_repeat_policy":"min-of-2 timed runs per query, after a sf0.001 warmup pass",""" +
      s""""throughput_eps":$eps,""" +
      s""""throughput_eps_min":$epsMin,""" +
      """"throughput_policy":"median-of-5 after a discarded warmup run (min recorded); runs list includes the warmup first",""" +
      s""""throughput_eps_runs":${epsRuns.mkString("[", ",", "]")},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }

  /** Ingest-throughput probe against the reference's one published number
    * (">50K metrics/sec", README.md:62-63): JSON envelopes/sec through the
    * reference hot path — parse → rule match → window-group aggregate
    * (server.go:307-332). JSON strings are pre-materialized and persisted so
    * only the ingest pipeline is timed. Six runs: the FIRST is codegen/JIT
    * warmup and is excluded from both statistics (a cold-start min would
    * masquerade as the contention floor); the median and min are taken over
    * the 5 post-warmup runs (the median is robust to GC/contention-noisy
    * runs — r06's median-of-3 still spanned 4.6× on identical code).
    * Returns (median, min, all runs incl. warmup in execution order) so both
    * the number of record and its floor are auditable in the bench JSON. */
  private def ingestThroughput(spark: SparkSession): (Double, Double, Seq[Double]) = {
    val runs = (1 to 6).map(_ => ingestThroughputOnce(spark))
    val timed = runs.tail
    (timed.sorted.apply(2), timed.min, runs)
  }

  private def ingestThroughputOnce(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    import graft.model.AggregationSpec
    import graft.plan.RuleCompiler
    import graft.sources.EnvelopeJson
    val n = 4000000L
    val envelopes = spark.range(n).select(
      struct(
        concat(lit("metric"), (col("id") % 5).cast("string")).as("name"),
        map(
          // integer division: Spark's `/` on longs is double division and
          // would produce fractional service ids (12 groups, not 6)
          lit("service"), (expr("id div 2") % 3).cast("string"),
          lit("hostname"), (col("id") % 2).cast("string")).as("dimensions"),
        (lit(1700000000000.0) + col("id") * 10).as("timestamp"),
        ((col("id") % 1000) / 7.0).as("value"),
        map().cast("map<string,string>").as("value_meta")).as("metric"),
      map(lit("tenantId"), (col("id") % 3).cast("string")).as("meta"),
      lit(0L).as("creation_time"))
    val json = EnvelopeJson.serialize(envelopes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    json.count() // materialize outside the timed section
    val spec = AggregationSpec(name = "ingest", function = "avg",
      filteredMetricName = "metric0",
      groupedDimensions = Seq("service", "hostname"),
      aggregatedMetricName = "agg0")
    val t0 = System.nanoTime()
    RuleCompiler.compile(spec, 10L)(EnvelopeJson.parse(json))
      .write.format("noop").mode("overwrite").save()
    val eps = n / ((System.nanoTime() - t0) / 1e9)
    json.unpersist()
    eps
  }
}
