package graft

import graft.spec.{EngineConfig, SpecLoader}
import graft.streaming.{Observability, StreamRunner}
import org.apache.spark.sql.SparkSession

/** The deployable service — the equivalent of the reference's `main`
  * (server.go:338-416): load config + aggregation specs, start one
  * checkpointed Kafka→Kafka streaming query per rule, attach observability,
  * await termination.
  *
  * Usage: graft.Main [config.yaml] [aggregation-specifications.yaml]
  * (requires the spark-sql-kafka connector on the classpath and a reachable
  * broker; every piece below the Kafka source/sink is exercised broker-free
  * by the test suite through MemoryStream.)
  */
object Main {
  def main(args: Array[String]): Unit = {
    val config = args.headOption.map(EngineConfig.load).getOrElse(EngineConfig())
    val specsPath = args.lift(1).getOrElse("aggregation-specifications.yaml")
    val specs = SpecLoader.loadValidated(specsPath) // fatal on invalid, like the reference

    val spark = SparkSession.builder()
      .appName("monasca-aggregator-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.streaming.stateStore.providerClass",
        config.stateStoreProviderClass)
      .getOrCreate()

    val obs = Observability.attach(spark, config.windowSize)
    val queries = StreamRunner.run(spark, specs,
      servers = config.kafkaBootstrapServers,
      inTopic = config.consumerTopic,
      outTopic = config.producerTopic,
      windowSizeSec = config.windowSize,
      windowLagSec = config.windowLag,
      checkpointRoot = config.checkpointRoot)

    sys.addShutdownHook {
      queries.foreach(q => scala.util.Try(q.stop()))
      println(s"counters at shutdown: ${obs.snapshot}")
    }
    // supervision loop: a single failing rule must not take down the healthy
    // ones — log the failure, clear the terminated set, keep serving until no
    // query remains active. Fatal JVM errors propagate; if any rule failed by
    // the time the service drains, exit nonzero so the orchestrator restarts.
    var anyFailed = false
    while (spark.streams.active.nonEmpty) {
      try spark.streams.awaitAnyTermination()
      catch {
        case scala.util.control.NonFatal(e) =>
          anyFailed = true
          System.err.println(s"[graft] streaming query failed: ${e.getMessage}")
      }
      spark.streams.resetTerminated()
    }
    if (anyFailed) sys.exit(1)
  }
}
