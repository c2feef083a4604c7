package graft.streaming

import graft.model.AggregationSpec
import graft.plan.RuleCompiler
import graft.sources.KafkaIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming execution of compiled aggregation rules — the
  * replacement for the reference's main loop (server.go:338-416).
  *
  * Mapping of the reference's timing machinery:
  *  - windowSize ticker + firstTick alignment (server.go:204-210, 377-388, W3)
  *    → `Trigger.ProcessingTime(windowSize)`; emission instants are not
  *    epoch-aligned, but window contents/boundaries are identical (see
  *    SURVEY.md §7.4.1).
  *  - windowLag / activeTimeWindow emission cutoff (server.go:213-218, W2)
  *    → `withWatermark(event_ts, windowLag)` + append output mode: a window is
  *    emitted exactly once, when the watermark passes its end.
  *  - deleteInactiveTimeWindows (server.go:291-305, W4) → automatic state-store
  *    eviction past the watermark.
  *  - data later than an emitted window: the reference resurrects the window
  *    and re-emits a partial duplicate (SURVEY.md §2.1.4); we drop it —
  *    deliberate, documented divergence.
  *
  * One streaming query per rule (the reference also evaluates rules
  * independently per message, server.go:316-320); rules share the Kafka
  * source but keep isolated state and checkpoints.
  */
object StreamRunner {

  /** The same compiled stages as the batch path, with the watermark inserted
    * between key-extraction and aggregation. Works for any envelope-schema
    * streaming DataFrame (Kafka, MemoryStream, rate-shaped). */
  def buildStreaming(spec: AggregationSpec, windowSizeSec: Long, windowLagSec: Long)(
      envelopes: DataFrame): DataFrame = {
    val prepared = RuleCompiler.prepare(spec)(envelopes)
      .withWatermark("event_ts", s"$windowLagSec seconds")
    val grouped = RuleCompiler.aggregate(spec, windowSizeSec)(prepared)
    // rollup re-aggregates on the time-window column itself — a chained
    // stateful aggregation, natively supported in append mode on Spark 3.5+
    val finalGrouped =
      if (spec.rollup.isDefined) RuleCompiler.rollup(spec, windowSizeSec)(grouped) else grouped
    RuleCompiler.project(spec)(finalGrouped)
  }

  /** End-to-end Kafka→Kafka deployment: one checkpointed append-mode query per
    * rule. Equivalent of the whole reference service. */
  def run(spark: SparkSession, specs: Seq[AggregationSpec], servers: String,
      inTopic: String, outTopic: String, windowSizeSec: Long, windowLagSec: Long,
      checkpointRoot: String): Seq[StreamingQuery] = {
    val source = KafkaIO.readEnvelopes(spark, servers, inTopic)
    specs.map { spec =>
      KafkaIO.writeEnvelopes(
          buildStreaming(spec, windowSizeSec, windowLagSec)(source),
          servers, outTopic, s"$checkpointRoot/${spec.name}")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(s"$windowSizeSec seconds"))
        .queryName(spec.name)
        .start()
    }
  }

  /** S4 — test-data generator with the reference publisher's shape
    * (tools/publisher.go:66-90): every second, a 3-services × 2-hostnames grid
    * of `metric2` envelopes with value 2.0, timestamp = now (ms), empty meta.
    * Built on the rate source: 6 rows/sec → (service, hostname) from the
    * sequence number. */
  def publisherStream(spark: SparkSession, rowsPerSecond: Int = 6): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()
      .select(
        struct(
          lit("metric2").as("name"),
          map(
            lit("service"), ((col("value") / 2) % 3).cast("long").cast("string"),
            lit("hostname"), (col("value") % 2).cast("string")).as("dimensions"),
          (col("timestamp").cast("double") * 1000).as("timestamp"),
          lit(2.0).as("value"),
          map().cast("map<string,string>").as("value_meta")).as("metric"),
        map().cast("map<string,string>").as("meta"),
        lit(0L).as("creation_time"))
}
