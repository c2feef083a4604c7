package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink wiring — the Structured Streaming replacement for the
  * reference's hand-rolled consumer/producer + offset machinery.
  *
  * Parity notes:
  *  - source (server.go:145-170): subscribe one topic, start earliest,
  *    auto-commit off. Spark's Kafka source never auto-commits; progress
  *    lives in the checkpoint — which also replaces the entire
  *    offsetCache/commitOffsets recovery subsystem (server.go:244-288, O1):
  *    offsets and state are versioned together, giving the same
  *    at-least-once-or-better guarantee with none of the code.
  *  - sink (server.go:212-242): JSON envelopes produced with no key
  *    (PartitionAny).
  *
  * The Kafka connector jar is an external package; these builders are
  * format-string based so the library compiles and tests without it (streaming
  * logic is tested through MemoryStream, which exercises the identical plan).
  */
object KafkaIO {

  /** Raw Kafka stream → envelope columns (metric, meta, creation_time). */
  def readEnvelopes(spark: SparkSession, servers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    EnvelopeJson.parse(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())

  /** Envelope columns → Kafka JSON sink writer (caller sets trigger/
    * checkpoint and starts it). */
  def writeEnvelopes(df: DataFrame, servers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[Row] =
    EnvelopeJson.serialize(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
}
