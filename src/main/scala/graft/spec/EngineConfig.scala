package graft.spec

import org.yaml.snakeyaml.Yaml
import java.io.{FileInputStream, InputStream}
import scala.jdk.CollectionConverters._

/** Service configuration with the reference's config.yaml shape and defaults
  * (server.go:94-111): windowSize 10 s, windowLag 2 s, consumer/producer topic
  * `metrics`, kafka bootstrap `localhost:9092`. The prometheus endpoint is
  * replaced by [[graft.streaming.Observability]]; checkpointing (which the
  * reference has no equivalent of — it hand-rolls offset commits) gets a
  * location here. */
case class EngineConfig(
    windowSize: Long = 10L,
    windowLag: Long = 2L,
    consumerTopic: String = "metrics",
    producerTopic: String = "metrics",
    kafkaBootstrapServers: String = "localhost:9092",
    checkpointRoot: String = "file:///tmp/graft-checkpoints",
    // "rocksdb" (default — streaming state spills to local disk, so group
    // cardinality is bounded by storage, not executor heap; the 100 TB
    // setting) or "hdfs" (Spark's in-memory default, fine for small state)
    stateStore: String = "rocksdb") {
  require(stateStore == "rocksdb" || stateStore == "hdfs",
    s"stateStore must be 'rocksdb' or 'hdfs', got '$stateStore'")

  def stateStoreProviderClass: String = stateStore match {
    case "rocksdb" =>
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    case _ =>
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  }
}

object EngineConfig {

  def load(path: String): EngineConfig = {
    val in = new FileInputStream(path)
    try load(in) finally in.close()
  }

  def load(in: InputStream): EngineConfig = {
    val root = Option(new Yaml().load[java.util.Map[String, AnyRef]](in))
      .map(_.asScala).getOrElse(scala.collection.mutable.Map.empty[String, AnyRef])
    def str(k: String, d: String) = root.get(k).map(_.toString).getOrElse(d)
    def lng(k: String, d: Long) = root.get(k).map(_.toString.toLong).getOrElse(d)
    val kafka = root.get("kafka") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (a, b) => a.toString -> b.toString }.toMap
      case _ => Map.empty[String, String]
    }
    EngineConfig(
      windowSize = lng("windowSize", 10L),
      windowLag = lng("windowLag", 2L),
      consumerTopic = str("consumerTopic", "metrics"),
      producerTopic = str("producerTopic", "metrics"),
      kafkaBootstrapServers = kafka.getOrElse("bootstrap.servers", "localhost:9092"),
      checkpointRoot = str("checkpointRoot", "file:///tmp/graft-checkpoints"),
      stateStore = str("stateStore", "rocksdb"))
  }
}
