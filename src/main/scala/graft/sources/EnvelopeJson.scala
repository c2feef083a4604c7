package graft.sources

import graft.model.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSON (de)serialization of MetricEnvelopes on the wire.
  *
  * Parity: the reference unmarshals each Kafka message and DROPS invalid JSON
  * with a warning instead of failing (server.go:307-313). `from_json` returns
  * null for corrupt records; the filter reproduces the drop.
  */
object EnvelopeJson {

  /** value bytes/string column → envelope columns (metric, meta,
    * creation_time), corrupt rows dropped. */
  def parse(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"), Schemas.envelope).as("env"))
      .filter(col("env").isNotNull && col("env.metric").isNotNull)
      .select(col("env.metric").as("metric"), col("env.meta").as("meta"),
        col("env.creation_time").as("creation_time"))

  /** envelope columns → single JSON string column `value` (Kafka sink shape,
    * server.go:222-235). */
  def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("metric"), col("meta"), col("creation_time")))
      .as("value"))
}
