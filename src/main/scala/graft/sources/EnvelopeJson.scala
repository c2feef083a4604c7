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
    * creation_time), corrupt rows dropped. Fields absent from the JSON get Go
    * zero values (name "", timestamp 0.0, value 0.0, creation_time 0) exactly
    * as the reference's json.Unmarshal leaves them; an absent dimensions map
    * stays null (Go nil map — distinct from empty for the F2/F3 filters). */
  def parse(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(from_json(col(valueCol).cast("string"), Schemas.envelope).as("env"))
      .filter(col("env").isNotNull && col("env.metric").isNotNull)
      .select(
        struct(
          coalesce(col("env.metric.name"), lit("")).as("name"),
          col("env.metric.dimensions").as("dimensions"),
          coalesce(col("env.metric.timestamp"), lit(0.0)).as("timestamp"),
          coalesce(col("env.metric.value"), lit(0.0)).as("value"),
          col("env.metric.value_meta").as("value_meta")).as("metric"),
        col("env.meta").as("meta"),
        coalesce(col("env.creation_time"), lit(0L)).as("creation_time"))

  /** envelope columns → single JSON string column `value` (Kafka sink shape,
    * server.go:222-235). */
  def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("metric"), col("meta"), col("creation_time")))
      .as("value"))
}
