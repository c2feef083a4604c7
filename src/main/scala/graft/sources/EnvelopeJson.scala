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
    * stays null (Go nil map — distinct from empty for the F2/F3 filters).
    *
    * The corrupt-drop rides a GENERATOR, not a Filter: with the original
    * `select(from_json).filter(isNotNull)` shape the optimizer collapses the
    * projection into the filter and pushes the filter toward the scan, so
    * the full JSON parse was evaluated THREE times per row — twice inside
    * the pushed filter condition (env IS NOT NULL, env.metric IS NOT NULL)
    * and once more in the surviving projection (r17 plan audit; the
    * optimization guide's §4.4 duplicated-evaluation failure mode, in pure
    * JVM expression form). `explode(filter(array(from_json(..)), pred))`
    * evaluates from_json exactly once per row — higher-order-function
    * arguments are bound once, a predicate cannot be pushed below a
    * Generate, and corrupt rows yield an empty array, i.e. no output row —
    * byte-identical semantics at a third of the parse cost. */
  def parse(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(explode(filter(
        array(from_json(col(valueCol).cast("string"), Schemas.envelope)),
        e => e.isNotNull && e.getField("metric").isNotNull)).as("env"))
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
