package graft.model

import org.apache.spark.sql.types._

/** Data model of the engine — the wire record consumed/produced over Kafka and
  * the YAML rule DSL that declares aggregations.
  *
  * Reference semantics (monasca/monasca-aggregator):
  *  - Metric: models/metric.go:17-23 — `timestamp` is event time in epoch
  *    MILLISECONDS as a double; `dimensions` is an arbitrary string tag map.
  *  - MetricEnvelope: models/metric_envelope.go:17-21 — `meta["tenantId"]` is an
  *    implicit grouping key (aggregation/aggregation_rule.go:58).
  *  - AggregationSpecification: models/aggregation_specification.go:17-31.
  */
case class Metric(
    name: String,
    dimensions: Map[String, String],
    timestamp: Double, // event time, epoch milliseconds
    value: Double,
    value_meta: Map[String, String])

case class MetricEnvelope(
    metric: Metric,
    meta: Map[String, String],
    creation_time: Long)

/** Optional second-stage re-aggregation of a rule's grouped results.
  * Reference: models/aggregation_specification.go:28-31. `windowSizeSec` is a
  * graft extension the reference lacks: when set (and larger than the rule's
  * window), the rollup also re-windows into coarser tumbling windows — e.g.
  * per-host 10 s avgs rolled up to per-service 1 min sums. */
case class RollupSpec(
    function: String,
    groupedDimensions: Seq[String],
    windowSizeSec: Option[Long] = None)

/** One aggregation rule. Reference: models/aggregation_specification.go:17-31,
  * field semantics in docs/aggregations.md. */
case class AggregationSpec(
    name: String,
    function: String,
    filteredMetricName: String,
    filteredDimensions: Map[String, String] = Map.empty,
    rejectedDimensions: Map[String, String] = Map.empty,
    groupedDimensions: Seq[String] = Seq.empty,
    aggregatedMetricName: String,
    rollup: Option[RollupSpec] = None)

object Schemas {
  /** StructType mirror of the MetricEnvelope JSON wire shape, used by
    * from_json on the Kafka value bytes. Field names match the JSON keys
    * (Go json tags, models/metric.go:17-23). */
  val metric: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("dimensions", MapType(StringType, StringType)),
    StructField("timestamp", DoubleType), // epoch ms
    StructField("value", DoubleType),
    StructField("value_meta", MapType(StringType, StringType))))

  val envelope: StructType = StructType(Seq(
    StructField("metric", metric),
    StructField("meta", MapType(StringType, StringType)),
    StructField("creation_time", LongType)))
}
