package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed heavy hitters — a graft extension on the metrics side: the top-k
  * values of a dimension by event count per (tumbling window, tenant). The
  * monitoring question "which hosts/users/endpoints dominated this hour?"
  * that the reference's fixed groupBy rules cannot express.
  *
  * Scale shape: count aggregation is partial+final (one exchange on
  * (window, tenant, value)); the per-(window, tenant) rank is a partitioned
  * window, and Spark's WindowGroupLimit pushes a partial top-k below its
  * exchange, so only ~k rows per partition per group ever move.
  */
object HeavyHitters {

  /** Top-k `dimKey` values by row count per (window, tenant) over
    * MetricEnvelope rows. Deterministic tie-break: count desc, value asc. */
  def byWindow(envs: DataFrame, windowSizeSec: Long, dimKey: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = envs.select(
        col("meta").getItem("tenantId").as("tenant_id"),
        col("metric.dimensions").getItem(dimKey).as("value"),
        (col("metric.timestamp") / 1000).cast("timestamp").as("event_ts"))
      .filter(col("value").isNotNull)
      .groupBy(window(col("event_ts"), s"$windowSizeSec seconds").as("w"),
        col("tenant_id"), col("value"))
      .agg(count(lit(1)).as("n"))
    val rankW = Window.partitionBy(col("w"), col("tenant_id"))
      .orderBy(col("n").desc, col("value").asc)
    counts.withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("w.start").cast("long").as("window_start"),
        col("tenant_id"), col("value"), col("n"), col("rank"))
  }
}
