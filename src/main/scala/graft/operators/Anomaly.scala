package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anomaly flagging over windowed-aggregate series — a graft extension on
  * the metrics side, the batch analog of the reference ecosystem's
  * threshold-alarm engine (the reference aggregator feeds exactly such an
  * alarm evaluator downstream; see /root/reference/README.md:9-14 for the
  * pipeline position). Each (group, window) value is scored against its own
  * group's distribution over the whole series; rows whose |z-score| exceeds
  * the threshold are flagged.
  *
  * Scale shape: this runs on the AGGREGATED series (one row per group ×
  * window — already orders of magnitude smaller than the raw events), so the
  * unbounded window aggregate is cheap: one exchange on the group key, then
  * two streaming passes per partition (stats, then score). Never point this
  * at raw events — aggregate first, flag second.
  */
object Anomaly {

  /** Adds `zscore` (value's deviation from the group mean in sample standard
    * deviations; 0.0 for constant or single-row groups, where the deviation
    * is undefined) and `is_anomaly` (|zscore| > threshold) to each row of a
    * grouped series. Group stats are computed over ALL of the group's rows —
    * for a "recent history" baseline, filter the series to the reference
    * period first and join the flags back. */
  def zscoreFlags(series: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    // the two output columns are API; refuse to silently clobber a caller's
    // same-named column (same rule as packSequences/shuffleOrder)
    Seq("zscore", "is_anomaly").foreach { c =>
      require(!series.columns.contains(c),
        s"zscoreFlags adds a '$c' column but the input already has one")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
    val sd = stddev_samp(col(valueCol)).over(w)
    val z = when(sd > 0, (col(valueCol) - avg(col(valueCol)).over(w)) / sd)
      .otherwise(lit(0.0))
    series.withColumn("zscore", z)
      .withColumn("is_anomaly", abs(col("zscore")) > threshold)
  }

  /** Robust (median/MAD) variant of [[zscoreFlags]] — the score is the
    * "modified z": (value − median) / (1.4826 · MAD), where MAD is the
    * median absolute deviation from the group median and 1.4826 ≈ 1/Φ⁻¹(3/4)
    * rescales MAD to estimate σ under normality. Unlike mean/stddev, a
    * single extreme outlier cannot inflate its own baseline and mask itself
    * (the classic z-score failure on spike detection); the conventional
    * flag threshold is 3.5 (Iglewicz & Hoaglin 1993). MAD = 0 (over half
    * the group at the median) scores 0.0 like the degenerate stddev case.
    *
    * Scale shape: same contract as [[zscoreFlags]] — run it on the
    * AGGREGATED series. Both medians ride one exchange on the group key
    * (two WindowExec passes, same partitioning, Catalyst reuses the
    * shuffle); exact `median` buffers each group's rows, which is bounded
    * by the series' windows-per-group, not by raw events. */
  def madFlags(series: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    Seq("mad_z", "is_anomaly", "__med", "__mad").foreach { c =>
      require(!series.columns.contains(c),
        s"madFlags adds/uses a '$c' column but the input already has one")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
    val scored = series
      .withColumn("__med", median(col(valueCol)).over(w))
      .withColumn("__mad",
        median(abs(col(valueCol) - col("__med"))).over(w))
      .withColumn("mad_z",
        when(col("__mad") > 0,
          (col(valueCol) - col("__med")) / (lit(1.4826) * col("__mad")))
          .otherwise(lit(0.0)))
    scored
      .withColumn("is_anomaly", abs(col("mad_z")) > threshold)
      .drop("__med", "__mad")
  }
}
