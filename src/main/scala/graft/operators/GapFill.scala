package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap filling — a graft extension on the metrics side: windowed aggregates
  * only produce rows for windows that HAD data, but dashboards, alerting
  * rules and rate computations need a dense series. Fills every missing
  * tumbling window between each group's first and last observed window with
  * either a constant (zero-fill) or the previous value (forward-fill).
  *
  * Input is the rule compiler's grouped output shape (`w` window struct,
  * grouping columns, `agg_value`).
  *
  * Scale shape: the span aggregation collapses each group to one (lo, hi)
  * row; the dense grid is exploded from a `sequence()` per group (rows ∝
  * windows-per-group, the output's own size) and joined back on
  * (group, window) — one exchange each side, partial aggregation on the
  * spans. Forward-fill adds one partitioned window (a running `last`),
  * never a global sort.
  */
object GapFill {

  /** Dense (window_start, groups, value) with missing windows = `fillValue`. */
  def zeroFill(grouped: DataFrame, windowSizeSec: Long, groupCols: Seq[String],
      fillValue: Double = 0.0): DataFrame =
    dense(grouped, windowSizeSec, groupCols)
      .withColumn("value", coalesce(col("agg_value"), lit(fillValue)))
      .drop("agg_value")

  /** Dense series with missing windows carrying the last observed value
    * (the first windows of a group are left null if they precede any data —
    * cannot happen here since the grid starts at the group's first window). */
  def forwardFill(grouped: DataFrame, windowSizeSec: Long,
      groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("window_start").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    dense(grouped, windowSizeSec, groupCols)
      .withColumn("value", last(col("agg_value"), ignoreNulls = true).over(w))
      .drop("agg_value")
  }

  /** Windows per exploded chunk: bounds the inner sequence() arrays at 32 KB
    * of longs. The coarse chunk list is still one array per group (span /
    * ChunkWindows elements), so [[MaxWindows]] caps total span. */
  private val ChunkWindows = 4096L

  /** Hard ceiling on a single group's window count (lo→hi span / window
    * size). 2³⁰ windows ≈ 34 years of 1-second windows, and keeps the coarse
    * chunk array ≤ 2³⁰/4096 = 2¹⁸ longs (2 MB). A span beyond this is a data bug (e.g.
    * epoch MILLISECONDS landing in a seconds column inflates the span
    * 1000×) — fail loudly per offending group instead of OOMing an executor
    * on a multi-GB array. */
  private val MaxWindows = 1L << 30

  /** Left-join the observed aggregates onto each group's complete window
    * grid; absent windows have null `agg_value`. The grid is generated in two
    * explode levels — coarse chunks first, then ≤ [[ChunkWindows]] windows per
    * chunk — keeping per-row memory O(span / ChunkWindows) for the chunk list
    * and O(ChunkWindows) for each grid piece, with [[MaxWindows]] bounding
    * the span itself. */
  private def dense(grouped: DataFrame, windowSizeSec: Long,
      groupCols: Seq[String]): DataFrame = {
    require(windowSizeSec >= 1, s"windowSizeSec must be >= 1, got $windowSizeSec")
    val obs = grouped.select(
      (groupCols.map(col) :+ col("w.start").cast("long").as("window_start")
        :+ col("agg_value")): _*)
    val spans = obs.groupBy(groupCols.map(col): _*)
      .agg(min(col("window_start")).as("lo"), max(col("window_start")).as("hi"))
      .withColumn("hi", when(
        (col("hi") - col("lo")) / lit(windowSizeSec) < lit(MaxWindows), col("hi"))
        .otherwise(raise_error(concat(
          lit(s"GapFill: group span exceeds $MaxWindows windows of " +
            s"$windowSizeSec s (lo="), col("lo"), lit(", hi="), col("hi"),
          lit(") — timestamp-unit data bug?"))).cast("long")))
    val chunkSpan = ChunkWindows * windowSizeSec
    val chunks = spans.select(
      (groupCols.map(col) :+ col("hi") :+
        explode(sequence(col("lo"), col("hi"), lit(chunkSpan))).as("chunk_lo")): _*)
    val grid = chunks.select(
      (groupCols.map(col) :+
        explode(sequence(col("chunk_lo"),
          least(col("chunk_lo") + lit(chunkSpan - windowSizeSec), col("hi")),
          lit(windowSizeSec))).as("window_start")): _*)
    grid.join(obs, groupCols :+ "window_start", "left")
  }

  /** Trailing event-time window aggregate — the rolling-feature primitive
    * (e.g. "7-day trailing spend per user, per day"): rows are bucketed to
    * `bucketUs`-wide tumbling buckets on `timeUsCol` (epoch micros), partial
    * sums collapse each (keys, bucket) once, and a RANGE-framed window adds
    * the last `lookbackBuckets` buckets — so the frame scans pre-aggregated
    * bucket rows, never raw events. Buckets with no observation produce no
    * row (compose with [[zeroFill]] for a dense series — same contract as
    * the grouped compiler output this module serves).
    *
    * Scale shape: two exchanges, BOTH over pre-combined bucket rows, never
    * raw events — the bucket aggregation combines map-side before its
    * (keys, bucket) exchange, and the window's (keys) exchange then moves
    * only one row per observed bucket. (A single-exchange formulation —
    * repartition(keys) before aggregating — would ship every raw event
    * through the shuffle instead; at 100 TB the two tiny exchanges win.)
    * No global sort, no self-join. Output: keys + (bucket_start, n_events,
    * trail_sum, trail_n). */
  def trailingAggregate(df: DataFrame, timeUsCol: String, valueCol: String,
      keys: Seq[String], bucketUs: Long, lookbackBuckets: Int): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    require(lookbackBuckets >= 1,
      s"lookbackBuckets must be >= 1, got $lookbackBuckets")
    import org.apache.spark.sql.expressions.Window
    val bucketed = df
      // FLOOR division, spelled out: both Spark's `div` and DuckDB's integer
      // `//` TRUNCATE toward zero (verified: DuckDB -7 // 2 = -3), which
      // would drop a pre-1970 timestamp (e.g. -1µs) into bucket 0 instead of
      // the preceding bucket. The explicit `% < 0` adjustment gives true
      // floorDiv semantics on both engines (the d7 mirror carries the same
      // adjustment); for ts >= 0 it is a no-op, so positive-epoch results
      // are unchanged. (Plain `/` on longs is double division — the same
      // trap the bench envelope generator documents — hence `div`.)
      .withColumn("bucket_start",
        expr(s"((CAST($timeUsCol AS BIGINT) div $bucketUs) + " +
          s"(CASE WHEN CAST($timeUsCol AS BIGINT) % $bucketUs < 0 " +
          s"THEN -1 ELSE 0 END)) * $bucketUs"))
      .groupBy((keys.map(col) :+ col("bucket_start")): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("double")).as("__graft_bsum"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("bucket_start").asc)
      .rangeBetween(-(lookbackBuckets.toLong - 1) * bucketUs, 0)
    bucketed
      .withColumn("trail_sum", sum(col("__graft_bsum")).over(w))
      .withColumn("trail_n", sum(col("n_events")).over(w))
      .drop("__graft_bsum")
  }

  /** Lag/rolling FEATURE EXPORT for forecasting and anomaly models: the
    * [[zeroFill]] dense grid with `lag_k` columns (one per requested lag,
    * NULL before the series has k history points — a model must SEE the
    * cold start, not train on silent zeros) and a `rollmean_n` trailing
    * mean per rolling width (ROWS frame over the DENSE grid, so n rows IS
    * n wall-clock windows — on a sparse series a row frame would span
    * arbitrary time, the classic rolling-feature leak).
    *
    * Exactness contract: with integer-valued series (counts — this
    * engine's windowed aggregates), frame sums are exact in doubles and
    * the mean is one IEEE division, so every feature is engine- and
    * partition-invariant. Scale shape: [[zeroFill]]'s grid explode + ONE
    * exchange on the group key; all lags and frames ride the same sorted
    * window pass. */
  def lagFeatures(grouped: DataFrame, windowSizeSec: Long,
      groupCols: Seq[String], lags: Seq[Int], rollWidths: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags $lags")
    require(rollWidths.forall(_ >= 1), s"bad rollWidths $rollWidths")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("window_start").asc)
    val base = zeroFill(grouped, windowSizeSec, groupCols)
    val withLags = lags.foldLeft(base) { (df, k) =>
      df.withColumn(s"lag_$k", lag(col("value"), k).over(w))
    }
    rollWidths.foldLeft(withLags) { (df, n) =>
      df.withColumn(s"rollmean_$n",
        avg(col("value")).over(w.rowsBetween(-(n.toLong - 1), 0)))
    }
  }
}
