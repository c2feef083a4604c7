package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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
    val counts = prepared(envs, dimKey)
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

  /** Exact distinct dimension-value count per (window, tenant) — "how many
    * active users this hour". Spark plans the distinct aggregate as two
    * partial hash aggregations (dedup on (window, tenant, value), then
    * count), both map-side combined — the exchange carries distinct triples,
    * not events. For stream-cardinality scale use [[approxDistinctByWindow]]:
    * HyperLogLog++ state is O(1) per group instead of O(distinct values). */
  def distinctByWindow(envs: DataFrame, windowSizeSec: Long, dimKey: String): DataFrame =
    prepared(envs, dimKey)
      .groupBy(window(col("event_ts"), s"$windowSizeSec seconds").as("w"), col("tenant_id"))
      .agg(count_distinct(col("value")).as("n_distinct"))
      .select(col("w.start").cast("long").as("window_start"),
        col("tenant_id"), col("n_distinct"))

  /** HyperLogLog++ variant (relative error `rsd`, default 5%): constant-size
    * sketch per (window, tenant) regardless of cardinality — the 100 TB scale
    * path; the exact variant is the correctness baseline. */
  def approxDistinctByWindow(envs: DataFrame, windowSizeSec: Long, dimKey: String,
      rsd: Double = 0.05): DataFrame =
    prepared(envs, dimKey)
      .groupBy(window(col("event_ts"), s"$windowSizeSec seconds").as("w"), col("tenant_id"))
      .agg(approx_count_distinct(col("value"), rsd).as("n_distinct"))
      .select(col("w.start").cast("long").as("window_start"),
        col("tenant_id"), col("n_distinct"))

  /** STREAMING windowed cardinality: the HLL sketch merges incrementally in
    * append mode (one sketch per open (window, tenant) in the state store,
    * emitted when the watermark closes the window). Exact `count_distinct`
    * is NOT streamable — Spark rejects distinct aggregates in streaming —
    * which is precisely why the sketch variant exists. */
  def approxDistinctByWindowStreaming(envs: DataFrame, windowSizeSec: Long,
      dimKey: String, lagSec: Long, rsd: Double = 0.05): DataFrame =
    prepared(envs, dimKey)
      .withWatermark("event_ts", s"$lagSec seconds")
      .groupBy(window(col("event_ts"), s"$windowSizeSec seconds").as("w"), col("tenant_id"))
      .agg(approx_count_distinct(col("value"), rsd).as("n_distinct"))
      .select(col("w.start").cast("long").as("window_start"),
        col("tenant_id"), col("n_distinct"))

  private def prepared(envs: DataFrame, dimKey: String): DataFrame =
    envs.select(
        col("meta").getItem("tenantId").as("tenant_id"),
        col("metric.dimensions").getItem(dimKey).as("value"),
        (col("metric.timestamp") / 1000).cast("timestamp").as("event_ts"))
      .filter(col("value").isNotNull)

  /** One emitted heavy-hitter row (same shape as [[byWindow]]'s output). */
  case class HeavyHitter(window_start: Long, tenant_id: String, value: String,
      n: Long, rank: Long)

  /** Packed count-map state: parallel (values, counts) arrays. The state
    * store round-trips the state through Spark's object encoder once per
    * touched group per batch (decode on `getOption`, encode on `update`);
    * at maxTracked=4096 the array encoding measures 0.56 ms/round-trip vs
    * 3.28 ms for `Map[String, Long]` — 5.8× (graft.StateEncodingBench), which
    * at thousands of open (window, tenant) groups is seconds per micro-batch.
    * Entry order is arbitrary: the fold rebuilds a hash map and emission
    * sorts explicitly.
    *
    * Upgrade note: this replaced a `Map[String, Long]` state schema. A
    * streaming checkpoint written by the map-state version fails Spark's
    * state-schema compatibility check on restart — restarting an existing
    * query across this change requires a fresh checkpoint location. */
  case class PackedCounts(values: Array[String], counts: Array[Long])

  /** STREAMING top-k per (window, tenant) via `flatMapGroupsWithState` —
    * custom bounded state where Spark's built-in streaming ops can't express
    * the semantics: a rank needs the window CLOSED, so counts accumulate in
    * state and the top-k is emitted exactly once, when the event-time timeout
    * fires (watermark past the window end).
    *
    * State per (window, tenant) is a count map capped at `maxTracked`
    * entries using the space-saving rule (Metwally et al. 2005: a new value
    * past the cap replaces the current minimum and inherits its count + 1).
    * Top-k is EXACT while a group's distinct-value cardinality stays ≤
    * maxTracked, and a bounded-error approximation beyond — state is
    * O(maxTracked) per open window REGARDLESS of stream cardinality, which
    * is what makes this runnable forever at 100 TB/day (pick maxTracked a
    * small multiple of k; the error bound is total_count/maxTracked). The
    * per-batch fold is worst-case O(rows · log maxTracked): eviction uses a
    * count-indexed bucket map built lazily on the first overflow, not a
    * per-row map scan. Late rows are dropped by the watermark before
    * reaching the state function. State is stored as [[PackedCounts]]
    * parallel arrays — 5.8× cheaper to encode per batch than a
    * `Map[String, Long]` (measured; see PackedCounts). */
  def byWindowStreaming(envs: DataFrame, windowSizeSec: Long, dimKey: String,
      k: Int, lagSec: Long, maxTracked: Int = 4096): Dataset[HeavyHitter] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxTracked >= k, s"maxTracked=$maxTracked must be >= k=$k")
    val spark = envs.sparkSession
    import spark.implicits._
    val input = prepared(envs, dimKey)
      .withWatermark("event_ts", s"$lagSec seconds")
      .withColumn("window_start",
        (floor(col("event_ts").cast("double") / windowSizeSec) * windowSizeSec)
          .cast("long"))
      // event_ts rides along: the watermarked attribute must be present in
      // flatMapGroupsWithState's input for event-time timeouts to resolve
      .select("window_start", "tenant_id", "value", "event_ts")
      .as[(Long, String, String, java.sql.Timestamp)]
    input.groupByKey { case (w, t, _, _) => (w, t) }
      .flatMapGroupsWithState[PackedCounts, HeavyHitter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((w, t), rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            val top = s.values.zip(s.counts).toSeq
              .sortBy { case (v, n) => (-n, v) }.take(k)
            state.remove()
            top.zipWithIndex.iterator.map { case ((v, n), i) =>
              HeavyHitter(w, t, v, n, i + 1L)
            }
          } else {
            import scala.collection.mutable
            val counts = mutable.HashMap.empty[String, Long]
            state.getOption.foreach { s =>
              var i = 0
              while (i < s.values.length) { counts.update(s.values(i), s.counts(i)); i += 1 }
            }
            // count → values index for eviction: built LAZILY on the first
            // overflow (a batch that never overflows pays nothing beyond the
            // state copy) and kept in sync afterwards, so every operation is
            // worst-case O(log maxTracked) — no per-row min scan (naive minBy
            // is O(maxTracked) per overflow row) and no rebuild degeneracy
            // when a unique minimum takes consecutive hits
            var buckets: mutable.TreeMap[Long, mutable.TreeSet[String]] = null
            def bInsert(v: String, n: Long): Unit = if (buckets != null)
              buckets.getOrElseUpdate(n, mutable.TreeSet.empty) += v
            def bRemove(v: String, n: Long): Unit = if (buckets != null)
              buckets.get(n).foreach { s => s -= v; if (s.isEmpty) buckets -= n }
            rows.foreach { case (_, _, v, _) =>
              counts.get(v) match {
                case Some(n) =>
                  counts(v) = n + 1
                  bRemove(v, n); bInsert(v, n + 1)
                case None if counts.size < maxTracked =>
                  counts(v) = 1L
                  bInsert(v, 1L)
                case None => // space-saving: evict a minimum, inherit count+1
                  if (buckets == null) {
                    buckets = mutable.TreeMap.empty
                    counts.foreach { case (cv, cn) => bInsert(cv, cn) }
                  }
                  val (mn, minSet) = buckets.head
                  val mv = minSet.head // deterministic: smallest value
                  counts -= mv
                  bRemove(mv, mn)
                  counts(v) = mn + 1
                  bInsert(v, mn + 1)
              }
            }
            val vals = new Array[String](counts.size)
            val ns = new Array[Long](counts.size)
            var i = 0
            counts.foreach { case (v, n) => vals(i) = v; ns(i) = n; i += 1 }
            state.update(PackedCounts(vals, ns))
            // fire when the watermark passes the window end; the max() guard
            // keeps the timestamp legal if this window was already near-late
            state.setTimeoutTimestamp(math.max((w + windowSizeSec) * 1000,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
