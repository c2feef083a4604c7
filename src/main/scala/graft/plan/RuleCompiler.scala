package graft.plan

import graft.functions.FunctionCatalog
import graft.model.AggregationSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles an [[AggregationSpec]] into a declarative DataFrame plan —
  * filter → key-extraction → window-groupBy → aggregate → envelope projection
  * (→ optional rollup re-aggregation). The same compiled stages serve batch
  * (parquet) and Structured Streaming (Kafka/MemoryStream) inputs; the
  * streaming runner inserts `withWatermark` between [[prepare]] and
  * [[aggregate]].
  *
  * This replaces the reference's per-row interpreter
  * (aggregation/aggregation_rule.go:49-139) with a Catalyst plan: predicate
  * pushdown, column pruning, partial+final hash aggregation and whole-stage
  * codegen all come for free, and the shuffle is hash-partitioned by
  * (window, tenantId, groupedDims) — the distribution the hand-rolled
  * `MetricCache` (aggregation/caching.go:17-28) could never have.
  */
object RuleCompiler {

  /** Column names used between stages. */
  private val WindowCol = "w"
  private val TenantCol = "tenant_id"
  private val ValueCol = "agg_value"
  private def dimCol(k: String) = s"dim_$k"

  /** The full F1–F4 row predicate of `MatchesMetric`
    * (aggregation/aggregation_rule.go:141-176), as one Column so Catalyst can
    * push it at/below the scan.
    */
  def matchPredicate(spec: AggregationSpec): Column = {
    val dims = col("metric.dimensions")
    // F1 — required name equality (aggregation/aggregation_rule.go:143-146)
    val f1 = col("metric.name") === lit(spec.filteredMetricName)
    // F2 — conjunctive dimension equality; absent key ⇒ no match
    // (aggregation/aggregation_rule.go:178-190)
    val f2 = spec.filteredDimensions.map { case (k, v) =>
      dims.getItem(k) === lit(v)
    }.reduceOption(_ && _).getOrElse(lit(true))
    // F3 — reject if any (k,v) matches; v == "" rejects ANY value of key k
    // (aggregation/aggregation_rule.go:192-201). An ABSENT KEY must not
    // reject (coalesce(false) around the null-propagating terms), but a rule
    // that declares rejectedDimensions drops nil-dims metrics outright
    // (aggregation/aggregation_rule.go:157-160), hence the isNotNull guard.
    val f3 =
      if (spec.rejectedDimensions.isEmpty) lit(true)
      else {
        val anyReject = spec.rejectedDimensions.map {
          case (k, "") => coalesce(map_contains_key(dims, lit(k)), lit(false))
          case (k, v)  => coalesce(dims.getItem(k) === lit(v), lit(false))
        }.reduce(_ || _)
        dims.isNotNull && !anyReject
      }
    // F4 — every grouped key must be present, else the row is filtered (NOT
    // grouped under null) (aggregation/aggregation_rule.go:166-173, 203-215)
    val f4 = spec.groupedDimensions.map { k =>
      map_contains_key(dims, lit(k))
    }.reduceOption(_ && _).getOrElse(lit(true))
    f1 && f2 && f3 && f4
  }

  /** Stage 1: filter + flatten the grouping keys out of the dimension map.
    * Spark cannot group by a MapType column, so grouped dims become top-level
    * string columns — the declarative analog of the reference's key-concat
    * (aggregation/aggregation_rule.go:58-65). Also derives `event_ts`
    * (TimestampType) from the epoch-ms double for window()/withWatermark.
    */
  def prepare(spec: AggregationSpec)(df: DataFrame): DataFrame = {
    val dims = col("metric.dimensions")
    val dimCols = spec.groupedDimensions.map(k => dims.getItem(k).as(dimCol(k)))
    df.filter(matchPredicate(spec))
      .select(Seq(
        coalesce(col("meta").getItem("tenantId"), lit("")).as(TenantCol),
        (col("metric.timestamp") / 1000).cast("timestamp").as("event_ts"),
        col("metric.timestamp").as("ts_ms"),
        col("metric.value").as("value")) ++ dimCols: _*)
  }

  /** Stage 2: epoch-aligned tumbling-window grouped aggregation
    * (aggregation/aggregation_rule.go:51-78). Spark's window() is also
    * epoch-aligned: windowIdx = floor(ts_ms / (1000·windowSize)).
    */
  def aggregate(spec: AggregationSpec, windowSizeSec: Long)(df: DataFrame): DataFrame = {
    val keys = Seq(window(col("event_ts"), s"$windowSizeSec seconds").as(WindowCol),
      col(TenantCol)) ++ spec.groupedDimensions.map(k => col(dimCol(k)))
    df.groupBy(keys: _*)
      .agg(FunctionCatalog.aggregate(spec.function, col("value"), col("ts_ms"))
        .as(ValueCol))
  }

  /** Stage 2b: optional rollup — re-aggregate the grouped results by the
    * rollup key (⊆ grouped dims) with an independent function; the rule then
    * emits ONLY the rollup rows (aggregation/aggregation_rule.go:86-134).
    * The event-time of a stage-1 row is its window start (the reference sets
    * the stage-1 envelope timestamp to window·1000·size before rollup,
    * aggregation/aggregation_rule.go:73,117), so delta/rate rollups see a
    * constant timestamp per window — deterministic here, arrival-order
    * dependent in the reference.
    */
  def rollup(spec: AggregationSpec, ruleWindowSec: Long)(df: DataFrame): DataFrame = {
    validateRollupWindow(spec, ruleWindowSec)
    val r = spec.rollup.get
    // graft extension: a rollup may re-window into COARSER tumbling windows
    // (chained time-window aggregation on the window column — native in
    // Spark 3.4+ streaming append mode); default keeps the rule's window
    val windowKey = r.windowSizeSec match {
      case Some(sec) => window(col(WindowCol), s"$sec seconds").as(WindowCol)
      case None => col(WindowCol)
    }
    val keys = Seq(windowKey, col(TenantCol)) ++
      r.groupedDimensions.map(k => col(dimCol(k)))
    val windowStartMs = col(WindowCol).getField("start").cast("double") * 1000
    df.groupBy(keys: _*)
      .agg(FunctionCatalog.aggregate(r.function, col(ValueCol), windowStartMs)
        .as(ValueCol))
  }

  /** Stage 3: envelope projection (P1–P3, aggregation/metric_holder.go:44-64):
    * output name = aggregatedMetricName; dimensions = filteredDimensions ∪
    * {k → dims[k] for k in emitted grouping}; timestamp = window START in
    * epoch ms (aggregation/aggregation_rule.go:73); meta is reconstructed as
    * {tenantId → key} (deterministic — the reference copies the first
    * contributing envelope's meta, which is nondeterministic; tenantId is the
    * only key the engine ever reads); creation_time stamped at emission
    * (server.go:228).
    */
  def project(spec: AggregationSpec)(df: DataFrame): DataFrame = {
    val emittedDims =
      spec.rollup.map(_.groupedDimensions).getOrElse(spec.groupedDimensions)
    // a key both filtered and grouped resolves to the grouped (actual) value —
    // the reference writes filtered dims first and then overwrites with the
    // grouped lookup (aggregation/metric_holder.go:49-59, Go map assignment);
    // building both into one map() would throw DUPLICATE_MAP_KEY instead
    val filteredEntries = spec.filteredDimensions.toSeq
      .filterNot { case (k, _) => emittedDims.contains(k) }.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val groupedEntries = emittedDims.flatMap(k => Seq(lit(k), col(dimCol(k))))
    val entries = filteredEntries ++ groupedEntries
    val dimsOut =
      if (entries.isEmpty) map().cast("map<string,string>")
      else map(entries: _*)
    df.select(
      struct(
        lit(spec.aggregatedMetricName).as("name"),
        dimsOut.as("dimensions"),
        (col(WindowCol).getField("start").cast("double") * 1000).as("timestamp"),
        col(ValueCol).cast("double").as("value"),
        map().cast("map<string,string>").as("value_meta")).as("metric"),
      map(lit("tenantId"), col(TenantCol)).as("meta"),
      (unix_millis(current_timestamp())).as("creation_time"))
  }

  /** A re-windowing rollup must use a window that is a (≥1×) multiple of the
    * rule's window — anything else silently mislabels aggregates (a fine
    * window is assigned to the coarse window containing its event-time, so
    * non-aligned coarse windows receive data from outside their bounds). */
  def validateRollupWindow(spec: AggregationSpec, windowSizeSec: Long): Unit =
    for (r <- spec.rollup; rw <- r.windowSizeSec)
      require(rw >= windowSizeSec && rw % windowSizeSec == 0,
        s"Rule ${spec.name}: rollup.windowSize ($rw s) must be a multiple of " +
          s"the rule window ($windowSizeSec s)")

  /** Whole rule, batch path: envelope-schema DataFrame in → emitted
    * envelope-schema DataFrame out. */
  def compile(spec: AggregationSpec, windowSizeSec: Long): DataFrame => DataFrame = { df =>
    val grouped = aggregate(spec, windowSizeSec)(prepare(spec)(df))
    val finalGrouped =
      if (spec.rollup.isDefined) rollup(spec, windowSizeSec)(grouped) else grouped
    project(spec)(finalGrouped)
  }

  /** Grouped (pre-projection) result — window struct, tenant, dim_* columns,
    * agg_value — useful for tests and SQL-oracle comparison. */
  def compileGrouped(spec: AggregationSpec, windowSizeSec: Long): DataFrame => DataFrame = { df =>
    val grouped = aggregate(spec, windowSizeSec)(prepare(spec)(df))
    if (spec.rollup.isDefined) rollup(spec, windowSizeSec)(grouped) else grouped
  }

  /** SLIDING-window variant (graft extension — the reference only tumbles):
    * each event lands in size/slide overlapping windows, epoch-aligned on
    * the slide. Spark's `window(col, size, slide)` plans this as a
    * size/slide-way Expand BELOW the partial aggregation, so the map-side
    * combine still collapses each partition to one row per (window, keys)
    * before the ONE exchange — the fan-out never reaches the shuffle on
    * grouped data. Streaming-capable unchanged (same watermark contract). */
  def compileGroupedSliding(spec: AggregationSpec, windowSizeSec: Long,
      slideSec: Long): DataFrame => DataFrame = { df =>
    aggregateSliding(spec, windowSizeSec, slideSec)(prepare(spec)(df))
  }

  /** The sliding aggregation stage alone, over an already-prepared frame —
    * the streaming path inserts its watermark between [[prepare]] and this
    * (exactly [[graft.streaming.StreamRunner.buildStreaming]]'s seam for
    * the tumbling case). */
  def aggregateSliding(spec: AggregationSpec, windowSizeSec: Long,
      slideSec: Long)(prepared: DataFrame): DataFrame = {
    require(slideSec >= 1 && windowSizeSec % slideSec == 0,
      s"window $windowSizeSec must be a multiple of slide $slideSec")
    val keys = Seq(
      window(col("event_ts"), s"$windowSizeSec seconds", s"$slideSec seconds")
        .as(WindowCol),
      col(TenantCol)) ++ spec.groupedDimensions.map(k => col(dimCol(k)))
    prepared.groupBy(keys: _*)
      .agg(FunctionCatalog.aggregate(spec.function, col("value"), col("ts_ms"))
        .as(ValueCol))
  }

  /** A WHOLE RULE CONFIG as one job: every rule's compiled plan unioned over
    * a shared source with a single `metric.name IN (...)` pre-filter — the
    * batch analog of the reference's per-message loop over every configured
    * rule (server.go:316-320), but submitted as ONE query.
    *
    * Why this beats compiling rules as separate queries at config scale:
    *  - one job, one driver round of analysis/optimization/scheduling and one
    *    output sink instead of N query submissions (the per-query fixed cost
    *    dominates small rules — see RuleFanoutBench's separate-vs-union gap);
    *  - the `isin` pre-filter is pushed into EVERY branch's scan alongside
    *    that branch's own name-equality, so the N union branches read
    *    DISJOINT name slices: with parquet row-group stats the union's total
    *    I/O approximates ONE filtered pass of the source, not N full scans;
    *  - rules' shuffles stay independent (each branch keeps its own
    *    window/tenant/dims partitioning) — no artificial barrier between
    *    rules, and a straggler rule does not gate the others' stages.
    * Catalyst plans the union in one pass; analysis is still O(total plan
    * size), so the slope that remains is ~linear in rules but with the
    * per-QUERY constant removed (measured: RuleFanoutBench, SCALE.md). */
  def compileAll(specs: Seq[(AggregationSpec, Long)]): DataFrame => DataFrame = { df =>
    require(specs.nonEmpty, "at least one rule required")
    val names = specs.map(_._1.filteredMetricName).distinct
    val pre = df.filter(col("metric.name").isin(names: _*))
    specs.map { case (s, w) => compile(s, w)(pre) }.reduce(_ unionByName _)
  }
}
