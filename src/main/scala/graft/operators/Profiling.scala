package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution diagnostics for partition/shuffle planning. At 100 TB the
  * difference between a clean run and a dead executor is usually one hot key
  * — these operators measure the skew BEFORE the engine commits to a join or
  * aggregation strategy (broadcast vs shuffle, salting factor, shard count),
  * the same measurement-first discipline the bench harness applies to time.
  */
object Profiling {

  /** Top-`topN` hottest values of `keyCol` with their frequency share:
    * (keyCol, cnt, share, rank) ordered by (cnt desc, key asc) — rank is
    * 1-based and deterministic under the tie-break. `share` is the key's
    * fraction of ALL rows (not of the top-N), so a planner can read
    * "rank 1 holds 38% of the table" directly: share · rows per partition
    * is the skew factor a hash shuffle on this key would suffer, and
    * anything above ~1/parallelism argues for salting or AQE skew handling.
    *
    * Scale shape: one map-side-combined groupBy on the key (the only
    * exchange over data), then a TakeOrdered top-N — never a global sort.
    * The total is a 1-row aggregate broadcast to the N survivors, and the
    * rank window runs on the already-limited N rows (bounded, single task
    * by construction — N is config-sized). */
  /** k-ANONYMITY RELEASE GATE (Sweeney 2002, "k-anonymity: a model for
    * protecting privacy") — the re-identification screen a dataset
    * release runs over its quasi-identifier columns: a row whose
    * quasi-identifier combination is shared by fewer than k rows is
    * linkable. One summary row:
    *
    *   - `n_rows` / `n_groups`     totals over the quasi-identifier cells
    *   - `k_anonymity`             the dataset's ACTUAL k (min cell size —
    *     the release satisfies k-anonymity for any k ≤ this)
    *   - `n_risky_groups` / `n_risky_rows`  cells (and their row mass)
    *     below the requested `k`
    *   - `risky_row_share`         the fraction of rows needing
    *     suppression or coarser generalization before release
    *
    * All counts exact longs; the one division is a single IEEE op.
    *
    * Scale shape: ONE map-side-combined exchange on the quasi-identifier
    * key (cells are generalization-bounded, far fewer than rows), then a
    * single-row rollup. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols: _*).agg(count(lit(1)).as("__n"))
      .agg(sum("__n").as("n_rows"),
        count(lit(1)).as("n_groups"),
        min("__n").as("k_anonymity"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_risky_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("n_risky_rows"))
      .withColumn("risky_row_share",
        col("n_risky_rows").cast("double") / col("n_rows").cast("double"))
  }

  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    // unconditional: a key column NAMED 'cnt'/'share'/'rank' would be
    // silently overwritten (or yield an ambiguous-reference error) — there
    // is no valid case where the input may carry these names
    Seq("cnt", "share", "rank").foreach { c =>
      require(!df.columns.contains(c),
        s"keySkew adds a '$c' column but the input already has one")
    }
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__graft_total"))
    // asc_nulls_last: Spark's bare .asc is NULLS FIRST while the DuckDB
    // oracle's ASC defaults to NULLS LAST — pin one order on both tie-break
    // sites or a NULL key tying at the top-N boundary diverges
    val top = counts.orderBy(col("cnt").desc, col(keyCol).asc_nulls_last)
      .limit(topN)
    top.join(broadcast(total))
      .withColumn("share",
        col("cnt").cast("double") / col("__graft_total").cast("double"))
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("cnt").desc, col(keyCol).asc_nulls_last))
          .cast("long"))
      .drop("__graft_total")
  }

  /** Salted two-stage count per key — the mitigation [[keySkew]] measures
    * for: rows are spread over `saltFactor` sub-groups of (key, salt), each
    * counted independently (first exchange keys on BOTH columns, so a hot
    * key's rows land on `saltFactor` reducers instead of one), then the
    * sub-counts collapse in a second, tiny aggregation keyed on the key
    * alone. Result is EXACTLY `groupBy(key).count()` for any salt assignment
    * (PropertySpec pins it against the unsalted plan).
    *
    * When to reach for it: Spark's partial (map-side) aggregation already
    * caps a hot COUNT key at one row per upstream partition, so plain
    * count/sum rarely needs this — the two-stage shape is the recipe for
    * the aggregations partial-agg can NOT shrink: per-key state that grows
    * with group size (collect_list/collect_set, exact percentiles) and
    * pre-shuffled inputs whose combine already happened. `saltedCount` is
    * the reference implementation of the shape with a hard equality oracle;
    * choose `saltFactor` from [[keySkew]]: a key holding share `s` of the
    * table needs saltFactor ≳ s · numPartitions to even out (SCALE.md
    * "Skew mitigation" recipe).
    *
    * The salt is `monotonically_increasing_id() % saltFactor` — uniform
    * round-robin WITHIN every upstream partition (so even a single-key
    * partition spreads), no dependence on any data column. */
  def saltedCount(df: DataFrame, keyCol: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(!df.columns.contains("cnt"),
      s"saltedCount adds a 'cnt' column but the input already has one")
    val salt = Iterator.from(0).map(i => s"__graft_salt$i")
      .find(c => !df.columns.contains(c)).get
    df.select(col(keyCol),
        pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).as(salt))
      .groupBy(col(keyCol), col(salt))
      .agg(count(lit(1)).as("__graft_subcount"))
      .groupBy(col(keyCol))
      .agg(sum(col("__graft_subcount")).as("cnt"))
  }

  /** Population-stability-index drift report between two snapshots of the
    * same population — the standard "did the distribution move" monitor a
    * refresh pipeline runs on its quality/length/score features before
    * accepting a new crawl. Rows of both inputs are bucketed by the caller-
    * supplied `bucket` expression; output is one row per observed bucket:
    * (bucket, n_old, n_new, psi_contrib) with
    * contrib = (q − p) · ln(q / p) over LAPLACE-SMOOTHED shares
    * p = (n_old+1)/(tot_old+k), q = (n_new+1)/(tot_new+k) — smoothing
    * makes empty buckets well-defined deterministically (no epsilon
    * config). Σ contrib is the PSI; the usual alarm bars are 0.1 (drift)
    * and 0.25 (major drift). Consumers should round contrib (libm ln).
    *
    * Scale shape: each snapshot collapses to bucket counts under ONE
    * map-side-combined exchange; everything after (full-outer bucket join,
    * whole-relation window totals) runs on the bucket relation — tens of
    * rows. The single-partition window is safe by construction (bucket
    * cardinality is config-scale); totals are exact long sums. */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, bucket: Column): DataFrame =
    psiDriftFromCounts(
      oldDf.select(bucket.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_old")),
      newDf.select(bucket.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_new")))

  /** [[psiDrift]] over PRE-COMPACTED bucket counts `old(bucket, n_old)` /
    * `new(bucket, n_new)` — the report is a pure function of the two count
    * tables, which is what makes the monitor streamable:
    * `StreamingDrift.psiSink` folds micro-batch bucket deltas into an
    * accumulated count store and recomputes from it, landing on the
    * bit-identical report a one-shot [[psiDrift]] over all rows produces. */
  def psiDriftFromCounts(oldCounts: DataFrame, newCounts: DataFrame): DataFrame = {
    val j = oldCounts.join(newCounts, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // non-foldable constant partition key (the topNgrams rule): the window
    // spans the whole bucket relation, which is bounded by construction
    val w = Window.partitionBy(pmod(col("n_old"), lit(1)))
    val withTot = j
      .withColumn("__tot_old", sum(col("n_old")).over(w))
      .withColumn("__tot_new", sum(col("n_new")).over(w))
      .withColumn("__k", count(lit(1)).over(w))
    val p = (col("n_old") + 1).cast("double") /
      (col("__tot_old") + col("__k")).cast("double")
    val q = (col("n_new") + 1).cast("double") /
      (col("__tot_new") + col("__k")).cast("double")
    withTot
      .withColumn("psi_contrib", (q - p) * log(q / p))
      .select("bucket", "n_old", "n_new", "psi_contrib")
  }

  /** Exponentially-decayed count per group — the recency-weighted
    * frequency a sampler or mixture planner wants ("how active is this
    * source NOW"): each row weighs 2^-b where b = full half-lives between
    * the row and `refUs`. EXACT by construction: the weight is quantized
    * to whole half-lives, so each row contributes the integer
    * 2^(shift − b) (0 beyond `shift` half-lives — a < 2⁻³⁰ tail truncated
    * identically on every engine) and the per-group sum is pure long
    * arithmetic — no float-summation order anywhere. `decayed` =
    * sum / 2^shift is then an exactly-representable double (sum < 2⁵³ for
    * corpora under ~8 × 10⁶ rows per group at shift 30 — raise the clamp
    * awareness, not the shift, beyond that).
    *
    * Scale shape: ONE map-side-combined groupBy on the group key; the
    * shuffle moves one partial long per (group, partition). `refUs` must
    * be a fixed instant (pass max-event-time from a 1-row aggregate or a
    * pipeline-run timestamp) so reruns reproduce bit-for-bit. */
  def decayedCount(df: DataFrame, groupCols: Seq[String], tsUsCol: String,
      refUs: Long, halfLifeUs: Long, shift: Int = 30): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(halfLifeUs >= 1, s"halfLifeUs must be >= 1, got $halfLifeUs")
    require(shift >= 1 && shift <= 40, s"shift must be in [1,40], got $shift")
    // integer div (not double `/` + floor): exact at half-life boundaries,
    // mirrored by DuckDB's `//` — the d7_trailing bucketing rule. The
    // explicit ts <= ref guard is LOAD-BEARING: for a FUTURE row the age is
    // negative, where Spark's `div` truncates toward zero (-50 div 100 = 0
    // → would contribute a full weight) while DuckDB's `//` floors (→ -1,
    // excluded) — the guard makes both engines drop future rows, and on
    // the non-negative remainder div == floor so the engines agree
    val bExpr = s"((${refUs}L - $tsUsCol) div ${halfLifeUs}L)"
    val contrib = expr(s"CASE WHEN $tsUsCol <= ${refUs}L " +
      s"AND $bExpr BETWEEN 0 AND $shift " +
      s"THEN shiftleft(1L, CAST($shift - $bExpr AS INT)) ELSE 0L END")
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(contrib).as("decayed_fp"))
      .withColumn("decayed",
        col("decayed_fp").cast("double") / lit(math.pow(2.0, shift)))
  }

  /** Exact WEIGHTED quantile per group: the smallest value whose cumulative
    * weight reaches q = `qNum/qDen` of the group's total weight —
    * `(group…, wq)`. The threshold compare is the integer cross-product
    * `cumw·qDen ≥ W·qNum` (weights must be integral; pre-scale fixed-point
    * for fractional weights), so the picked ROW — and therefore the value —
    * is identical on every engine and partitioning; ties in the value
    * order break on the value itself (cumulative weight is then order-
    * independent). q = 1/2 is the weighted median — the right center for
    * anything where rows carry unequal mass (bytes per file, tokens per
    * doc, spend per order).
    *
    * Scale shape: one exchange on the group, a per-group sort feeding two
    * running-frame windows (no full-partition buffering), then the min
    * aggregate — the same discipline as the fixed-bin quantile sketch, but
    * exact, for groups whose rows fit a sort spill. */
  def weightedQuantile(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      weightCol: Column, qNum: Int, qDen: Int): DataFrame = {
    require(qNum > 0 && qNum <= qDen, s"need 0 < qNum <= qDen, got $qNum/$qDen")
    val g = groupCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(g: _*).orderBy(col("__v").asc)
    df.select(g :+ valueCol.as("__v") :+ weightCol.cast("long").as("__w"): _*)
      .withColumn("__cum", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(
        Window.partitionBy(g: _*)))
      .groupBy(g: _*)
      .agg(min(when(col("__cum") * qDen >= col("__tot") * qNum, col("__v")))
        .as("wq"))
  }

  /** Per-group ordinary-least-squares trend: fit y = slope·x + intercept
    * over each group's (x, y) points — `(group…, n_points, slope,
    * intercept)` — the "is this tenant's volume growing?" / "is this
    * source's quality drifting?" primitive that turns any per-bucket
    * aggregate into a direction and a rate.
    *
    * Numerically it is the closed form over five EXACT integer sums
    * (n, Σx, Σy, Σxy, Σx²) — associative longs, so any partitioning and
    * any engine reach identical sums — followed by one fixed IEEE
    * sequence: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept =
    * (Σy − slope·Σx) / n. Inputs must be integral (cast upstream — for
    * fractional y, pre-scale to fixed point); a group with a single point
    * or zero x-variance yields NULL slope/intercept rather than ±Inf.
    * Overflow budget: n·Σxy must stay under 2⁶³ — with day-index x and
    * count y this holds to ~10¹² rows per group. One map-side-combined
    * exchange; output is group-sized. */
  def trend(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ xCol.cast("long").as("__x") :+ yCol.cast("long").as("__y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_points"), sum("__x").as("__sx"),
        sum("__y").as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("__den",
        col("n_points") * col("__sxx") - col("__sx") * col("__sx"))
      .select(g :+ col("n_points") :+
        when(col("__den") =!= 0,
          (col("n_points") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") / col("__den").cast("double")).as("slope") :+
        when(col("__den") =!= 0,
          (col("__sy").cast("double") -
            ((col("n_points") * col("__sxy") - col("__sx") * col("__sy"))
              .cast("double") / col("__den").cast("double")) *
              col("__sx").cast("double")) / col("n_points").cast("double"))
          .as("intercept"): _*)
  }

  /** Per-column profile of NUMERIC columns in ONE pass over `df` — a row
    * per column: `(column, n_rows, n_nulls, n_distinct, vmin, vmax)` with
    * min/max cast to double (exact for longs < 2⁵³ and doubles; the
    * uniform type is what lets all columns share one output schema).
    *
    * Scale note: all metrics ride a single aggregate over one scan; the
    * exact multi-column `count(DISTINCT …)` plans as an Expand (one
    * duplicated shuffle lane per column), which is the right cost for the
    * ≤ tens of columns a table profile covers — for very wide tables swap
    * the distinct lanes for [[Sketches.hllDistinct]] registers per column
    * (approximate, one lane total). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("vmin"), col(s"__mx_$c").as("vmax"))
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Column-profile DIFF between two snapshot generations — the schema-
    * level companion of [[psiDrift]] (PSI sees distribution shift inside a
    * feature; this sees the blunt breaks that precede it: a column going
    * nullable, cardinality collapsing, a range exploding). One profile
    * pass per side, then a full-outer join on the column name — the
    * comparison relation is columns-sized, never data-sized. */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, pfx: String): DataFrame =
      columnProfile(df, cols).select(col("column"),
        col("n_rows").as(s"${pfx}_n_rows"), col("n_nulls").as(s"${pfx}_n_nulls"),
        col("n_distinct").as(s"${pfx}_n_distinct"),
        col("vmin").as(s"${pfx}_min"), col("vmax").as(s"${pfx}_max"))
    side(oldDf, "old").join(side(newDf, "new"), Seq("column"), "full_outer")
  }

  /** Exact two-sample Kolmogorov–Smirnov drift statistic — the
    * nonparametric sibling of [[psiDrift]]: D = max over values of
    * |CDF_old − CDF_new|, computed ENTIRELY in integers (cumulative counts
    * cross-multiplied: |ca·m − cb·n|, one IEEE division at the end), so the
    * statistic is bit-identical on every engine and partitioning. Unlike
    * PSI it needs no binning choice and no smoothing — but it compares the
    * DISTINCT-VALUE relation, so pre-bucket continuous features (the
    * psiDrift bucketing) to keep that relation modest: the cumulative
    * window here is a global sort over distinct values (fine for the
    * feature domains drift is measured on; NOT for raw 64-bit values).
    * Integer contract: n·m must fit a long (n, m ≤ ~3·10⁹ paired) — lift
    * the cross-products to DECIMAL beyond that.
    *
    * Returns ONE row: (n, m, ks_num, ks) with ks = ks_num/(n·m). */
  def ksDrift(oldDf: DataFrame, newDf: DataFrame, value: Column): DataFrame = {
    val u = oldDf.select(value.cast("long").as("v"),
        lit(1L).as("a"), lit(0L).as("b"))
      .unionAll(newDf.select(value.cast("long").as("v"),
        lit(0L).as("a"), lit(1L).as("b")))
      .groupBy("v").agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // totals ride the SAME sorted pass as the cumulative counts (n = the
    // final cumulative value) — computing them from `u` separately would
    // re-execute the corpus union scan
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = u.select(sum(col("na")).over(w).as("ca"),
        sum(col("nb")).over(w).as("cb"))
      .select(col("ca"), col("cb"),
        max(col("ca")).over(all).as("n"), max(col("cb")).over(all).as("m"))
    cum
      .agg(max(col("n")).as("n"), max(col("m")).as("m"),
        max(abs(col("ca") * col("m") - col("cb") * col("n"))).as("ks_num"))
      .select(col("n"), col("m"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n") * col("m")).cast("double")).as("ks"))
  }

  /** DATA CARD of a text corpus — the (metric, value) summary relation a
    * dataset release ships (Gebru et al. 2021 "Datasheets for Datasets"):
    * document/empty/null counts, token and character totals, exact-dup
    * count, mean and exact-median document length. One aggregation pass
    * over the corpus (the median is the only sort-based member; everything
    * else combines map-side), one row per metric — values as DOUBLE
    * (counts are exact well past 2⁵³ corpus rows' worth of tokens… at
    * which point the card is the least of your problems; the ratios are
    * single IEEE divisions).
    *
    * Deliberately COMPOSES with the rest of the engine rather than
    * duplicating it: language mix, quality quantiles, dup-cluster depth,
    * PSI vs a prior release each have their own dedicated operator — the
    * card is the header, not the whole datasheet. */
  def dataCard(docs: DataFrame, textCol: String = "text"): DataFrame =
    dataCardBy(docs, Seq.empty, textCol)

  /** [[dataCard]] per group (source, language, snapshot — whatever the
    * release slices by): same one-pass stats keyed by `groupCols`, the
    * per-source table a mixing decision actually reads. Exact-dup counts
    * are WITHIN-group by construction (a cross-source duplicate shows in
    * the whole-corpus card, not here — run both). */
  def dataCardBy(docs: DataFrame, groupCols: Seq[String],
      textCol: String = "text"): DataFrame = {
    val tc = coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L))
    val base = docs.select((groupCols.map(col) ++ Seq(tc.as("tc"),
      coalesce(length(col(textCol)), lit(0)).cast("long").as("len"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"),
      col(textCol).isNull.as("tnull"))): _*)
    val aggs = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      sum(when(col("tnull"), 1L).otherwise(0L)).cast("double").as("n_null_docs"),
      sum(when(col("tc") === 0L, 1L).otherwise(0L)).cast("double").as("n_empty_docs"),
      sum(col("tc")).cast("double").as("n_tokens"),
      sum(col("len")).cast("double").as("n_chars"),
      (count(col("fp")) - countDistinct(col("fp"))).cast("double")
        .as("n_exact_dup_docs"),
      percentile(col("tc"), lit(0.5)).as("p50_doc_tokens"))
    val agged =
      (if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
       else base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*))
        .withColumn("mean_doc_tokens", col("n_tokens") / col("n_docs"))
    val stacked = expr(
      "stack(8, " +
        "'n_docs', n_docs, 'n_null_docs', n_null_docs, " +
        "'n_empty_docs', n_empty_docs, 'n_tokens', n_tokens, " +
        "'n_chars', n_chars, 'n_exact_dup_docs', n_exact_dup_docs, " +
        "'mean_doc_tokens', mean_doc_tokens, 'p50_doc_tokens', p50_doc_tokens" +
        ") AS (metric, value)")
    agged.select((groupCols.map(col) :+ stacked): _*)
  }
}
