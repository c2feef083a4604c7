package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pairwise-preference analytics — the data plane of RLHF / reward-model
  * pipelines, where the raw asset is "annotator preferred response A over
  * response B" rows and the product is a per-item strength scale.
  *
  * First resident: the Bradley–Terry model fit with Hunter's MM algorithm
  * (Hunter 2004, "MM algorithms for generalized Bradley–Terry models") in
  * FIXED-POINT INTEGER arithmetic, the same bit-reproducibility discipline
  * as [[Graph.pageRank]]: long sums are exact and associative where double
  * sums are not, every division is a floor division of non-negative longs,
  * so any partitioning, any cluster size, any engine produces the identical
  * strengths and the DuckDB oracle can replay every round exactly.
  */
object Preference {

  /** Bradley–Terry strengths over `comparisons(winner, loser)` — one row
    * per pairwise judgment. Returns `(item, strength_fp, wins)` after
    * exactly `iters` MM rounds, strength in units of `1/scale`, normalized
    * each round so strengths sum to ≈ N·scale (mean 1.0).
    *
    * MM update (Hunter 2004, eq. 2), fixed-point form with S² = scale²:
    *   d(i)  = Σ_j  (m(i,j)·S²) div max(p(i) + p(j), 1)
    *   p'(i) = (W(i)·S²) div d(i), then normalized by
    *   p''(i) = (p'(i)·scale·N) div Σ p'
    * where m(i,j) = comparisons between i and j and W(i) = i's wins.
    *
    * Regularization: the plain MLE diverges when an item never wins (p→0)
    * or the comparison graph is disconnected. Every OBSERVED pair gets one
    * virtual win each way (m += 2, W(i) += 1 per distinct opponent) — the
    * standard add-half-style prior, applied only to pairs that actually
    * met so the comparison graph's structure is preserved (never an
    * items² blow-up).
    *
    * Overflow budget: m(i,j)·S² and W(i)·S² must stay below 2⁶³ — at the
    * default 2²⁰ scale that is ~2²³ comparisons per pair/item; shrink
    * `scale` for denser preference sets (precision degrades gracefully).
    *
    * Scale shape: comparisons — the only corpus-sized relation — collapse
    * ONCE into the pair-meeting relation `m` (map-side-combined count,
    * repartitioned by item and persisted); each MM round shuffles only the
    * item-sized strength relation into that join and the item-sized
    * denominator aggregate out. The normalizer is a 1-row broadcast, never
    * a driver collect; strengths are eagerly materialized per round via
    * [[Lineage.materialize]] (O(1) lineage; a configured checkpoint dir
    * makes each generation a reliable, executor-loss-surviving
    * checkpoint). The one driver-side scalar is N, a single count. */
  def bradleyTerry(comparisons: DataFrame, iters: Int,
      scale: Long = 1L << 20): DataFrame =
    bradleyTerryWeighted(
      comparisons.groupBy("winner", "loser").agg(count(lit(1)).as("n")),
      iters, scale)

  /** [[bradleyTerry]] over PRE-COMPACTED judgments `(winner, loser, n)` —
    * one row per ordered pair with its comparison count. The fit is a pure
    * function of these counts, which is what makes the model streamable:
    * `StreamingPreference.bradleyTerrySink` folds micro-batch deltas into
    * an accumulated pair-count table and refits from it, landing on the
    * bit-identical strengths a one-shot fit over all judgments produces
    * (same fixed-point arithmetic, same inputs — nothing order-dependent
    * survives the compaction). */
  def bradleyTerryWeighted(pairCounts: DataFrame, iters: Int,
      scale: Long = 1L << 20): DataFrame =
    bradleyTerryWeightedLocal(pairCounts, iters, scale)

  /** DRIVER-LOCAL MM rounds over the DISTRIBUTED pair-count compaction —
    * the default fit path, row-identical to
    * [[bradleyTerryWeightedDistributed]] (spec-pinned; same fixed-point
    * longs, same truncating divisions, positive throughout so `div` and
    * Scala `/` agree). The corpus-sized work is the ONE map-side-combined
    * compaction of the judgment log to (winner, loser, n); the pair-count
    * relation is count-table-scale by the same contract the streaming
    * sink's GenStore already imposes, so the 8–64 MM rounds are pure
    * driver arithmetic instead of 3 Spark jobs each (measured ~6 s → <1 s
    * on the bench fixture). Item ids keep their ORIGINAL type (the loop
    * keys a hash map; the output schema copies the winner column's type).
    * For item sets beyond driver memory use the distributed sibling:
    * identical strengths. */
  def bradleyTerryWeightedLocal(pairCounts: DataFrame, iters: Int,
      scale: Long = 1L << 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val spark = pairCounts.sparkSession
    val s2 = scale * scale
    val cnt: Array[(Any, Any, Long)] = pairCounts
      .select(col("winner"), col("loser"), col("n").cast("long"))
      .collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
    // meet: symmetric pair totals + 2 (the virtual win/loss prior)
    val meet = new java.util.HashMap[(Any, Any), Long]()
    cnt.foreach { case (w, l, n) =>
      meet.merge((w, l), n, (a, b) => a + b)
      meet.merge((l, w), n, (a, b) => a + b)
    }
    meet.replaceAll((_, m) => m + 2L)
    // wins(item) = wins-as-winner + number of distinct opponents
    val wins = new java.util.HashMap[Any, Long]()
    meet.keySet.forEach(k => wins.merge(k._1, 1L, (a, b) => a + b))
    cnt.foreach { case (w, _, n) => wins.merge(w, n, (a, b) => a + b) }
    val items: Array[Any] = wins.keySet.toArray
      .sortBy(_.toString) // deterministic output order only
    val nItems = items.length.toLong
    val p = new java.util.HashMap[Any, Long]()
    items.foreach(p.put(_, scale))
    for (_ <- 1 to iters) {
      val d = new java.util.HashMap[Any, Long]()
      meet.forEach { case ((i, j), m) =>
        val t = (m * s2) / math.max(p.get(i) + p.get(j), 1L)
        d.merge(i, t, (a, b) => a + b)
      }
      val praw = new java.util.HashMap[Any, Long]()
      var tot = 0L
      items.foreach { it =>
        val pr = (wins.get(it) * s2) / d.get(it)
        praw.put(it, pr)
        tot += pr
      }
      items.foreach { it =>
        p.put(it, praw.get(it) * scale * nItems / tot)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item",
        pairCounts.schema("winner").dataType),
      org.apache.spark.sql.types.StructField("strength_fp",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("wins",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val out = items.toSeq.map(it =>
      org.apache.spark.sql.Row(it, p.get(it), wins.get(it)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava), schema)
  }

  /** The distributed MM loop — row-identical to the local default; use it
    * when the ITEM set itself exceeds driver memory. */
  def bradleyTerryWeightedDistributed(pairCounts: DataFrame, iters: Int,
      scale: Long = 1L << 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 1, s"scale >= 1, got $scale")
    val s2 = scale * scale
    val comparisons = pairCounts
    val meet = comparisons.select(col("winner").as("i"), col("loser").as("j"),
        col("n"))
      .unionByName(comparisons.select(col("loser").as("i"), col("winner").as("j"),
        col("n")))
      .groupBy("i", "j").agg((sum(col("n")) + lit(2L)).as("m"))
      .repartition(col("i"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val w0 = comparisons.groupBy(col("winner").as("item"))
      .agg(sum(col("n")).as("__w0"))
    val wins = meet.groupBy(col("i").as("item"))
      .agg(count(lit(1)).as("__nopp"))
      .join(w0, Seq("item"), "left")
      .select(col("item"),
        (coalesce(col("__w0"), lit(0L)) + col("__nopp")).as("wins"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = wins.count()
    var p = wins.select(col("item"), lit(scale).as("p"))
    for (_ <- 1 to iters) {
      val denom = meet
        .join(p.select(col("item").as("i"), col("p").as("__pi")), Seq("i"))
        .join(p.select(col("item").as("j"), col("p").as("__pj")), Seq("j"))
        .select(col("i").as("item"),
          expr(s"(m * ${s2}L) div greatest(__pi + __pj, 1L)").as("__t"))
        .groupBy("item").agg(sum("__t").as("__d"))
      val praw = wins.join(denom, Seq("item"))
        .select(col("item"), expr(s"(wins * ${s2}L) div __d").as("__praw"))
      val tot = praw.agg(sum("__praw").as("__tot"))
      p = Lineage.materialize(praw.crossJoin(broadcast(tot))
        .select(col("item"),
          expr(s"(__praw * ${scale}L * ${n}L) div __tot").as("p")))
    }
    val out = p.join(wins, Seq("item"))
      .select(col("item"), col("p").as("strength_fp"), col("wins"))
    meet.unpersist(); wins.unpersist()
    out
  }

  /** Judgment AGREEMENT per unordered item pair — the data-quality audit
    * that belongs BEFORE a [[bradleyTerry]] fit: for every pair that was
    * actually compared, how lopsided were the judgments? `agree_ratio`
    * near 1.0 = annotators (or the preference signal) are consistent on
    * that pair; near 0.5 = coin-flip noise the fit will dilute. Returns
    * (item_a < item_b, wins_a, wins_b, n_total, agree_ratio).
    *
    * Scale shape: the judgment log collapses map-side into ordered-pair
    * counts (ONE corpus-sized exchange), the two directions merge in a
    * pair-sized aggregate, and the ratio is a single IEEE division of
    * exact longs — bit-stable on any engine. Only observed pairs exist
    * anywhere (never items²). */
  /** CALIBRATION AUDIT of a fitted Bradley–Terry model against its own
    * comparison log — the reliability check a reward-model pipeline runs
    * before trusting fitted strengths as probabilities: bucket every
    * comparison by the model's PREDICTED win probability (for the
    * lower-id item, so the orientation is outcome-blind) and compare the
    * bucket's EMPIRICAL win rate to its midpoint. A calibrated model's
    * emp_rate tracks expected_mid; systematic deviation means the
    * strengths are order-right but probability-wrong (typical after too
    * few MM iterations, or under rater noise — run
    * [[raterAgreement]] first).
    *
    *   P̂(a beats b) = s_a / (s_a + s_b)   (Bradley–Terry by definition)
    *
    * Determinism: strengths are the fit's exact fixed-point longs, the
    * prediction is ONE double division per comparison, bucketing is a
    * floor on that double (bit-identical inputs → identical buckets on
    * any engine), and everything else is exact counts + one division per
    * output row.
    *
    * Scale shape: strengths are item-sized and broadcast twice; the log
    * maps narrowly into (bucket, won) and ONE map-side-combined exchange
    * lands `bins` rows. */
  def btCalibration(comparisons: DataFrame, strengths: DataFrame,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val ab = comparisons.select(
      least(col("winner"), col("loser")).as("a"),
      greatest(col("winner"), col("loser")).as("b"),
      when(col("winner") <= col("loser"), 1L).otherwise(0L).as("__wa"))
    val st = strengths.select(col("item"), col("strength_fp"))
    val pr = ab
      .join(broadcast(st.select(col("item").as("a"),
        col("strength_fp").as("__sa"))), Seq("a"))
      .join(broadcast(st.select(col("item").as("b"),
        col("strength_fp").as("__sb"))), Seq("b"))
      .select(col("__wa"), (col("__sa").cast("double") /
        (col("__sa") + col("__sb")).cast("double")).as("__pa"))
    pr.groupBy(least(floor(col("__pa") * bins).cast("long"),
        lit(bins - 1L)).as("bucket"))
      .agg(count(lit(1)).as("n_cmp"), sum("__wa").as("n_a_wins"))
      .withColumn("emp_rate",
        col("n_a_wins").cast("double") / col("n_cmp").cast("double"))
      .withColumn("expected_mid",
        (col("bucket").cast("double") + 0.5) / bins.toDouble)
  }

  def pairAgreement(comparisons: DataFrame): DataFrame =
    pairAgreementFromCounts(comparisons.groupBy("winner", "loser")
      .agg(count(lit(1)).as("n")))

  /** [[pairAgreement]] over the PRE-COMPACTED `(winner, loser, n)` relation
    * — the streamable form, and the same compaction contract as
    * [[bradleyTerryWeighted]]: the report is a pure function of the
    * directed pair counts, so
    * [[graft.streaming.StreamingPreference.agreementSink]] folds
    * micro-batch deltas into the accumulated count table (the SAME table
    * the BT sink folds) and re-reports from it, landing bit-identically
    * on the one-shot report over every judgment seen. */
  def pairAgreementFromCounts(cnt: DataFrame): DataFrame = {
    cnt.select(
        least(col("winner"), col("loser")).as("item_a"),
        greatest(col("winner"), col("loser")).as("item_b"),
        when(col("winner") < col("loser"), col("n")).otherwise(lit(0L)).as("__na"),
        when(col("winner") < col("loser"), lit(0L)).otherwise(col("n")).as("__nb"))
      .groupBy("item_a", "item_b")
      .agg(sum("__na").as("wins_a"), sum("__nb").as("wins_b"))
      .select(col("item_a"), col("item_b"), col("wins_a"), col("wins_b"),
        (col("wins_a") + col("wins_b")).as("n_total"),
        (greatest(col("wins_a"), col("wins_b")).cast("double") /
          (col("wins_a") + col("wins_b")).cast("double")).as("agree_ratio"))
  }

  /** Per-RATER agreement against the pair majority — the annotator-quality
    * screen a preference pipeline runs before trusting a rater (the
    * rater-level follow-on to [[pairAgreement]]'s pair-level audit, in the
    * Cohen's-kappa family of majority-agreement rates): for every judgment a
    * rater cast on a pair where the OVERALL vote has a strict majority
    * direction, did the rater side with the majority? Returns
    * (rater, n_judged, n_adjudicated, n_agree, agree_ratio) where
    * `n_judged` counts all of the rater's judgments, `n_adjudicated` only
    * those on majority-decided pairs (exactly-tied pairs carry no signal —
    * they are excluded from numerator AND denominator, so the ratio is
    * well-defined over adjudicated judgments only), and agree_ratio =
    * n_agree / n_adjudicated (one IEEE division of exact longs; NULL when
    * the rater judged no adjudicated pair).
    *
    * Scale shape: the judgment log collapses map-side into
    * (rater, winner, loser) counts — the ONE corpus-sized exchange; the
    * overall pair majority re-aggregates THAT relation (rater-pair-sized,
    * never re-reading the log), the verdict joins back on the unordered
    * pair key, and the per-rater rollup is a rater-sized aggregate. Only
    * observed pairs exist anywhere (never items²). */
  def raterAgreement(comparisons: DataFrame,
      raterCol: String = "rater"): DataFrame = {
    // one corpus-sized exchange: per-rater ordered-pair counts — EAGERLY
    // materialized (rater-pair-sized, tiny next to the log) because both
    // the majority aggregate and the verdict join consume it; a persist
    // would either leak in a long-lived session or re-run the corpus
    // exchange twice (the decontaminateSpans lesson)
    val rcnt = Lineage.materialize(
      comparisons.groupBy(col(raterCol), col("winner"), col("loser"))
        .agg(count(lit(1)).as("n")))
    val unord = rcnt.select(col(raterCol),
      least(col("winner"), col("loser")).as("item_a"),
      greatest(col("winner"), col("loser")).as("item_b"),
      when(col("winner") < col("loser"), col("n")).otherwise(lit(0L)).as("__na"),
      when(col("winner") < col("loser"), lit(0L)).otherwise(col("n")).as("__nb"))
    // overall majority per unordered pair, from the compacted relation
    val maj = unord.groupBy("item_a", "item_b")
      .agg(sum("__na").as("__wa"), sum("__nb").as("__wb"))
      .filter(col("__wa") =!= col("__wb")) // ties adjudicate nothing
      .select(col("item_a"), col("item_b"),
        (col("__wa") > col("__wb")).as("__maj_a"))
    val out = unord
      .join(maj, Seq("item_a", "item_b"), "left")
      .groupBy(col(raterCol).as("rater"))
      .agg(
        sum(col("__na") + col("__nb")).as("n_judged"),
        sum(when(col("__maj_a").isNotNull, col("__na") + col("__nb"))
          .otherwise(lit(0L))).as("n_adjudicated"),
        sum(when(col("__maj_a") === true, col("__na"))
          .when(col("__maj_a") === false, col("__nb"))
          .otherwise(lit(0L))).as("n_agree"))
      .withColumn("agree_ratio",
        when(col("n_adjudicated") > 0,
          col("n_agree").cast("double") / col("n_adjudicated").cast("double")))
    out
  }

  /** DPO / reward-model PREFERENCE-PAIR MINING (Rafailov et al. 2023,
    * "Direct Preference Optimization"): from per-prompt SCORED samples
    * (a reward score, a judge rating, a pass flag), build the training
    * pair each prompt contributes — chosen = highest-scored sample,
    * rejected = lowest-scored — with deterministic tie-breaks (equal
    * scores resolve to the LOWEST sample id on both ends, so reruns,
    * partitionings and engines mint the identical pair set). Prompts
    * whose margin (best − worst score) falls below `minMargin` are
    * dropped: a zero/low margin means the judge couldn't separate the
    * samples and the pair would be label noise (this also drops every
    * single-sample prompt, margin 0). Scores must be integers — the same
    * integer-score mandate as Dedup.exactBest, because a cross-engine
    * float argmax is not a stable order.
    *
    * Output: (taskCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin, n_samples).
    *
    * Scale shape: ONE map-side-combined exchange on the prompt key; the
    * argmax/argmin ride two struct-MINs ((−score, id) and (score, id)) so
    * per-prompt state is two structs and a count — no window, no sort,
    * no per-prompt sample materialization. */
  def dpoPairs(samples: DataFrame, minMargin: Long = 1L,
      taskCol: String = "task_id", idCol: String = "sample_id",
      scoreCol: String = "score"): DataFrame = {
    val best = min(struct((-col(scoreCol)).as("ns"), col(idCol).as("i")))
    val worst = min(struct(col(scoreCol).as("s"), col(idCol).as("i")))
    samples
      .select(col(taskCol), col(idCol), col(scoreCol).cast("long").as(scoreCol))
      .groupBy(taskCol)
      .agg(best.as("__b"), worst.as("__w"), count(lit(1)).as("n_samples"))
      .select(col(taskCol),
        col("__b.i").as("chosen_id"),
        col("__w.i").as("rejected_id"),
        (-col("__b.ns")).as("chosen_score"),
        col("__w.s").as("rejected_score"),
        (-col("__b.ns") - col("__w.s")).as("margin"),
        col("n_samples"))
      .filter(col("margin") >= minMargin)
  }

  /** KRIPPENDORFF'S ALPHA (Krippendorff 2004, "Content Analysis", §11;
    * nominal data) over the directed preference log — the chance-corrected
    * reliability coefficient the rater-audit family reports UPWARD:
    * [[pairAgreement]] and [[raterAgreement]] are raw majority rates,
    * which read high whenever one label dominates; alpha subtracts the
    * agreement that label prevalence alone would produce (1 = perfect,
    * 0 = chance-level, < 0 = systematic disagreement). The go/no-go
    * number before trusting a judgment log enough to fit a reward model
    * on it.
    *
    * Framing: each unordered item pair is a UNIT; each rater's judgment
    * on it is a binary nominal label (1 = the lexicographically smaller
    * item won). Units with fewer than 2 judgments are unpairable and
    * excluded (the published convention). For nominal data
    *   α = 1 − D_o/D_e,  D_o = Σ_u d_u/(m_u−1) / n,
    *   D_e = 2·n₀·n₁ / (n(n−1)),
    * with m_u = judgments on unit u, d_u = 2·ones_u·(m_u−ones_u) the
    * unit's ordered disagreeing pairs, n = Σ m_u, and n₀/n₁ the global
    * label counts (the coincidence-matrix row sums, which collapse to
    * plain label counts — exact integers).
    *
    * Exactness: the only per-unit division, d_u/(m_u−1), lands on a fixed
    * 10⁻⁶ grid via integer floor division (non-negative, so floor =
    * truncate on every engine), making D_o's numerator an exact LONG sum —
    * no float accumulation order anywhere. The final alpha is one fixed
    * double expression over those integers (exact casts below 2⁵³;
    * at 100 TB the counts stay far under that — n is rater-judgment-,
    * not token-scale). Degenerate logs (one label globally, or no
    * pairable unit) return NULL alpha — chance correction is undefined.
    *
    * Output: ONE row (units, n_values, n_zero, n_one, do_scaled, alpha).
    *
    * Scale shape: one map-side-combined exchange on the unordered pair
    * key, then a single global aggregate of five longs — the log itself
    * is never re-read and nothing rater² or item² exists. */
  def krippendorffAlpha(comparisons: DataFrame,
      winnerCol: String = "winner", loserCol: String = "loser"): DataFrame =
    krippendorffAlphaWeighted(
      comparisons.groupBy(col(winnerCol), col(loserCol))
        .agg(count(lit(1)).as("n")),
      winnerCol, loserCol)

  /** [[krippendorffAlpha]] from an already-COMPACTED directed count table
    * `(winner, loser, n)` — alpha is a pure function of that relation
    * (unit m = both directions' counts summed, ones = the smaller-item-won
    * direction), which is what makes the STREAMING form free: counts add
    * across micro-batches, so a [[graft.streaming.GenStore]]-accumulated
    * table refits bit-identically to a one-shot pass (the
    * bradleyTerryWeighted discipline). */
  def krippendorffAlphaWeighted(counts: DataFrame,
      winnerCol: String = "winner", loserCol: String = "loser"): DataFrame = {
    val units = counts
      .select(
        least(col(winnerCol), col(loserCol)).as("a"),
        greatest(col(winnerCol), col(loserCol)).as("b"),
        when(col(winnerCol) < col(loserCol), col("n")).otherwise(lit(0L))
          .as("ones_n"),
        col("n"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("n")).as("m"), sum(col("ones_n")).as("ones"))
      .filter(col("m") >= 2)
    units
      .agg(
        count(lit(1)).as("units"),
        sum(col("m")).as("n_values"),
        sum(col("m") - col("ones")).as("n_zero"),
        sum(col("ones")).as("n_one"),
        sum(expr("(2 * ones * (m - ones) * 1000000) div (m - 1)"))
          .as("do_scaled"))
      .withColumn("alpha",
        when(col("n_zero") === 0 || col("n_one") === 0, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            ((col("n_values") - 1).cast("double") * col("do_scaled").cast("double")) /
              (lit(1000000.0) * lit(2.0) * col("n_zero").cast("double") *
                col("n_one").cast("double"))))
  }

  /** KRIPPENDORFF'S ALPHA for INTERVAL data (Krippendorff 2004, §11.3) —
    * the rating-scale sibling of [[krippendorffAlpha]]: when judgments are
    * numeric scores (0–9 quality ratings, 1–5 Likert grades), nominal
    * alpha treats a 4-vs-5 split exactly like 0-vs-9; the interval metric
    * weights each disagreement by the SQUARED difference, which is what a
    * score-scale annotation audit needs.
    *
    * Input: one row per judgment `(unitCol, valueCol)` with integer
    * values. The squared-difference sums collapse to moment algebra —
    * per unit u: Σ_{i≠j}(vᵢ−vⱼ)² = 2·(m_u·Σv² − (Σv)²), and globally the
    * expected disagreement is 2·(n·S₂ − S₁²) over the pooled moments —
    * so EVERYTHING is exact longs; the per-unit /(m_u−1) rides the same
    * 10⁻⁶ floor grid as the nominal form, and
    *   α = 1 − (n−1)·do_scaled / (10⁶·2·(n·S₂ − S₁²)),
    * one fixed double expression (exact casts below 2⁵³ — with b-bit
    * ratings that bounds n ≲ 2^{(53−2b)/2}, far above judgment-log scale).
    * Zero score variance (or no pairable unit) → NULL alpha.
    *
    * Output: ONE row (units, n_values, v_sum, v_sumsq, do_scaled, alpha).
    * Scale shape: one map-side-combined exchange on the unit key, then a
    * single global aggregate — identical to the nominal form. */
  def krippendorffAlphaInterval(ratings: DataFrame,
      unitCol: String = "unit", valueCol: String = "value"): DataFrame = {
    val units = ratings
      .select(col(unitCol).as("u"), col(valueCol).cast("long").as("v"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("m"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .filter(col("m") >= 2)
    units
      .agg(
        count(lit(1)).as("units"),
        sum(col("m")).as("n_values"),
        sum(col("s1")).as("v_sum"),
        sum(col("s2")).as("v_sumsq"),
        sum(expr("(2 * (m * s2 - s1 * s1) * 1000000) div (m - 1)"))
          .as("do_scaled"))
      .withColumn("alpha", {
        val de = col("n_values") * col("v_sumsq") - col("v_sum") * col("v_sum")
        when(de.isNull || de === 0, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            ((col("n_values") - 1).cast("double") * col("do_scaled").cast("double")) /
              (lit(1000000.0) * lit(2.0) * de.cast("double")))
      })
  }
}
