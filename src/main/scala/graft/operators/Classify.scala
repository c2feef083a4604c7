package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** In-engine trainable linear filters — the "fit a quality classifier ON
  * the corpus you are curating" capability (the FastText/fineweb-edu
  * quality-filter workflow), restricted to learners whose training
  * arithmetic is EXACT: no sigmoid, no float gradient, so the fitted
  * weights are a pure integer function of the data and replay
  * bit-identically on any engine, rerun, or partitioning — the same
  * oracle discipline as every other graft learner (the PageRank /
  * Bradley–Terry unrolled-round shape).
  */
object Classify {

  /** BATCH PERCEPTRON (Rosenblatt 1958 update, synchronous batch variant —
    * the classic mistake-driven linear separator): integer features
    * x ∈ Z^k with an implicit leading bias 1, labels y ∈ {−1, +1};
    * round r computes every row's margin y·(w_{r-1}·x) under the CURRENT
    * weights, and adds Σ y·x over the misclassified rows (margin ≤ 0,
    * so round 1 under w = 0 updates on EVERY row — the standard
    * convention) to the weight vector. All arithmetic is exact longs:
    * the fitted weights and the per-round mistake counts are a pure
    * function of the multiset of (y, x) rows.
    *
    * Output: one row per round, `(round, n_mis, w0, w1, …, wk)` — w0 the
    * bias, wi the weight of featureCols(i−1), each row the weights AFTER
    * that round's update and `n_mis` the mistakes made UNDER the weights
    * the round started with (read top-down: the training curve; a
    * separable feature set drives n_mis toward 0).
    *
    * Rows whose label or any feature is NULL drop out of both the count
    * and the update (NULL margin fails the ≤ 0 filter on every engine).
    *
    * Scale shape: `rounds` bounded driver rounds over a persisted narrow
    * (y, x) projection — each ONE map-side-combined global aggregate of
    * k+2 longs with the weights riding as literals (the k-means /
    * k-center round pattern); nothing corpus-sized shuffles, ever. Weight
    * magnitude is bounded by rounds·Σ|x|, so with b-bit features and
    * N rows keep rounds·N·2^b below 2^63 — at true 100 TB row counts,
    * fit on a deterministic hash-sample (the qualityQuantileFilter
    * pattern) rather than widening to 128-bit sums. */
  def batchPerceptron(data: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(featureCols.nonEmpty, "at least one feature column required")
    val spark = data.sparkSession
    val k = featureCols.size + 1
    val proj = data.select(
      col(labelCol).cast("long").as("y") +: lit(1L).as("x0") +:
        featureCols.zipWithIndex.map { case (f, i) =>
          col(f).cast("long").as(s"x${i + 1}")
        }: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Array.fill[Long](k)(0L)
      val out = Vector.newBuilder[Row]
      for (r <- 1 to rounds) {
        val margin = col("y") *
          (0 until k).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)
        val mis = margin <= 0
        val aggs = count(when(mis, 1)).as("mis") +:
          (0 until k).map(i =>
            coalesce(sum(when(mis, col("y") * col(s"x$i"))), lit(0L))
              .as(s"d$i"))
        val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
        var i = 0
        while (i < k) { w(i) += row.getLong(i + 1); i += 1 }
        out += Row.fromSeq(r.toLong +: row.getLong(0) +: w.toVector)
      }
      val schema = StructType(
        StructField("round", LongType, nullable = false) +:
          StructField("n_mis", LongType, nullable = false) +:
          (0 until k).map(i => StructField(s"w$i", LongType, nullable = false)))
      spark.createDataFrame(
        java.util.Arrays.asList(out.result(): _*), schema)
    } finally { proj.unpersist(); () }
  }

  /** OPTIMAL DECISION STUMPS (the AdaBoost base learner; Freund &
    * Schapire 1997): for every integer feature, the exactly-optimal
    * 1-D threshold rule — minimize misclassifications over BOTH
    * polarities ("x ≤ t → +1" and "x ≤ t → −1") and every observed
    * threshold — computed in closed form from cumulative label counts.
    * This is the interpretable face of the quality-filter family: where
    * [[batchPerceptron]] fits an opaque linear score, the stump table
    * reads as "cut documents at n_tokens ≤ 47" with its exact error
    * count, per feature.
    *
    * Output: one row per feature, `(feature, threshold, polarity,
    * n_errors, n_rows)` — polarity +1 means "x ≤ threshold predicts +1",
    * −1 the reverse; `n_errors` the rule's exact training
    * misclassifications over the `n_rows` non-NULL rows; ties broken by
    * the (n_errors, threshold, polarity) total order so every engine
    * picks the same stump. Rows with NULL label or feature drop (and
    * n_rows is per-feature, so unevenly-NULL features stay honest).
    *
    * Scale shape: the melt is a narrow union (one pass per feature over
    * the projection); counts collapse in ONE map-side-combined exchange
    * keyed (feature, value); the cumulative scan windows over the
    * VALUE-DOMAIN-sized relation (distinct values per feature — config-
    * scale next to the corpus), and the argmin is a feature-keyed
    * struct-min. Nothing corpus-sized is ever windowed. */
  def bestStumps(data: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame =
    stumpCandidates(data, featureCols, labelCol, lit(1L))
      .groupBy(col("feature"))
      .agg(min(struct(col("err"), col("v"), col("polarity"),
        col("w_total"))).as("b"))
      .select(col("feature"), col("b.v").as("threshold"),
        col("b.polarity").as("polarity"), col("b.err").as("n_errors"),
        col("b.w_total").as("n_rows"))

  /** Every candidate stump's WEIGHTED error: (feature, v, polarity, err,
    * w_total) over all observed thresholds and both polarities, with each
    * row counting `wCol` instead of 1 — the shared core of [[bestStumps]]
    * (weights ≡ 1) and [[boostedStumps]]. */
  private def stumpCandidates(data: DataFrame, featureCols: Seq[String],
      labelCol: String, wCol: org.apache.spark.sql.Column): DataFrame = {
    require(featureCols.nonEmpty, "at least one feature column required")
    import org.apache.spark.sql.expressions.Window
    val melted = featureCols.map { f =>
      data.select(lit(f).as("feature"), col(f).cast("long").as("v"),
        col(labelCol).cast("long").as("y"), wCol.cast("long").as("w"))
    }.reduce(_ unionAll _)
      .filter(col("v").isNotNull && col("y").isNotNull)
    val g = melted.groupBy(col("feature"), col("v"))
      .agg(sum(when(col("y") === 1, col("w")).otherwise(0L)).as("np"),
        sum(when(col("y") === -1, col("w")).otherwise(0L)).as("nn"))
    val cum = Window.partitionBy("feature").orderBy("v")
    val tot = Window.partitionBy("feature")
    val c = g.select(col("feature"), col("v"),
      sum("np").over(cum).as("cp"), sum("nn").over(cum).as("cn"),
      sum("np").over(tot).as("p"), sum("nn").over(tot).as("n"))
    // polarity +1: errors = negatives ≤ t + positives > t; −1 the mirror
    c.select(col("feature"), col("v"), lit(1L).as("polarity"),
        (col("cn") + col("p") - col("cp")).as("err"),
        (col("p") + col("n")).as("w_total"))
      .unionAll(c.select(col("feature"), col("v"), lit(-1L).as("polarity"),
        (col("cp") + col("n") - col("cn")).as("err"),
        (col("p") + col("n")).as("w_total")))
  }

  /** BOOSTED STUMPS with integer weight-doubling — the mistake-doubling
    * reweighting scheme (the Littlestone–Warmuth weighted-majority /
    * discrete-AdaBoost-with-fixed-α=ln 2 family): round r fits the
    * globally-best stump under the CURRENT row weights, then every row
    * the new stump misclassifies has its weight DOUBLED, so the next
    * round's stump must attend to what the ensemble still gets wrong.
    * Doubling (not AdaBoost's ε-dependent α) keeps every weight an exact
    * power of two — w(row) = 2^(mistakes by prior stumps) = a product of
    * integer CASEs — so the whole ensemble is a pure integer function of
    * the corpus, replayable round-for-round by the oracle's chained
    * 1-row stump CTEs. With R rounds weights stay ≤ 2^{R−1}: keep
    * R + log₂(rows·max_w) under 63.
    *
    * Output: one row per round, `(round, feature, threshold, polarity,
    * w_errors, w_total)` — the round's chosen stump, its weighted error
    * and the total weight in play (w_total grows as mistakes compound:
    * the curve of how much mass the ensemble still misses). Overall
    * argmin ties break by the (err, feature, threshold, polarity) total
    * order.
    *
    * Scale shape: `rounds` bounded driver rounds; each recomputes row
    * weights inline (a CASE chain over the ≤ r−1 collected stump
    * literals — a narrow map, no stored per-row state) and reruns the
    * [[stumpCandidates]] pipeline: one map-side-combined exchange plus
    * the value-domain window per round, one collected row back. */
  def boostedStumps(data: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = data.sparkSession
    val proj = data.select(col(labelCol).cast("long").as("y") +:
        featureCols.map(f => col(f).cast("long").as(f)): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // (feature, threshold, polarity) of the stumps picked so far
      var stumps = Vector.empty[(String, Long, Long)]
      def misFactor(s: (String, Long, Long)) = {
        val pred = when(col(s._1) <= lit(s._2), lit(s._3))
          .otherwise(lit(-s._3))
        when(pred =!= col("y"), lit(2L)).otherwise(lit(1L))
      }
      val out = Vector.newBuilder[Row]
      for (r <- 1 to rounds) {
        val w =
          if (stumps.isEmpty) lit(1L)
          else stumps.map(misFactor).reduce(_ * _)
        val best = stumpCandidates(proj, featureCols, "y", w)
          .orderBy(col("err").asc, col("feature").asc, col("v").asc,
            col("polarity").asc)
          .limit(1).collect()(0)
        val pick = (best.getString(0), best.getLong(1), best.getLong(2))
        stumps :+= pick
        out += Row(r.toLong, pick._1, pick._2, pick._3,
          best.getLong(3), best.getLong(4))
      }
      val schema = StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("feature", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("threshold", LongType, nullable = false),
        StructField("polarity", LongType, nullable = false),
        StructField("w_errors", LongType, nullable = false),
        StructField("w_total", LongType, nullable = false)))
      spark.createDataFrame(
        java.util.Arrays.asList(out.result(): _*), schema)
    } finally { proj.unpersist(); () }
  }

  /** Inference companion: the signed decision value w·[1, x] and the ±1
    * prediction for every row, with the weights as plain literals — a
    * narrow codegen'd map, the deploy side of [[batchPerceptron]]. */
  /** MULTINOMIAL NAIVE BAYES text classifier, self-fit and self-scored:
    * trains add-one-smoothed per-class token models on `docs` (rows with a
    * NULL label are excluded from the model) and scores EVERY row,
    * returning `(idCol, labelCol, pred, score)` — the argmax class and its
    * log-posterior (McCallum & Nigam 1998's event model). The standard
    * first-ladder rung of corpus classification: topic/domain/language
    * routing, and the cheap teacher for distilling corpus-level labels.
    *
    *   score(d, c) = ln(D_c / D) + Σ_w tf(d,w) · ln((C(w,c)+1)/(N_c+V))
    *               = ln(D_c / D) − T_d·ln(N_c+V) + Σ_w tf·ln(C(w,c)+1)
    *
    * The refactor on the right is the SPARSITY trick that makes the plan
    * scale: ln(C+1) = 0 for unseen (w, c), so the only corpus-sized join
    * is doc-term-frequencies against the OBSERVED class-token table —
    * never a dense vocab × classes expansion. T_d rides a per-doc count;
    * the −T_d·ln(N_c+V) and prior terms attach in the small doc × classes
    * product (classes broadcast). Tokenization is the engine-wide
    * [[TextAnalysis.lmToks]] boundary.
    *
    * Determinism: every count is an exact long; ln/multiply/sum run in
    * doubles, and the argmax is taken over scores on the boundary-stable
    * 10⁻⁴ grid ([[graft.functions.StableRound.round4]]) with ties to the
    * SMALLEST class label — one lexicographic `min(struct(-score, c))`,
    * so both engines pick the same class even when two classes' scores
    * collide on the grid. Returned `score` is the rounded winner.
    *
    * Scale shape: three map-side-combined aggregates over the exploded
    * token relation (class-token, doc-term, doc-length; the explode is
    * persisted and feeds all three), one (w)-keyed equi-join for the
    * sparse contributions, and the doc × classes product where classes is
    * a broadcast (class cardinality is human-scale by construction). V, D
    * ride 1-row broadcast cross joins — the plan is fully lazy, no driver
    * scalar. */
  def naiveBayes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "lang"): DataFrame = {
    val toks = docs.where(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("__cls"),
        explode(TextAnalysis.lmToks(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val classTok = toks.groupBy(col("__cls"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val classes = docs.where(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("__cls")).agg(count(lit(1)).as("ndocs"))
      .join(classTok.groupBy("__cls").agg(sum("cnt").as("ntok")), Seq("__cls"), "left")
      .select(col("__cls"), col("ndocs"), coalesce(col("ntok"), lit(0L)).as("ntok"))
    val vocab = classTok.select("w").distinct().agg(count(lit(1)).as("vsize"))
    val totd = docs.agg(count(lit(1)).as("dtot"))
    val docTf = toks.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val docLen = toks.groupBy(col(idCol)).agg(count(lit(1)).as("tlen"))
    val contrib = docTf.join(classTok, Seq("w"))
      .groupBy(col(idCol), col("__cls"))
      .agg(sum(col("tf").cast("double") *
        log((col("cnt") + lit(1L)).cast("double"))).as("__s"))
    val score = log(col("ndocs").cast("double") / col("dtot").cast("double")) -
      col("tlen").cast("double") *
        log((col("ntok") + col("vsize")).cast("double")) +
      coalesce(col("__s"), lit(0.0))
    docs.select(col(idCol), col(labelCol))
      .join(docLen, Seq(idCol), "left")
      .na.fill(0L, Seq("tlen"))
      .crossJoin(broadcast(classes))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(totd))
      .join(contrib, Seq(idCol, "__cls"), "left")
      .select(col(idCol), col(labelCol),
        struct((-graft.functions.StableRound.round4(score)).as("ns"),
          col("__cls").as("c")).as("__m"))
      .groupBy(col(idCol), col(labelCol))
      .agg(min(col("__m")).as("__m"))
      .select(col(idCol), col(labelCol),
        col("__m.c").as("pred"), (-col("__m.ns")).as("score"))
  }

  def perceptronPredict(data: DataFrame, featureCols: Seq[String],
      weights: Seq[Long]): DataFrame = {
    require(weights.size == featureCols.size + 1,
      s"need ${featureCols.size + 1} weights (bias first), got ${weights.size}")
    val score = weights.zipWithIndex.map { case (wv, i) =>
      if (i == 0) lit(wv) * lit(1L)
      else lit(wv) * col(featureCols(i - 1)).cast("long")
    }.reduce(_ + _)
    data.withColumn("score", score)
      .withColumn("pred", when(col("score") > 0, lit(1L)).otherwise(lit(-1L)))
  }
}
