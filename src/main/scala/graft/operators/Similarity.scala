package graft.operators

import graft.functions.VectorExpressions.dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`).
  *
  * Two physical strategies:
  *  - [[bruteForceTopK]]: broadcast the (small) query set, scan the corpus
  *    once, per-query top-k. The corpus is never shuffled — at 100 TB this is
  *    a single narrow pass; only the tiny (query × k) result moves.
  *  - [[lshBucketedPairs]]: random-hyperplane LSH buckets turn the all-pairs
  *    problem into an equi-join on bucket id — the scale path when the query
  *    set IS the corpus.
  *
  * Vector math: embeddings are normalized to unit length ONCE per vector (a
  * narrow map), after which every pair score is a single codegen'd
  * [[graft.functions.DotProduct]] — the per-pair hot loop carries no norm
  * recomputation and no interpreted lambdas.
  */
object Similarity {

  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** id + unit-length double vector; zero/null vectors are dropped.
    *
    * The zero-vector guard filters on the SCALAR norm (`_n > 0`) BEFORE the
    * normalized array is built — never on the array itself. The old
    * `filter(outVec.isNotNull)` form was pushed below the projects by
    * PushDownPredicates, inlining the whole input chain into the condition
    * INCLUDING the per-element `x / sqrt(dot(chain, chain))` lambda: for a
    * computed input like quantize∘dequantize that is O(d²) interpreted
    * chain evaluations per row (measured 108 s for 2,000 64-dim vectors —
    * the round-10 `sim_topk_q8` scale-killer). Filtering on `_n` inlines
    * only one scalar chain per row. */
  private[graft] def unitVectors(emb: DataFrame, idCol: String, vecCol: String,
      outId: String, outVec: String): DataFrame =
    unitVectorsWith(emb, idCol, vecCol, outId, outVec, Nil)

  /** [[unitVectors]] carrying extra pass-through columns (each aliased
    * `"col" -> "outName"`) — same scalar-norm filter construction. */
  private[operators] def unitVectorsWith(emb: DataFrame, idCol: String,
      vecCol: String, outId: String, outVec: String,
      carry: Seq[(String, String)]): DataFrame = {
    val v = toDoubleVec(col(vecCol))
    val carried = carry.map { case (c, out) => col(c).as(out) }
    val carriedOut = carry.map { case (_, out) => col(out) }
    emb.select(col(idCol).as(outId) +: v.as("_v") +: carried: _*)
      .select(col(outId) +: sqrt(dot(col("_v"), col("_v"))).as("_n") +:
        col("_v") +: carriedOut: _*)
      .filter(col("_n") > 0)
      .select(col(outId) +: transform(col("_v"), x => x / col("_n")).as(outVec) +:
        carriedOut: _*)
  }

  /** Exact top-k neighbors for each query vector, brute force.
    *
    * `queries` is broadcast (assert it's small); the corpus side stays
    * partition-local until the final per-query top-k, which Spark's
    * WindowGroupLimit pushes into a partial top-k below the shuffle.
    *
    * The corpus unit vectors are PERSISTED (the same guard [[ivfTopK]]
    * carries): without the cache boundary, CollapseProject inlines whatever
    * expression chain produced the corpus embedding — for a
    * quantize∘dequantize input that is three interpreted higher-order
    * transforms — into the per-PAIR dot/norm evaluation, re-running it
    * queries-× per corpus row (measured 43× slowdown on the SQ8 path,
    * round-10 verdict). One materialized narrow pass, then every pair score
    * reads cached unit vectors. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qu")
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "cu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qu"), col("cu")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings") — the
    * parallel-corpus op of an MT / multilingual-LLM data pipeline: given
    * two embedding collections (the two language sides, encoded into one
    * space), mine aligned pairs by MUTUAL BEST MARGIN. Raw cosine is a bad
    * mining score (hubs score high against everything); the margin RATIO
    * divides cos(x, y) by the mean cosine of the two points' k-NN
    * neighborhoods, so a pair merely sitting in a dense region scores ~1
    * while a true translation scores well above its neighborhood.
    *
    *   margin(x, y) = cos(x, y) / (Σ_{z∈NNk(x)} cos(x, z) / 2k +
    *                               Σ_{z∈NNk(y)} cos(y, z) / 2k)
    *
    * Candidates are the MUTUAL k-NN pairs (y in x's forward top-k AND x in
    * y's backward top-k); a pair is mined when it is the best-margin
    * candidate of BOTH endpoints (the paper's "max" retrieval strategy,
    * mutualized) and clears `threshold` (>1 = closer than the neighborhood
    * average; the paper tunes ~1.04–1.2). Ties break by neighbor id.
    *
    * Determinism: unit vectors, left-fold dot products, rank-ordered
    * 0.0-seeded neighborhood sums and a fixed-order denominator — every
    * double is the same IEEE op sequence on any engine, so the DuckDB
    * mirror replays scores AND argmax selections bit-exactly.
    *
    * Scale shape: this is the EXACT baseline — one broadcast of the
    * smaller side over the larger (the [[bruteForceTopK]] contract), two
    * window top-ks over the same persisted score relation, then
    * candidate-sized joins. At 100 TB sides, swap the cross-score for the
    * [[ivfTopKWith]] cell-probe join (both directions) and feed the SAME
    * margin/mutual tail — the neighborhoods become approximate, the
    * mining algebra is unchanged (faiss mines CCMatrix exactly this way). */
  def bitextMine(src: DataFrame, tgt: DataFrame, k: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = unitVectors(src, idCol, vecCol, "src_id", "su")
    val t = unitVectors(tgt, idCol, vecCol, "tgt_id", "tu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    import org.apache.spark.sql.expressions.Window
    // ONE persisted score relation feeds both direction top-ks and the
    // candidate join — the cross product is computed once
    val scored = t.join(broadcast(s))
      .withColumn("cosine", dot(col("su"), col("tu")))
      .select("src_id", "tgt_id", "cosine")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wF = Window.partitionBy("src_id")
      .orderBy(col("cosine").desc, col("tgt_id").asc)
    val wB = Window.partitionBy("tgt_id")
      .orderBy(col("cosine").desc, col("src_id").asc)
    val fwd = scored.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= k)
    val bwd = scored.withColumn("rank", row_number().over(wB))
      .filter(col("rank") <= k)
    marginMutualTail(fwd, bwd, k, threshold)
  }

  /** [[bitextMine]] with the k-NN stage swapped for the IVF cell-probe
    * join — the 100 TB path: each direction runs [[ivfTopK]] (centroids
    * sampled from ITS corpus side), the margin/mutual tail is IDENTICAL.
    * The neighborhoods are approximate (per IVF recall), the mining
    * algebra and determinism are unchanged — this is how faiss mines
    * CCMatrix-scale corpora. */
  def bitextMineIvf(src: DataFrame, tgt: DataFrame, k: Int, threshold: Double,
      nLists: Int, nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fwd = ivfTopK(src, tgt, k, nLists, nProbe, idCol, vecCol)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cosine"), col("rank"))
    val bwd = ivfTopK(tgt, src, k, nLists, nProbe, idCol, vecCol)
      .select(col("query_id").as("tgt_id"), col("neighbor_id").as("src_id"),
        col("cosine"), col("rank"))
    marginMutualTail(fwd, bwd, k, threshold)
  }

  /** The margin + mutual-argmax tail shared by the exact and IVF miners:
    * `fwd`/`bwd` carry one direction's k-NN each — (src_id, tgt_id,
    * cosine, rank). Persists both (each feeds its neighborhood sum AND
    * the candidate join); the persisted relations feed the returned lazy
    * plan, so callers owning long-lived sessions clearCache. */
  private def marginMutualTail(fwd0: DataFrame, bwd0: DataFrame, k: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fwd = fwd0.persist(StorageLevel.MEMORY_AND_DISK)
    val bwd = bwd0.persist(StorageLevel.MEMORY_AND_DISK)
    // rank-ordered 0.0-seeded folds (the eval_retrieval DCG pattern): the
    // neighborhood sum is the same IEEE addition sequence on any engine
    def nnSum(df: DataFrame, key: String, out: String): DataFrame =
      df.groupBy(key).agg(
        aggregate(
          sort_array(collect_list(struct(col("rank"), col("cosine")))),
          lit(0.0), (acc, e) => acc + e.getField("cosine")).as(out))
    val nnS = nnSum(fwd, "src_id", "nn_src")
    val nnT = nnSum(bwd, "tgt_id", "nn_tgt")
    val denom2k = lit(2.0 * k)
    val cand = fwd.select("src_id", "tgt_id", "cosine")
      .join(bwd.select("src_id", "tgt_id"), Seq("src_id", "tgt_id")) // mutual k-NN
      .join(nnS, "src_id").join(nnT, "tgt_id")
      .withColumn("margin", col("cosine") /
        (col("nn_src") / denom2k + col("nn_tgt") / denom2k))
    val bestF = Window.partitionBy("src_id")
      .orderBy(col("margin").desc, col("tgt_id").asc)
    val bestB = Window.partitionBy("tgt_id")
      .orderBy(col("margin").desc, col("src_id").asc)
    cand
      .withColumn("rf", row_number().over(bestF))
      .withColumn("rb", row_number().over(bestB))
      .filter(col("rf") === 1 && col("rb") === 1 &&
        col("margin") > threshold)
      .select("src_id", "tgt_id", "cosine", "margin")
  }

  /** Deterministic centroid sample from a unit-vector relation: the first
    * `nLists` vectors by portable id hash (not xxhash64 — the selection stays
    * replayable by external engines; the DuckDB oracles mirror it in plain
    * SQL). The one driver-side step of the IVF/SemDeDup family — nLists rows,
    * collected once, shipped back as literals. */
  private[operators] def sampleCentroids(unit: DataFrame, idCol: String,
      vecCol: String, nLists: Int, seed: Long): Seq[Seq[Double]] =
    unit.orderBy(Sampling.hashRaw(col(idCol), seed), col(idCol))
      .limit(nLists).select(col(vecCol)).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq

  /** (score, cell) struct per centroid — argmax/sort over this array drives
    * cell assignment and probe selection. */
  private[graft] def cellScores(v: Column, centroids: Seq[Seq[Double]]): Column =
    array(centroids.zipWithIndex.map {
      case (p, i) => struct(dot(v, typedLit(p)).as("s"), lit(i).as("c"))
    }: _*)

  /** IVF (inverted-file) ANN: the corpus is partitioned into `nLists` Voronoi
    * cells around centroids sampled deterministically from the corpus itself;
    * each query probes only its `nProbe` nearest cells. With nProbe == nLists
    * this degrades gracefully to exact brute force.
    *
    * Scale shape: centroids are tiny and broadcast as literals (collected once
    * from a deterministic hash-ordered sample — the only driver-side step);
    * corpus assignment is a narrow map; the probe is an equi-join on cell id,
    * so each query scores ~nProbe/nLists of the corpus instead of all of it. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nLists: Int,
      nProbe: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists)
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "cu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = sampleCentroids(c, "neighbor_id", "cu", nLists, seed)
    ivfProbe(queries, c, k, centroids, nProbe, idCol, vecCol)
  }

  /** [[ivfTopK]] against a caller-supplied centroid list — the fitted-cells
    * composition: `ivfTopKWith(q, corpus, k, kmeansCentroids(corpus, L, r),
    * nProbe)` upgrades the hash-sampled Voronoi structure to Lloyd-refined
    * cells with the identical probe plan. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "at least one centroid required")
    require(nProbe >= 1 && nProbe <= centroids.size,
      s"nProbe must be in [1, ${centroids.size}], got $nProbe")
    // NO persist here: with caller-supplied centroids the corpus unit
    // vectors feed exactly one consumer (the probe join) — ivfTopK persists
    // because ITS corpus side also drives the centroid-sample collect
    ivfProbe(queries, unitVectors(corpus, idCol, vecCol, "neighbor_id", "cu"),
      k, centroids, nProbe, idCol, vecCol)
  }

  private def ivfProbe(queries: DataFrame, c: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nProbe: Int, idCol: String,
      vecCol: String): DataFrame = {
    // corpus-side assignment is a single argmax fold (array_max on (s, c)
    // structs — ties take the larger cell), NOT a full nLists-struct sort:
    // at 100 TB the assignment map runs once per corpus row and the sort's
    // allocation + O(L log L) compares were pure waste
    val assigned = c.withColumn("cell",
      array_max(cellScores(col("cu"), centroids)).getField("c"))
    // query side keeps the descending (s, c) sort: it needs the nProbe-prefix,
    // and queries are the small side by contract
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qu")
      .withColumn("cell", explode(slice(
        transform(reverse(array_sort(cellScores(col("qu"), centroids))),
          x => x.getField("c")), 1, nProbe)))
    val scored = q.join(assigned, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qu"), col("cu")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Fixed-point scale (2⁴⁰) for [[kmeansCentroids]]' exact component sums:
    * unit-vector components land in [−1, 1], so the scaled integers stay
    * ≤ 2⁴⁰ and a decimal(38) sum is overflow-safe past 10²⁷ rows per cell. */
  private[graft] val FixedPointScale = 1099511627776L

  /** Deterministic spherical k-means refinement (Lloyd rounds): start from
    * the [[sampleCentroids]] hash-sample, then `rounds` times (1) assign
    * every unit vector to its argmax-inner-product centroid and (2) recompute
    * each cell's centroid as the NORMALIZED component mean. Upgrades the
    * IVF/SemDeDup cell structure from "sampled rows" to fitted centroids —
    * feed the result anywhere a centroid list is consumed.
    *
    * The recompute is EXACT fixed-point arithmetic: components are scaled by
    * [[FixedPointScale]] and floor(x·S + 0.5)-rounded to integers, summed as
    * decimals (exact, order-independent, overflow-safe), and converted back
    * to doubles once per (cell, pos). A double-sum mean would depend on
    * shuffle arrival order; the fixed-point sum makes the refined centroids
    * a pure function of (data, seed, rounds) — identical on every run,
    * partitioning, cluster size, and engine (the DuckDB oracle replays the
    * rounds in HUGEINT SQL, bit-for-bit).
    *
    * Scale shape per round: one narrow argmax assignment pass, one
    * (cell, pos)-keyed exchange that partial-aggregates down to
    * nLists × dim rows, and a KB-sized collect back to plan literals — the
    * same driver-side footprint as [[sampleCentroids]]. Cells that lose all
    * members (or whose mean cancels to the zero vector) drop out and the
    * labels compact order-preservingly — standard k-means degeneracy, the
    * list can only shrink. */
  /** Persist the unit-vector relation for an iterative fit at a
    * ROW-DERIVED width: the cached layout pins every round's assignment
    * stage, and at bench scale the single-split scan leaves it at ONE
    * partition — r18 profiling measured each Lloyd round of
    * sim_topk_pq_kmeans as a ~300 ms single-task job while 31 cores idled.
    * ~1k vectors per task puts a round's argmax work at the scheduling
    * sweet spot; the session shuffle-partition setting stays the upper
    * bound (loopPartitions), so a production-scale relation that already
    * scans wide is NEVER widened (widening only fires when the cached
    * width is below the clamp). Returns the persisted (possibly
    * re-anchored) relation. */
  private def persistForRounds(unit: DataFrame,
      rowsPerPartition: Long = 1024L): DataFrame = {
    val p0 = unit.persist(StorageLevel.MEMORY_AND_DISK)
    val n = p0.count()
    val target = Lineage.loopPartitions(unit.sparkSession, n, rowsPerPartition)
    if (target > p0.rdd.getNumPartitions) {
      val wide = p0.repartition(target).persist(StorageLevel.MEMORY_AND_DISK)
      wide.count()
      p0.unpersist()
      wide
    } else p0
  }

  def kmeansCentroids(emb: DataFrame, nLists: Int, rounds: Int,
      seed: Long = 42, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(nLists >= 1, s"nLists must be >= 1, got $nLists")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val unit =
      if (rounds >= 1) persistForRounds(unitVectors(emb, idCol, vecCol, "id", "v"))
      else unitVectors(emb, idCol, vecCol, "id", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = sampleCentroids(unit, "id", "v", nLists, seed)
      for (_ <- 0 until rounds if cents.nonEmpty) {
        val sums = unit
          .withColumn("cell", array_max(cellScores(col("v"), cents)).getField("c"))
          .select(col("cell"), posexplode(col("v")))
          .select(col("cell"), col("pos"),
            floor(col("col") * lit(FixedPointScale) + lit(0.5))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("fx"))
          .groupBy("cell", "pos")
          .agg(sum(col("fx")).as("s"), count(lit(1)).as("n"))
          .collect()
        cents = sums.groupBy(_.getInt(0)).toSeq.sortBy(_._1).flatMap {
          case (_, rows) =>
            val arr = new Array[Double](rows.length)
            rows.foreach { r =>
              // exact integer → nearest double, then the same double ops as
              // the SQL mirror: (s / n) / S
              arr(r.getInt(1)) =
                r.getDecimal(2).doubleValue() / r.getLong(3).toDouble /
                  FixedPointScale.toDouble
            }
            // left-fold norm — the same op order as DotProduct /
            // list_inner_product, so normalization matches bit-for-bit
            val nrm = math.sqrt(arr.foldLeft(0.0)((acc, x) => acc + x * x))
            if (nrm > 0) Some(arr.map(_ / nrm).toSeq) else None
        }
      }
      cents
    } finally { unit.unpersist(); () }
  }

  /** GREEDY k-CENTER SELECTION (farthest-point traversal; Gonzalez 1985,
    * "Clustering to minimize the maximum intercluster distance" — the
    * classic 2-approximation) — the DIVERSITY-CORESET curation op: pick k
    * maximally spread exemplars from an embedding collection (seed a
    * diverse eval set, cap per-mode redundancy before expensive labeling,
    * initialize k-means better than random). Round 1 takes the
    * deterministic hash-ordered first vector (the [[sampleCentroids]]
    * seeding); every later round picks the point LEAST similar to its
    * nearest already-picked center — argmin over remaining points of
    * max-cosine-to-centers, ties by id.
    *
    * Output: (rank, id, max_cos) for the k picks — `max_cos` is the
    * selected point's similarity to its nearest prior center, so the
    * column read top-down is the COVERAGE CURVE: the rank-r value bounds
    * every remaining point's distance to the selected set (stop where it
    * plateaus near 1 = the corpus is covered). Rank 1 reports 0.0.
    *
    * Scale shape: the selection loop is inherently sequential (each pick
    * conditions the next), so it runs k − 1 bounded driver rounds — each
    * ONE narrow scan of the persisted unit-vector relation scoring
    * `greatest(dot(v, c₁..c_r))` (centers ride as literals, the k-means
    * pattern) with a TakeOrdered(1); no shuffle, no quadratic pair set.
    * k is config-scale (10²–10³); for very large k at 100 TB, hybridize:
    * k-center over IVF cell centroids, then within-cell picks — same
    * algebra, cells bound the scan count. */
  def kcenterSelect(emb: DataFrame, k: Int, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val unit = unitVectors(emb, idCol, vecCol, "id", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val first = unit
        .orderBy(Sampling.hashRaw(col("id"), seed), col("id"))
        .limit(1).select(col("id"), col("v"))
        .as[(Long, Seq[Double])].collect().headOption
      var centers = first.map { case (id, v) => (id, v, 0.0) }.toVector
      var r = 2
      var exhausted = centers.isEmpty
      while (r <= k && !exhausted) {
        val dots = centers.map(c => dot(col("v"), typedLit(c._2)))
        val mc = if (dots.size == 1) dots.head else greatest(dots: _*)
        val picked = centers.map(_._1)
        val next = unit
          .filter(!col("id").isin(picked: _*))
          .select(col("id"), col("v"), mc.as("mc"))
          .orderBy(col("mc").asc, col("id").asc)
          .limit(1).as[(Long, Seq[Double], Double)].collect().headOption
        next match {
          case Some((id, v, m)) => centers :+= ((id, v, m)); r += 1
          case None => exhausted = true // k exceeds the collection
        }
      }
      centers.zipWithIndex
        .map { case ((id, _, m), i) => (i + 1L, id, m) }
        .toDF("rank", idCol, "max_cos")
    } finally { unit.unpersist(); () }
  }

  /** BATCHED k-center — [[kcenterSelect]] with the job-count lever (the
    * [[graft.operators.TextAnalysis.bpeLearnMergesBatched]] idea lifted to
    * farthest-point traversal): each round ONE scan takes the `batchB`
    * farthest candidates (TakeOrdered(B) instead of 1), then a driver-local
    * walk accepts the ordered PREFIX while each candidate's similarity to
    * every batch-accepted point stays ≤ its own max-cos-to-centers, and
    * STOPS the batch at the first violation.
    *
    * Unlike the BPE batcher's dominance filter (a defined variant), this
    * prefix rule is EXACTLY Gonzalez greedy for any batchB: an accepted
    * candidate's distance-to-set is untouched by the batch's earlier
    * accepts (max(mc, cos·) = mc when every cos ≤ mc), every point after
    * it in (mc asc, id asc) order can only move CLOSER to the set as
    * centers are added, and the first violation ends the batch before any
    * pick serial greedy might have reordered — so the output rows are
    * bit-identical to [[kcenterSelect]] at every batchB (spec-pinned; the
    * driver-side interference dot replays [[graft.functions
    * .VectorExpressions.dot]]'s sequential fold exactly). Spread-out
    * collections accept near-full batches, collapsing k−1 driver rounds
    * toward k/B — the lever that takes coreset-k past ~10³ without O(k)
    * job launches (SCALE.md records measured round counts). */
  def kcenterSelectBatched(emb: DataFrame, k: Int, batchB: Int,
      seed: Long = 42, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    kcenterSelectBatchedCounted(emb, k, batchB, seed, idCol, vecCol)._1

  /** [[kcenterSelectBatched]] plus the DRIVER-ROUND COUNT it took — the
    * job-count number SCALE.md records and the spec asserts on. */
  private[graft] def kcenterSelectBatchedCounted(emb: DataFrame, k: Int,
      batchB: Int, seed: Long = 42, idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(batchB >= 1, s"batchB must be >= 1, got $batchB")
    val spark = emb.sparkSession
    import spark.implicits._
    // the engine dot's sequential left-fold, replayed on the driver
    def dotLocal(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val unit = unitVectors(emb, idCol, vecCol, "id", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val first = unit
        .orderBy(Sampling.hashRaw(col("id"), seed), col("id"))
        .limit(1).select(col("id"), col("v"))
        .as[(Long, Seq[Double])].collect().headOption
      var centers = first.map { case (id, v) => (id, v, 0.0) }.toVector
      var rounds = 0
      var exhausted = centers.isEmpty
      while (centers.size < k && !exhausted) {
        rounds += 1
        val dots = centers.map(c => dot(col("v"), typedLit(c._2)))
        val mc = if (dots.size == 1) dots.head else greatest(dots: _*)
        val picked = centers.map(_._1)
        val want = math.min(batchB, k - centers.size)
        val cand = unit
          .filter(!col("id").isin(picked: _*))
          .select(col("id"), col("v"), mc.as("mc"))
          .orderBy(col("mc").asc, col("id").asc)
          .limit(want).as[(Long, Seq[Double], Double)].collect()
        if (cand.isEmpty) exhausted = true
        else {
          var accepted = Vector.empty[(Long, Seq[Double], Double)]
          var stop = false
          cand.foreach { c =>
            if (!stop) {
              if (accepted.forall(a => dotLocal(c._2, a._2) <= c._3))
                accepted :+= c
              else stop = true
            }
          }
          centers ++= accepted
          // fewer candidates than requested AND all accepted: nothing left
          if (!stop && cand.length < want) exhausted = true
        }
      }
      (centers.zipWithIndex
        .map { case ((id, _, m), i) => (i + 1L, id, m) }
        .toDF("rank", idCol, "max_cos"), rounds)
    } finally { unit.unpersist(); () }
  }

  /** MAXIMAL MARGINAL RELEVANCE selection (Carbonell & Goldstein 1998,
    * "The use of MMR, diversity-based reranking") — the RELEVANT-but-
    * DIVERSE curation op, the missing middle between [[bruteForceTopK]]
    * (pure relevance: near-duplicate picks) and [[kcenterSelect]] (pure
    * diversity: ignores the query). Greedily picks k items maximizing
    *   λ·cos(q, d) − (1−λ)·max_{s∈selected} cos(d, s),
    * the standard objective for "give me k examples ABOUT this topic that
    * don't repeat each other" — seed-set expansion for targeted fine-tuning
    * data, diverse few-shot exemplar selection, dedup-aware retrieval.
    *
    * Query convention: the minimum-id unit vector is the query; every
    * other vector is a candidate (callers with a real query vector join it
    * in as id −1). First pick maximizes λ·rel alone (the max-sim term is
    * 0 over an empty selected set — the published convention).
    *
    * Output: (rank, id, rel, score) — `rel` the pick's query cosine,
    * `score` its MMR objective at pick time. From rank 2 on the score
    * column is the non-increasing diminishing-returns curve (later rounds'
    * scores are pointwise ≤ earlier rounds'; rank 1→2 may rise when
    * cosines to pick 1 are negative, because the empty-set max-sim
    * convention is 0) — stop where it crosses 0 (the next pick repeats
    * more than it informs).
    *
    * Scale shape: identical to [[kcenterSelect]] — k bounded driver
    * rounds, each ONE narrow scan of the persisted unit-vector relation
    * (selected vectors ride as literals in a `greatest(dot…)` chain) and
    * a TakeOrdered(1); no shuffle, no pair materialization. λ, rel and
    * the score arithmetic are plain IEEE ops in a fixed order, so the
    * DuckDB mirror replays every round's argmax bit-identically. */
  def mmrSelect(emb: DataFrame, k: Int, lambda: Double = 0.5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = emb.sparkSession
    import spark.implicits._
    val unit = unitVectors(emb, idCol, vecCol, "id", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val q = unit.orderBy(col("id").asc).limit(1)
        .as[(Long, Seq[Double])].collect().headOption
      q match {
        case None =>
          spark.emptyDataset[(Long, Long, Double, Double)]
            .toDF("rank", idCol, "rel", "score")
        case Some((qid, qv)) =>
          val rel = dot(col("v"), typedLit(qv))
          // (id, v, rel, score) per pick, in pick order
          var picks = Vector.empty[(Long, Seq[Double], Double, Double)]
          var exhausted = false
          while (picks.size < k && !exhausted) {
            val sims = picks.map(p => dot(col("v"), typedLit(p._2)))
            val ms =
              if (sims.isEmpty) lit(0.0)
              else if (sims.size == 1) sims.head
              else greatest(sims: _*)
            val score = lit(lambda) * col("rel") - lit(1.0 - lambda) * ms
            val taken = qid +: picks.map(_._1)
            val next = unit
              .filter(!col("id").isin(taken: _*))
              .select(col("id"), col("v"), rel.as("rel"))
              .select(col("id"), col("v"), col("rel"), score.as("score"))
              .orderBy(col("score").desc, col("id").asc)
              .limit(1).as[(Long, Seq[Double], Double, Double)]
              .collect().headOption
            next match {
              case Some(p) => picks :+= p
              case None => exhausted = true // k exceeds the candidate set
            }
          }
          picks.zipWithIndex
            .map { case ((id, _, r, s), i) => (i + 1L, id, r, s) }
            .toDF("rank", idCol, "rel", "score")
      }
    } finally { unit.unpersist(); () }
  }

  /** Cell assignment of every vector against a centroid list (e.g.
    * [[kmeansCentroids]]' output): (idCol, cell, score) — the same narrow
    * argmax fold as [[ivfTopK]]'s corpus side. */
  def kmeansAssign(emb: DataFrame, centroids: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "at least one centroid required")
    val unit = unitVectors(emb, idCol, vecCol, idCol, "v")
    val best = array_max(cellScores(col("v"), centroids))
    unit.select(col(idCol), best.getField("c").cast("long").as("cell"),
      best.getField("s").as("score"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127, slot
    * q_i = floor(x_i/scale + 0.5) ∈ [−127, 127] (round-half-up spelled as
    * floor so every engine computes the identical integer — no banker's-
    * rounding ambiguity). Zero vectors quantize to all-zero with scale 0.
    * A narrow map — 4× smaller embedding storage and int-arithmetic
    * candidate scoring for 100 TB ANN corpora; exactness is bounded by
    * |dequantize − x| ≤ scale/2 per slot (pinned by OperatorsSpec).
    * Output: (idCol, scale, qvec array<long>). */
  def quantize(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = toDoubleVec(col(vecCol))
    emb.select(col(idCol), v.as("_v"))
      .select(col(idCol), (array_max(transform(col("_v"), x => abs(x))) / lit(127.0)).as("scale"),
        col("_v"))
      .select(col(idCol), col("scale"),
        when(col("scale") > 0,
          transform(col("_v"), x => floor(x / col("scale") + lit(0.5)).cast("long")))
          .otherwise(transform(col("_v"), _ => lit(0L))).as("qvec"))
  }

  /** Exact top-k over int8-QUANTIZED relations, scored entirely in the
    * compressed domain — the actual faiss-SQ8 recipe and the reason the
    * codec exists: 4× smaller corpus in memory AND integer multiply-adds per
    * candidate pair, with NO dequantization anywhere in the plan.
    *
    * The algebra: cosine of the dequantized vectors is
    * (Σ qa·qb · sa·sb) / (sa·|qa| · sb·|qb|) — the per-vector scales cancel,
    * so cos = idot(qa,qb) / (√idot(qa,qa) · √idot(qb,qb)) in pure integer
    * dot products ([[graft.functions.LongDotProduct]], a codegen'd long
    * loop). All intermediate values are exact integers < 2^53, so the score
    * is bit-identical to any engine replaying the same arithmetic in
    * doubles (the DuckDB oracle does).
    *
    * Inputs are [[quantize]] outputs (idCol, scale, qvec). Zero vectors
    * (all-zero qvec) have no direction and are dropped from both sides —
    * the same rule as [[bruteForceTopK]]'s unit-vector null filter.
    *
    * Scale shape: corpus norms are one narrow map, persisted (int8 slots:
    * the cached relation is the 4×-smaller one — the memory win happens at
    * the cache); queries broadcast; per-query top-k via WindowGroupLimit's
    * partial push-down. One shuffle (the window's), same as
    * [[bruteForceTopK]]. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorExpressions.dotLong
    def normed(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), col("qvec"),
          sqrt(dotLong(col("qvec"), col("qvec")).cast("double")).as("_n"))
        .filter(col("_n") > 0)
    val q = normed(queries, "query_id")
      .withColumnRenamed("qvec", "qq").withColumnRenamed("_n", "qn")
    val c = normed(corpus, "neighbor_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotLong(col("qq"), col("qvec")).cast("double") / (col("qn") * col("_n")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** 1-bit binary-sign ANN with exact rerank — the memory-extreme end of
    * the quantization ladder ([[quantize]] 8 bits/dim → PQ sub-byte → THIS
    * 1 bit/dim, 512× smaller than float64): candidates are scored by
    * HAMMING distance between sign bitmaps (for unit vectors, popcount of
    * sign disagreement is a monotone proxy for angular distance — Charikar
    * 2002's hyperplane-LSH identity with the coordinate axes as planes),
    * then the top `rerank` per query are re-scored with the EXACT cosine
    * and the top `k` of those returned. `rerank ≥ |corpus|` degrades
    * gracefully to exact brute force (the spec pins that equality).
    *
    * Signs come from the RAW component sign (x/‖x‖ > 0 ⟺ x > 0), so the
    * bitmap — and therefore the candidate set — is impervious to IEEE
    * division differences across engines; the rerank tie-break
    * (cosine desc, neighbor_id asc) is total. Bit packing and the per-word
    * popcount-XOR are UNROLLED at plan-build time (the dim is probed once
    * from the persisted corpus relation) — codegen'd bit ops, no lambdas
    * in the pair loop.
    *
    * Scale shape: corpus bitmaps live beside the persisted unit vectors;
    * the hamming pass moves only (query_id, neighbor_id, hamming) into the
    * partial-top-`rerank` window (WindowGroupLimit pushes below the
    * exchange), and only the candidate ids — never vectors — shuffle into
    * the rerank joins (corpus side keyed on the persisted relation, query
    * side broadcast). */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, k: Int, rerank: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1, got k=$k rerank=$rerank")
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "cu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d = c.select(size(col("cu"))).head.getInt(0)
    val nw = (d + 63) / 64
    def signWords(vec: String): Column = array((0 until nw).map { w =>
      (w * 64 until math.min(d, w * 64 + 64)).map { i =>
        when(element_at(col(vec), i + 1) > 0, lit(1L << (i % 64))).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*)
    val qw = q.select(col("query_id"), signWords("qu").as("qwords"))
    val cw = c.select(col("neighbor_id"), signWords("cu").as("cwords"))
    val ham = (0 until nw).map(w =>
        bit_count(element_at(col("qwords"), w + 1)
          .bitwiseXOR(element_at(col("cwords"), w + 1))))
      .reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val cand = cw.join(broadcast(qw), col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", ham)
      .select("query_id", "neighbor_id", "hamming")
      .withColumn("__hr", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("hamming").asc, col("neighbor_id").asc)))
      .filter(col("__hr") <= rerank)
      .select("query_id", "neighbor_id")
    cand.join(c, Seq("neighbor_id")).join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", dot(col("qu"), col("cu")))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Group-centroid similarity map — corpus cartography: the pairwise
    * cosine between each group's mean unit vector (`(g_a, g_b, cosine)`),
    * the "which sources/classes/shards overlap semantically" overview that
    * drives mixing weights and contamination suspicion before any
    * pair-level work. High centroid cosine between two sources ⇒ route
    * them into the cross-table LSH join; near-orthogonal ⇒ don't pay for
    * it.
    *
    * Determinism discipline (the [[kmeansCentroids]] recipe, kept fully
    * distributed — no driver collect): per-(group, component) FIXED-POINT
    * sums in DECIMAL(38,0) (exact, associative — identical on any
    * partitioning), one double division sequence per component, a 0.0-
    * seeded left-fold norm matching DuckDB's list_reduce order, and the
    * codegen'd dot for the pair score. Zero-norm centroids (exact
    * cancellation) are dropped like zero vectors everywhere else.
    *
    * Scale shape: the corpus is touched once (posexplode → map-side-
    * combined (group, pos) sums — d rows per group reach the exchange);
    * everything after is groups·d-sized, and the pair join is over the
    * group-sized centroid relation. */
  def groupCentroidSim(emb: DataFrame, groupCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = groupUnitCentroids(emb, groupCol, idCol, vecCol)
    cent.select(col("g").as("g_a"), col("cv").as("va"))
      .join(cent.select(col("g").as("g_b"), col("cv").as("vb")),
        col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), dot(col("va"), col("vb")).as("cosine"))
  }

  /** Per-group fixed-point mean UNIT vector — (g, cv); the shared centroid
    * machinery of [[groupCentroidSim]] and [[centroidDrift]] (DECIMAL
    * component sums → bit-identical under any partitioning). */
  private def groupUnitCentroids(emb: DataFrame, groupCol: String,
      idCol: String, vecCol: String): DataFrame = {
    val S = FixedPointScale
    val unit = unitVectorsWith(emb, idCol, vecCol, "id", "v",
      Seq(groupCol -> "g"))
    val sums = unit.select(col("g"), posexplode(col("v")))
      .select(col("g"), col("pos"),
        floor(col("col") * lit(S) + lit(0.5))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("fx"))
      .groupBy("g", "pos")
      .agg(sum(col("fx")).as("s"), count(lit(1)).as("n"))
    sums
      .select(col("g"), struct(col("pos"),
        (col("s").cast("double") / col("n").cast("double") / lit(S.toDouble))
          .as("m")).as("pm"))
      .groupBy("g").agg(array_sort(collect_list(col("pm"))).as("pms"))
      .select(col("g"), transform(col("pms"), p => p.getField("m")).as("mean"))
      .withColumn("__nrm",
        sqrt(aggregate(col("mean"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("__nrm") > 0)
      .select(col("g"), transform(col("mean"), x => x / col("__nrm")).as("cv"))
  }

  /** EMBEDDING DRIFT between two snapshot generations, per group: the
    * cosine between each group's old and new centroid unit vectors — the
    * embedding-space face of the PSI/KS feature monitors ("did class 7's
    * meaning move between releases, and did any class appear/vanish").
    * Same exactness story as [[groupCentroidSim]] (fixed-point DECIMAL
    * sums, one IEEE chain per component); groups present on only one side
    * emit a NULL cosine with the membership flags set — appearance/
    * disappearance is drift too, never silently dropped. */
  def centroidDrift(oldEmb: DataFrame, newEmb: DataFrame, groupCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = groupUnitCentroids(oldEmb, groupCol, idCol, vecCol)
      .select(col("g"), col("cv").as("va"))
    val b = groupUnitCentroids(newEmb, groupCol, idCol, vecCol)
      .select(col("g"), col("cv").as("vb"))
    a.join(b, Seq("g"), "full_outer")
      .select(col("g").as(groupCol),
        when(col("va").isNotNull && col("vb").isNotNull,
          dot(col("va"), col("vb"))).otherwise(lit(null)).as("cosine"),
        col("va").isNotNull.as("in_old"), col("vb").isNotNull.as("in_new"))
  }

  /** Inverse of [[quantize]]: q_i · scale, an `array<double>` usable by every
    * operator above (dot products, LSH, IVF) at reduced precision. */
  def dequantize(quantized: DataFrame, idCol: String = "vec_id"): DataFrame =
    quantized.select(col(idCol),
      transform(col("qvec"), q => q.cast("double") * col("scale")).as("embedding"))

  /** IVF cell assignment against deterministically sampled centroids —
    * (idCol, cell) for every non-zero vector. The standalone form of the
    * corpus-side step [[ivfTopK]] / SemDeDup / [[graft.operators.Sampling
    * .cellBalancedSample]] share: unit vectors persisted for the sample
    * collect + assignment pass, centroids broadcast as literals, assignment
    * a narrow argmax fold. */
  def cellAssignments(emb: DataFrame, nLists: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", seed: Long = 42): DataFrame = {
    require(nLists >= 1, s"nLists must be >= 1, got $nLists")
    val u = unitVectors(emb, idCol, vecCol, idCol, "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = sampleCentroids(u, idCol, "v", nLists, seed)
    u.select(col(idCol),
      array_max(cellScores(col("v"), centroids)).getField("c").cast("long").as("cell"))
  }

  /** Hard-negative mining for contrastive / embedding-model training data:
    * for each query vector, the `k` most cosine-similar corpus vectors
    * whose `labelCol` DIFFERS from the query's — the semantically-close-
    * but-wrong examples a contrastive loss learns most from (the standard
    * in-batch-negatives upgrade: mine them offline, corpus-wide).
    *
    * Same physical shape as [[bruteForceTopK]] (tiny query side broadcast,
    * corpus unit vectors persisted, WindowGroupLimit partial top-k); the
    * label inequality rides the join condition so positives never reach
    * the window. For web-scale corpora compose the same condition over
    * [[ivfTopK]]'s probe join (mine within nProbe cells) — this exact
    * variant is the recall-exact baseline.
    * Output: (query_id, neighbor_id, neg_label, rank, cosine). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      labelCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = unitVectorsWith(queries, idCol, vecCol, "query_id", "qu",
      Seq(labelCol -> "q_label"))
    val c = unitVectorsWith(corpus, idCol, vecCol, "neighbor_id", "cu",
      Seq(labelCol -> "neg_label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          !(col("q_label") <=> col("neg_label")))
      .withColumn("cosine", dot(col("qu"), col("cu")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "neg_label", "rank", "cosine")
  }

  /** CONTRASTIVE TRIPLET MINING — the training-data product built from
    * [[hardNegatives]] and its dual: for every query, the top in-LABEL
    * neighbor (the mined positive — the standard "hardest positive within
    * the class" pick) paired with the top `negK` out-of-label neighbors
    * (the hard negatives). One row per (anchor, positive, negative):
    * exactly the triplet table a contrastive/embedding trainer consumes.
    *
    * Scale shape: both sides reuse the broadcast-query / persisted-corpus /
    * WindowGroupLimit pattern of [[hardNegatives]] (the corpus unit-vector
    * relation is computed once per side); the final composition is a keyed
    * equi-join on query_id between two query-bounded relations — corpus
    * size never touches the join. Anchors with no same-label neighbor (or
    * no out-of-label neighbor) drop: a triplet needs all three legs. */
  def contrastiveTriplets(queries: DataFrame, corpus: DataFrame, negK: Int,
      labelCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(negK >= 1, s"negK must be >= 1, got $negK")
    val q = unitVectorsWith(queries, idCol, vecCol, "query_id", "qu",
      Seq(labelCol -> "q_label"))
    val c = unitVectorsWith(corpus, idCol, vecCol, "neighbor_id", "cu",
      Seq(labelCol -> "c_label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    // the mined positive: top-1 SAME-label neighbor (null-safe equality —
    // the exact dual of hardNegatives' exclusion)
    val pos = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          (col("q_label") <=> col("c_label")))
      .withColumn("cosine", dot(col("qu"), col("cu")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("positive_id"),
        col("cosine").as("pos_cosine"))
    val neg = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          !(col("q_label") <=> col("c_label")))
      .withColumn("cosine", dot(col("qu"), col("cu")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= negK)
      .select(col("query_id"), col("neighbor_id").as("negative_id"),
        col("rank").cast("long").as("neg_rank"),
        col("cosine").as("neg_cosine"))
    pos.join(neg, Seq("query_id"))
      .select("query_id", "positive_id", "negative_id", "neg_rank",
        "pos_cosine", "neg_cosine")
  }

  // ------------------------------------------------- product quantization

  /** Product-quantization codebooks (Jégou et al. 2011, the faiss PQ
    * recipe): the unit-vector space is split into `m` contiguous subspaces
    * of d/m dims each; every subspace gets a `ksub`-entry codebook. Entries
    * are the subvectors of `ksub` corpus vectors sampled by the portable id
    * hash — the same deterministic, engine-replayable selection as
    * [[sampleCentroids]] (one bounded driver collect; Lloyd refinement can
    * be layered with [[kmeansCentroids]] per subspace, but the sampled
    * codebook is the cross-engine-verifiable baseline).
    * Returns codebooks(j)(i) = centroid i of subspace j. */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && ksub >= 1, s"bad PQ params m=$m ksub=$ksub")
    val unit = unitVectors(corpus, idCol, vecCol, "id", "v")
    val sample = sampleCentroids(unit, "id", "v", ksub, seed)
    require(sample.nonEmpty, "PQ needs a non-empty corpus")
    val d = sample.head.size
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    (0 until m).map(j => sample.map(_.slice(j * dsub, (j + 1) * dsub)))
  }

  /** LLOYD-REFINED PQ codebooks — faiss trains per-subspace k-means where
    * [[pqCodebooks]] stops at the hash sample; this runs `rounds` Lloyd
    * iterations over every subspace AT ONCE and keeps the whole thing a pure
    * function of (data, seed, rounds), so the DuckDB oracle replays each
    * round bit-for-bit (the [[kmeansCentroids]] playbook, minus its
    * spherical normalization — subspace centroids are plain L2 means, as in
    * faiss):
    *
    *  - assignment = the SAME argmin-L2 (−dist², −index) struct-max as
    *    [[pqEncode]] — training and encoding can never disagree on ties;
    *  - update = fixed-point component mean: floor(x·2⁴⁰ + 0.5) summed as
    *    exact DECIMAL (order-independent), one double division per
    *    component — never an IEEE partition-order sum;
    *  - a cell that loses all members KEEPS its previous centroid
    *    (deterministic, codebook width never shrinks — unlike spherical
    *    k-means' compaction, a PQ codebook must keep its 2^bits slots).
    *
    * Scale shape per round: ONE distributed pass — encode (narrow map over
    * literal codebooks), posexplode to (subspace, cell, component) partial
    * sums that map-side-combine down to m·ksub·dsub rows (= d·ksub, KBs),
    * and a bounded collect of exactly those rows back into plan literals. */
  def pqCodebooksKmeans(corpus: DataFrame, m: Int, ksub: Int, rounds: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && ksub >= 1, s"bad PQ params m=$m ksub=$ksub")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val unit =
      if (rounds >= 1) persistForRounds(unitVectors(corpus, idCol, vecCol, "id", "v"))
      else unitVectors(corpus, idCol, vecCol, "id", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sample = sampleCentroids(unit, "id", "v", ksub, seed)
      require(sample.nonEmpty, "PQ needs a non-empty corpus")
      val d = sample.head.size
      require(d % m == 0, s"dim $d not divisible into $m subspaces")
      val dsub = d / m
      var books: Seq[Seq[Seq[Double]]] =
        (0 until m).map(j => sample.map(_.slice(j * dsub, (j + 1) * dsub)))
      for (_ <- 0 until rounds) {
        val sums = unit
          .select(col("v"), pqCodes(col("v"), books).as("codes"))
          .select(posexplode(col("v")), col("codes"))
          // pos is a 0-based int; `div` keeps the subspace index integral
          .select(expr("CAST(pos div " + dsub + " AS INT)").as("j"),
            pmod(col("pos"), lit(dsub)).as("spos"), col("codes"), col("col"))
          .select(col("j"), element_at(col("codes"), col("j") + 1).as("cell"),
            col("spos"),
            floor(col("col") * lit(FixedPointScale.toDouble) + lit(0.5))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("fx"))
          .groupBy("j", "cell", "spos")
          .agg(sum(col("fx")).as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1).toInt, r.getInt(2)) ->
            (r.getDecimal(3), r.getLong(4)))
          .toMap
        books = books.zipWithIndex.map { case (book, j) =>
          book.zipWithIndex.map { case (prev, i) =>
            if (sums.contains((j, i, 0))) {
              (0 until dsub).map { p =>
                val (s, n) = sums((j, i, p))
                // exact integer → nearest double, then the same two double
                // divisions as the SQL mirror: (s / n) / S
                s.doubleValue() / n.toDouble / FixedPointScale.toDouble
              }
            } else prev // empty cell: keep the slot (faiss semantics)
          }
        }
      }
      books
    } finally { unit.unpersist(); () }
  }

  /** PQ encoding: vector → `m` int8-range codes, code j = argmin-L2 codebook
    * entry for subvector j (ties → smaller centroid index, spelled as an
    * array_max over (−dist², −i) structs so every engine picks the same
    * entry). A pure narrow map over literal centroids — m·log₂(ksub) BITS
    * per vector of index payload (8 bytes here vs 512 for the raw doubles):
    * the memory step beyond [[quantize]]'s 4× that makes billion-vector
    * corpora fit executor memory. Output: (outId, codes array<long>). */
  def pqEncode(emb: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding",
      outId: String = "vec_id"): DataFrame =
    unitVectors(emb, idCol, vecCol, outId, "v")
      .select(col(outId), pqCodes(col("v"), codebooks).as("codes"))

  /** The [[pqEncode]] code array for a unit-vector column: per subspace,
    * argmin-L2 codebook entry (ties → smaller index via the (−dist², −i)
    * struct max). */
  private def pqCodes(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = codebooks.head.head.size
    array(codebooks.zipWithIndex.map { case (book, j) =>
      val sub = slice(v, j * dsub + 1, dsub)
      val best = array_max(array(book.zipWithIndex.map { case (c, i) =>
        val diff = zip_with(sub, typedLit(c), (a, b) => a - b)
        struct((-dot(diff, diff)).as("s"), lit(-i).as("c"))
      }: _*))
      (-best.getField("c")).cast("long")
    }: _*)
  }

  /** Per-query ADC lookup table: flattened m·ksub subspace inner products
    * (index j·ksub + i). */
  private def pqLut(qv: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = codebooks.head.head.size
    array(codebooks.zipWithIndex.flatMap { case (book, j) =>
      val sub = slice(qv, j * dsub + 1, dsub)
      book.map(cent => dot(sub, typedLit(cent)))
    }: _*)
  }

  /** The statically-unrolled ADC sum: m `element_at` lookups added in
    * subspace order — no interpreted lambda in the pair loop. */
  private def pqAdc(lut: Column, codes: Column, m: Int, nsub: Int): Column =
    (0 until m).map { j =>
      element_at(lut, (lit(j * nsub) + element_at(codes, j + 1)).cast("int") + lit(1))
    }.reduce(_ + _)

  /** PQ top-k with ADC (asymmetric distance computation) scoring — the
    * compressed-domain search over [[pqEncode]]d codes: each query
    * precomputes ONE m·ksub lookup table of subspace inner products (a
    * narrow map on the tiny broadcast query side), and a candidate's score
    * is m table lookups summed — `adc ≈ ⟨q, reconstruction(x)⟩` — with no
    * per-pair vector arithmetic at all. The static lookup-sum unrolls to m
    * `element_at` adds (codegen-friendly, no interpreted lambda in the
    * pair loop; the round-10 lesson). Corpus codes are persisted: the
    * cached relation is the m-byte-per-vector one.
    * Output: (query_id, neighbor_id, rank, adc) — `adc` is the approximate
    * inner product, exact to quantization error. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", seed: Long = 42): DataFrame =
    pqTopKWith(queries, corpus, k,
      pqCodebooks(corpus, m, ksub, idCol, vecCol, seed), idCol, vecCol)

  /** [[pqTopK]] with CALLER-SUPPLIED codebooks — the composition point for
    * [[pqCodebooksKmeans]] (Lloyd-refined books) or externally-trained
    * ones; the search plan is identical, only the literals change. */
  def pqTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      books: Seq[Seq[Seq[Double]]], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val nsub = books.head.size // actual codebook width (≤ ksub on tiny corpora)
    val c = pqEncode(corpus, books, idCol, vecCol, "neighbor_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qv")
      .select(col("query_id"), pqLut(col("qv"), books).as("lut"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", pqAdc(col("lut"), col("codes"), books.size, nsub))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc")
  }

  /** IVF-PQ — the canonical billion-scale composition (faiss IndexIVFPQ,
    * Jégou et al. 2011): the IVF cell structure prunes candidates to
    * `nProbe` of `nLists` cells, and PQ-ADC scores what remains — so a
    * query touches ~nProbe/nLists of an m-byte-per-vector corpus with m
    * table lookups per candidate. Cells AND codebooks derive from the SAME
    * deterministic hash sample machinery ([[sampleCentroids]]); codes here
    * quantize the raw unit vector (not the faiss residual — the
    * cross-engine-replayable baseline; residual encoding would change only
    * [[pqCodes]]' input).
    *
    * Scale shape: ONE persisted corpus relation of (id, cell, codes) — the
    * m-byte index, built in a single narrow pass over the unit vectors
    * (which are persisted only to share the centroid-sample collect, as in
    * [[ivfTopK]]); the probe is an equi-join on cell; the ADC sum is the
    * unrolled lookup add. Output: (query_id, neighbor_id, rank, adc). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1 && nProbe <= nLists,
      s"nProbe must be in [1, $nLists], got $nProbe")
    val cu = unitVectors(corpus, idCol, vecCol, "neighbor_id", "cu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = sampleCentroids(cu, "neighbor_id", "cu", nLists, seed)
    val sample = sampleCentroids(cu, "neighbor_id", "cu", ksub, seed)
    val d = sample.head.size
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    val books = (0 until m).map(j => sample.map(_.slice(j * dsub, (j + 1) * dsub)))
    val nsub = books.head.size
    val index = cu.select(col("neighbor_id"),
        array_max(cellScores(col("cu"), centroids)).getField("c").as("cell"),
        pqCodes(col("cu"), books).as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("lut", pqLut(col("qv"), books))
      .withColumn("cell", explode(slice(
        transform(reverse(array_sort(cellScores(col("qv"), centroids))),
          x => x.getField("c")), 1, nProbe)))
      .select("query_id", "cell", "lut")
    val scored = q.join(index, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", pqAdc(col("lut"), col("codes"), m, nsub))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc")
  }

  /** RESIDUAL IVF-PQ — the full faiss IndexIVFPQ semantics: codes quantize
    * the residual r = x − centroid(cell) instead of the raw vector, so the
    * codebook spends its 2^bits resolution on the (much smaller) within-cell
    * displacement rather than re-describing the cell position. ADC becomes
    * ⟨q, centroid(cell)⟩ + Σ_j lut_r[j, code_j] — the cell term is ONE
    * lookup into a per-query array of centroid dots, the residual term the
    * same m unrolled lookups as [[ivfPqTopK]]; still no per-pair vector
    * arithmetic. The residual codebook is a deterministic hash sample OF
    * THE RESIDUALS under a shifted seed (the unshifted sample would pick
    * the centroid rows themselves, whose residuals are identically zero).
    * Output: (query_id, neighbor_id, rank, adc). */
  def ivfPqTopKResidual(queries: DataFrame, corpus: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1 && nProbe <= nLists,
      s"nProbe must be in [1, $nLists], got $nProbe")
    val cu = unitVectors(corpus, idCol, vecCol, "neighbor_id", "cu")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = sampleCentroids(cu, "neighbor_id", "cu", nLists, seed)
    val cent2d = typedLit(centroids)
    val resRel = cu
      .withColumn("cell",
        array_max(cellScores(col("cu"), centroids)).getField("c"))
      .withColumn("res", zip_with(col("cu"),
        element_at(cent2d, col("cell") + 1), (a, b) => a - b))
      .select(col("neighbor_id"), col("cell"), col("res"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sample = sampleCentroids(resRel, "neighbor_id", "res", ksub, seed + 7919)
    val d = sample.head.size
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    val books = (0 until m).map(j => sample.map(_.slice(j * dsub, (j + 1) * dsub)))
    val nsub = books.head.size
    val index = resRel.select(col("neighbor_id"), col("cell"),
        pqCodes(col("res"), books).as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = unitVectors(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("lut", pqLut(col("qv"), books))
      .withColumn("cell_dots",
        array(centroids.map(c => dot(col("qv"), typedLit(c))): _*))
      .withColumn("cell", explode(slice(
        transform(reverse(array_sort(cellScores(col("qv"), centroids))),
          x => x.getField("c")), 1, nProbe)))
      .select("query_id", "cell", "lut", "cell_dots")
    val scored = q.join(index, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", element_at(col("cell_dots"), col("cell") + 1) +
        pqAdc(col("lut"), col("codes"), m, nsub))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc")
  }

  /** Johnson–Lindenstrauss-style dimensionality reduction: project each
    * embedding onto `k` seeded pseudo-random Gaussian directions (the same
    * generator as [[lshBucketedPairs]]'s hyperplanes, kept full-precision
    * instead of sign-collapsed). A pure narrow map — no shuffle, no fitted
    * model to ship — that shrinks the vector payload (e.g. 64 → 8 dims)
    * before clustering or ANN over 100 TB of embeddings; inner products are
    * preserved in expectation (scale by 1/k for an unbiased estimate), and
    * the projection is reproducible on every engine (seeded generator +
    * left-fold dot product). `dim` ≤ 0 derives the input dimensionality with
    * a one-row action (pass it explicitly for streaming inputs).
    * Output: (idCol, pos, proj) — one exploded row per reduced dimension,
    * `pos` 0-based. */
  def randomProjection(emb: DataFrame, k: Int, dim: Int = 0, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // derive dim from the first NON-NULL vector (a leading null row would
    // otherwise NPE here — same rule as lshBucketedPairs' derivation)
    val resolvedDim =
      if (dim > 0) dim
      else emb.filter(col(vecCol).isNotNull)
        .select(size(toDoubleVec(col(vecCol))).as("d")).head(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
    val planes = hyperplanes(k, resolvedDim, seed)
    val dv = toDoubleVec(col(vecCol))
    val projected = array(planes.map(p => dot(dv, typedLit(p))): _*)
    // null vectors contribute no rows (not k null projections) — the same
    // skip rule as unitVectors
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), posexplode(projected))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col").as("proj"))
  }

  /** Deterministic pseudo-random unit hyperplanes (seeded), built at
    * plan-construction time and shipped as a literal — reproducible across
    * runs and executors (and embeddable verbatim in the DuckDB oracle SQL,
    * which is how sim_lsh_pairs gets an exact mirror). */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the projection). */
  // ------------------------------------------------------------------ PCA

  /** Deterministic PCA fit — the embedding whitening / dimensionality-
    * reduction step of curation pipelines (SemDeDup clusters PCA-reduced
    * embeddings; OPQ rotates by principal axes before PQ). Returns
    * (mean, k components), each component a unit d-vector, learned by:
    *
    *  1. fixed-point mean sums: Σ floor(xᵢ·2²⁰) as longs — order-
    *     independent, so the mean is bit-identical on any partitioning or
    *     engine (the [[kmeansCentroids]] discipline);
    *  2. fixed-point upper-triangle covariance sums of the CENTERED
    *     products: Σ floor((xⱼ−μⱼ)(xₖ−μₖ)·2²⁰) — one map-side-combined
    *     groupBy on (j,k); the shuffle moves ≤ d²/2·partitions cells,
    *     never vectors;
    *  3. driver power iteration with deflation on the d×d matrix (bounded
    *     collect: d(d+1)/2 cells, the Lloyd-sums precedent), every fold
    *     LEFT-ASSOCIATED FROM 0.0 in index order so the DuckDB oracle
    *     replays the doubles bit-for-bit (`list_prepend(0.0, …)` +
    *     `list_reduce`), iteration count FIXED — both engines run the same
    *     `iters` rounds whether or not converged, so equality never
    *     depends on a convergence test.
    *
    * The d² explode in pass 2 is the portable baseline (d ≤ a few hundred);
    * the covariance cost d²·n multiplications is inherent, but a production
    * path for large d would accumulate per-partition Gram matrices in an
    * Aggregator buffer instead of materializing exploded rows. */
  def pcaFit(emb: DataFrame, vecCol: String, k: Int,
      iters: Int = 30): (Array[Double], Array[Array[Double]]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val S = Sampling.FixedPointScale // 2^20
    val x = emb.select(col(vecCol).cast("array<double>").as("x"))
      .filter(col("x").isNotNull)
    val d = x.select(size(col("x"))).first().getInt(0)
    val xd = x.filter(size(col("x")) === d)
    // pass 1: mean
    val meanRows = xd
      .select(posexplode(col("x")).as(Seq("j0", "xj")))
      .groupBy("j0")
      .agg(sum(floor(col("xj") * S).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val n = meanRows.head.getLong(2)
    val mu = new Array[Double](d)
    meanRows.foreach(r => mu(r.getInt(0)) = r.getLong(1).toDouble / (n.toDouble * S))
    // pass 2: centered upper-triangle covariance (0-based j <= k here;
    // the oracle replays 1-based)
    val muLit = lit(mu)
    val cells = xd
      .select(posexplode(col("x")).as(Seq("j0", "xj")), col("x"))
      // k runs j..d-1 via a slice starting at element j (1-based pos j0+1)
      .select(col("j0"), col("xj"),
        posexplode(slice(col("x"), col("j0") + 1, lit(d) - col("j0")))
          .as(Seq("krel", "xk")))
      .select(col("j0"), (col("j0") + col("krel")).cast("int").as("k0"),
        floor((col("xj") - element_at(muLit, col("j0") + 1)) *
          (col("xk") - element_at(muLit, col("j0") + col("krel") + 1)) *
          S).cast("long").as("fp"))
      .groupBy("j0", "k0").agg(sum(col("fp")).as("s"))
      .collect()
    val m = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val j = r.getInt(0); val kk = r.getInt(1)
      val c = r.getLong(2).toDouble / (n.toDouble * S)
      m(j)(kk) = c; m(kk)(j) = c
    }
    // driver power iteration with deflation — every reduction is a
    // foldLeft from 0.0 in index order (== list_prepend(0.0,…)+list_reduce)
    def matvec(mm: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(d)(j =>
        (0 until d).foldLeft(0.0)((acc, i) => acc + mm(j)(i) * v(i)))
    def l2(v: Array[Double]): Double =
      math.sqrt((0 until d).foldLeft(0.0)((acc, i) => acc + v(i) * v(i)))
    val comps = new Array[Array[Double]](k)
    var cur = m.map(_.clone())
    for (c <- 0 until k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 0 until iters) {
        val w = matvec(cur, v)
        val nw = l2(w)
        v = w.map(_ / nw)
      }
      val mv = matvec(cur, v)
      val lambda = (0 until d).foldLeft(0.0)((acc, i) => acc + v(i) * mv(i))
      comps(c) = v
      // deflate: cur -= λ v vᵀ (left-assoc product order mirrored in SQL)
      val next = Array.tabulate(d, d)((j, i) => cur(j)(i) - lambda * v(j) * v(i))
      cur = next
    }
    (mu, comps)
  }

  /** Project embeddings onto [[pcaFit]]'s components: (idCol, p1..pk), each
    * pᶜ = Σᵢ (xᵢ−μᵢ)·vᶜᵢ as a 0.0-seeded index-order fold — a narrow
    * codegen'd map over the corpus (mean and components ride as literals;
    * nothing shuffles, nothing collects). */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
      mean: Array[Double], comps: Array[Array[Double]]): DataFrame = {
    val d = mean.length
    val x = col(vecCol).cast("array<double>")
    val muLit = lit(mean)
    val projCols = comps.zipWithIndex.map { case (v, c) =>
      aggregate(sequence(lit(1), lit(d)), lit(0.0),
        (acc, i) => acc + (element_at(x, i) - element_at(muLit, i)) *
          element_at(lit(v), i)).as(s"p${c + 1}")
    }
    emb.filter(x.isNotNull && size(x) === d)
      .select(col(idCol) +: projCols.toSeq: _*)
  }

  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Candidate pairs that share at least one of `tables` independent LSH
    * bucketings, verified with exact cosine ≥ threshold. Equi-join on
    * (table, bucket) — never enumerates the O(n²) pair space. */
  def lshBucketedPairs(emb: DataFrame, threshold: Double, nPlanes: Int = 12,
      tables: Int = 4, seed: Long = 42, dim: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // persisted: feeds both sides of the bucket self-join (and carries the
    // unit vectors into verification) — avoids recomputing the projections
    val v = unitVectors(emb, idCol, vecCol, "id", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // hyperplane dimensionality must match the data or DotProduct's length
    // check fires; dim <= 0 derives it with a one-row batch action (pass dim
    // explicitly for streaming inputs / to keep plan construction lazy)
    val resolvedDim =
      if (dim > 0) dim
      else {
        val firstDim = v.select(size(col("v")).as("d")).head(1)
        if (firstDim.isEmpty) {
          v.unpersist()
          return v.select(col("id").as("id_a"), col("id").as("id_b"),
            lit(0.0).as("cosine")).limit(0)
        }
        firstDim.head.getInt(0)
      }
    val bucketStructs = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(col("v"), hyperplanes(nPlanes, resolvedDim, seed + t)).as("bucket"))
    }
    val banded = v.select(col("id"), col("v"), explode(array(bucketStructs: _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.tbl"), col("bb.bucket"))
    val l = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = banded.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    // score and threshold-filter BEFORE the dedup exchange: the r17 shape
    // deduplicated first, so the (id_a, id_b) shuffle carried BOTH unit
    // vectors (~1 KB/pair — 163 MB at bench scale, the query's entire
    // shuffle volume); scoring first costs one extra deterministic dot per
    // extra table collision and the exchange then moves 24 bytes/pair of
    // survivors (guide §2.3 "shuffle keys and metadata instead of
    // payloads"). The deduplicated result is identical: a pair's cosine is
    // the same in every colliding table.
    l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .dropDuplicates("id_a", "id_b")
  }

  /** Cross-TABLE semantic join by LSH buckets — fuzzy entity matching /
    * RAG-corpus alignment between two different relations: both sides are
    * bucketed with the SAME seeded hyperplanes, candidates meet in an
    * equi-join on (table, bucket), and the exact cosine verifies each
    * candidate against `threshold`. The two-relation generalization of
    * [[lshBucketedPairs]] (which is the self-join special case): no
    * cross-product ever forms — candidate volume is the bucket-collision
    * count, recall is the standard 1−(1−(1−θ/π)^nPlanes)^tables hyperplane
    * bound. A pair colliding in several tables is deduplicated BEFORE the
    * cosine verify.
    *
    * Scale shape: each side explodes to `tables` rows, shuffles once on
    * (tbl, bucket); the verify is one codegen'd dot per surviving
    * candidate. Left side is persisted only when `dim` must be derived.
    * Output: (left_id, right_id, cosine). */
  def lshJoin(left: DataFrame, right: DataFrame, threshold: Double,
      nPlanes: Int = 12, tables: Int = 4, seed: Long = 42, dim: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l0 = unitVectors(left, idCol, vecCol, "left_id", "vl")
    val r = unitVectors(right, idCol, vecCol, "right_id", "vr")
    // the dim probe is an ACTION on the left unit-vector chain; without the
    // persist the O(d²) normalize chain would be evaluated once for the
    // probe and AGAIN in the join — the computed-input re-evaluation class
    // the sim_topk_q8 fix targets. Persisted only when dim must be derived
    // (with explicit dim the chain feeds exactly one consumer).
    val l = if (dim > 0) l0 else l0.persist(StorageLevel.MEMORY_AND_DISK)
    val resolvedDim =
      if (dim > 0) dim
      else l.select(size(col("vl")).as("d")).head(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
    if (resolvedDim == 0) {
      if (dim <= 0) l.unpersist()
      return l0.select(col("left_id"), col("left_id").as("right_id"),
        lit(0.0).as("cosine")).limit(0)
    }
    def banded(v: DataFrame, vec: String) = {
      val bucketStructs = (0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          lshBucket(col(vec), hyperplanes(nPlanes, resolvedDim, seed + t)).as("bucket"))
      }
      v.select(col("*"), explode(array(bucketStructs: _*)).as("bb"))
        .select(v.columns.map(col) :+ col("bb.tbl") :+ col("bb.bucket"): _*)
    }
    // score + threshold before the dedup exchange — same rationale and same
    // result set as [[lshBucketedPairs]] (the dedup then shuffles 24-byte
    // survivor rows, not vector payloads)
    banded(l, "vl").join(banded(r, "vr"), Seq("tbl", "bucket"))
      .withColumn("cosine", dot(col("vl"), col("vr")))
      .filter(col("cosine") >= threshold)
      .select("left_id", "right_id", "cosine")
      .dropDuplicates("left_id", "right_id")
  }
}
