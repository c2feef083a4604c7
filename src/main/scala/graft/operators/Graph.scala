package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge relations. First resident: weighted
  * PageRank — the standard authority/centrality weight for source- or
  * domain-level quality scoring of a crawl corpus (Page et al. 1999; the
  * damping recursion here is the classic power iteration).
  *
  * Everything is FIXED-POINT INTEGER arithmetic so a run is bit-reproducible
  * on any engine, any partitioning, any cluster size: long sums are exact and
  * associative where double sums are not, and the per-edge floor division is
  * deterministic. The DuckDB oracle replays all `iters` rounds exactly
  * (SparkEntry's unrolled CTE chain).
  */
object Graph {

  /** Weighted PageRank over `edges(src, dst, w)` (long node ids, positive
    * long weights; parallel edges should be pre-aggregated into `w`).
    * Returns `(node, rank_fp)` with rank in units of `1/scale` — initial
    * rank = `scale` (i.e. 1.0) per node, so ranks sum to ≈ N·scale.
    *
    * Per iteration, with out(u) = Σ w over u's out-edges:
    *   contrib(v) = Σ_{(u,v,w)} (r(u)·w) div out(u)
    *   dangling   = Σ r(u) over nodes with no out-edge
    *   r'(v)      = base + (dampNum·(contrib(v) + dangling div N)) div dampDen
    * where base = ((dampDen−dampNum)·scale) div dampDen. All operands are
    * non-negative longs, so `div` == floor division on every engine.
    *
    * Overflow budget: r(u) ≤ ≈ N·scale, so N·scale·w_max must stay below
    * 2⁶³ — at the default 2²⁰ scale that is N·w_max < 2⁴³ (e.g. one billion
    * nodes with million-fold edge weights). Shrink `scale` for bigger
    * graphs; precision degrades gracefully (ranks quantize coarser).
    *
    * Scale shape: the edge relation — the only big thing — is joined to its
    * out-degree once, repartitioned by `src` and PERSISTED, so each
    * iteration shuffles only the node-sized rank relation into the join and
    * the node-sized contribution aggregate out of it. Ranks are eagerly
    * materialized per iteration via [[Lineage.materialize]]: the lineage
    * (and Catalyst analysis cost) stays O(1) instead of growing by a
    * join+agg per round, and with a checkpoint dir configured each
    * generation is a RELIABLE checkpoint that survives executor loss (the
    * contract to rely on for deep iterations on preemptible clusters; the
    * localCheckpoint fallback is local-mode/test-only). The one driver-side
    * scalar is N (a single count, any-scale safe). */
  /** Per-key consecutive-transition edges: order each key's rows by
    * `orderCols`, emit one `(node_i → node_{i+1})` edge per adjacent pair,
    * aggregated to `(src, dst, w)` multiplicities — the interaction-log →
    * transition-graph extraction feeding [[pageRank]]. One window pass over
    * the log (shuffle on the key), then the map-side-combined edge count;
    * the output is graph-sized, not log-sized. */
  def transitionEdges(df: DataFrame, keyCol: String, orderCols: Seq[String],
      nodeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    df.withColumn("__dst", lead(col(nodeCol), 1).over(w))
      .where(col("__dst").isNotNull)
      .groupBy(col(nodeCol).as("src"), col("__dst").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1L << 20,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampDen >= 1 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= num <= den, got $dampNum/$dampDen")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    // MATERIALIZE the input edge relation first (localCheckpoint leaf, not
    // a persist): nodes (2 passes), the out-weight aggregate and the eo
    // build each re-executed the caller's whole edge-derivation chain
    // (events scan + JSON extraction + transition window for the bench
    // queries) — ~2.5 s of graph_pagerank's 4.3 s wall (r18 profile). A
    // plain .persist pins the cache at the session's 32-partition layout
    // and every downstream stage inherits that width (measured: task count
    // 156 → 340, summed task time 2.6 → 20 s — trivial-task inflation); the
    // checkpointed leaf instead keeps the AQE-coalesced width of its final
    // stage, which is size-appropriate at every scale.
    val edgesP = Lineage.materialize(edges)
    val nodes = edgesP.select(col("src").as("node"))
      .unionByName(edgesP.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    // all round relations (ranks, contributions, the dangling probe) are
    // node-scale: run the rounds at a node-count-derived partition count
    // (see Lineage.withLoopPartitions — session setting stays the upper
    // bound; a tiny graph stops paying 32-partition exchanges × rounds)
    val spk = edges.sparkSession
    val sessionP = Lineage.effectiveShufflePartitions(spk)
    val loopP = Lineage.loopPartitions(spk, n)
    Lineage.withLoopConf(spk, loopP) {
      // re-anchor the node relation AT the loop partitioning: the outer
      // persist was laid out at the session partition count, and a cached
      // layout pins every downstream stage's task count — rounds would
      // keep paying session-partition stages regardless of the loop conf.
      // Skipped when the clamp lands on the session setting (production-
      // scale graphs): the reshuffle would move everything for nothing
      val nodesL =
        if (loopP == sessionP) nodes
        else nodes.repartition(col("node")).persist(StorageLevel.MEMORY_AND_DISK)
      val outw = edgesP.groupBy("src").agg(sum("w").as("outw"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val eo = edgesP.join(outw, "src").repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val base = (dampDen - dampNum) * scale / dampDen
      // dangling handling without a per-round job: the flag "node has no
      // out-edge" is STATIC, so it rides every rank generation as a column,
      // and the round's dangling mass Σ r(u) over flagged nodes is observed
      // DURING the rank materialization (exact long sum — the identical
      // value the r17 anti-join + 1-row broadcast computed, minus one
      // broadcast-build job and one anti-join exchange per round). Round 1
      // needs only the flagged-node COUNT: every initial rank is `scale`.
      val flagged = nodesL.join(
          outw.select(col("src").as("node"), lit(true).as("__has_out")),
          Seq("node"), "left")
        .select(col("node"), col("__has_out").isNull.as("__dangling"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nDang = flagged.filter(col("__dangling")).count()
      var dang = nDang * scale
      var r = flagged.select(col("node"), col("__dangling"), lit(scale).as("r"))
      for (_ <- 1 to iters) {
        val contrib = eo.join(
            r.select(col("node").as("src"), col("r")), Seq("src"))
          .select(col("dst").as("node"), expr("(r * w) div outw").as("__c"))
          .groupBy("node").agg(sum("__c").as("__c"))
        val (rNext, obs) = Lineage.materializeObserved(
          flagged.join(contrib, Seq("node"), "left")
            .select(col("node"), col("__dangling"),
              (lit(base) + expr(s"($dampNum * (coalesce(__c, 0L) + " +
                s"(${dang}L div ${n}L))) div $dampDen")).as("r")),
          coalesce(sum(when(col("__dangling"), col("r"))), lit(0L)).as("__dang"))
        r = rNext
        dang = obs("__dang").asInstanceOf[Long]
      }
      nodes.unpersist()
      if (!(nodesL eq nodes)) nodesL.unpersist()
      flagged.unpersist(); outw.unpersist(); eo.unpersist()
      r.select(col("node"), col("r").as("rank_fp"))
    }
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007) over
    * the undirected weighted graph induced by `edges(src, dst, w)` —
    * `(node, community)` after exactly `iters` rounds. Communities are the
    * mid-resolution grouping between [[Dedup.connectedComponents]] (too
    * coarse: one bridge merges everything) and per-node signals: domain
    * families, template clusters, topic pockets in a crawl graph.
    *
    * Made DETERMINISTIC — classic LPA is famously order-dependent — by (a)
    * synchronous rounds (every node updates from the PREVIOUS round's
    * labels, no in-round drift), and (b) a total tie-break: the new label
    * is the neighbor label with the largest incident weight sum, ties to
    * the SMALLEST label, taken as one lexicographic `min(struct(-w, l))` —
    * exact long arithmetic, so any partitioning, any engine, any cluster
    * size produces the identical labeling (the DuckDB oracle replays all
    * rounds). Self-loops are dropped (a self-vote would freeze every node).
    *
    * Scale shape, same discipline as [[pageRank]]: the symmetrized edge
    * relation is aggregated, repartitioned by `src`, and persisted ONCE;
    * each round shuffles only the node-sized label relation into that join
    * and the (node, label)-sized partial aggregate out — map-side combine
    * collapses the per-partition (dst, label) weight sums below both
    * exchanges. Labels are eagerly materialized per round via
    * [[Lineage.materialize]] so lineage and Catalyst analysis stay O(1)
    * across rounds, and so a configured checkpoint dir upgrades every
    * generation to a reliable, executor-loss-surviving checkpoint. */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val symPre = edges.select(col("src"), col("dst"), col("w"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // rounds run at an edge-count-derived partition count (the loop state is
    // graph-sized; see Lineage.withLoopPartitions) — the count doubles as
    // the eager materialization of the persisted edge relation
    val ne = symPre.count()
    val spk = edges.sparkSession
    val sessionP = Lineage.effectiveShufflePartitions(spk)
    val loopP = Lineage.loopPartitions(spk, ne)
    Lineage.withLoopConf(spk, loopP) {
      val sym =
        if (loopP == sessionP) symPre
        else Lineage.materialize(symPre.repartition(col("src")))
      if (!(sym eq symPre)) symPre.unpersist()
      var lab = sym.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to iters) {
        lab = Lineage.materialize(
          sym.join(lab.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node"), col("label"))
            .agg(sum("w").as("__wsum"))
            .groupBy("node")
            .agg(min(struct((-col("__wsum")).as("nw"), col("label").as("l"))).as("__m"))
            .select(col("node"), col("__m.l").as("label")))
      }
      if (sym eq symPre) symPre.unpersist()
      lab.select(col("node"), col("label").as("community"))
    }
  }

  /** Deterministic NEGATIVE-edge sampling — the training-data counterpart
    * of the graph itself: link-prediction / contrastive retrieval models
    * train on (edge, non-edge) pairs, and at corpus scale the non-edges
    * must be drawn reproducibly, evenly, and WITHOUT materializing the
    * quadratic complement. For each node u and slot i ∈ [1, k], the
    * candidate is the node sitting `i` positions after u in a seeded
    * pseudo-random permutation ([[Sampling.shuffleOrder]] — shard by one
    * portable hash, order by an independent second one), true edges and
    * self-pairs anti-joined away. Same seed ⇒ same negatives on any
    * engine, run, or partitioning; different seeds ⇒ independent draws.
    *
    * Yield note: a node emits UP TO k negatives — a slot dies when its
    * candidate happens to be a true neighbor or the node itself (rare on
    * sparse graphs: P ≈ deg/|V| per slot). Callers needing exactly k
    * oversample (k′ = k + slack) and rank — the standard trade against a
    * retry loop, which a declarative plan can't express cheaply.
    *
    * Scale shape: everything is node-relation-sized — one exchange for the
    * permutation (per-shard running row_number, no global sort), a
    * broadcast of the shard-count relation, one keyed self-join on
    * (shard, pos), and the anti-join on the (src, dst) edge key. The k-way
    * explode multiplies the NODE relation, never the edges. */
  def negativeEdges(edges: DataFrame, k: Int, numShards: Int = 8,
      seed: Long = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // materialized leaf (see pageRank): the node set and the undirected
    // anti-join relation each read the edges twice — 4 executions of the
    // caller's edge chain otherwise; a persist would pin session-width
    // task counts on every consumer (measured, pageRank note).
    val edgesP = Lineage.materialize(edges)
    val nodes = edgesP.select(col("src").as("node"))
      .unionByName(edgesP.select(col("dst").as("node")))
      .distinct()
    val ord = Sampling.shuffleOrder(nodes, "node", numShards, seed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = ord.groupBy("shard").agg(count(lit(1)).as("__sz"))
    val und = edgesP.select(col("src"), col("dst"))
      .unionByName(edgesP.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    ord.join(broadcast(sizes), "shard")
      .select(col("node").as("src"), col("shard"), col("pos"), col("__sz"),
        explode(array((1 to k).map(lit): _*)).as("slot"))
      .select(col("src"), col("shard"), col("slot"),
        pmod(col("pos") + col("slot"), col("__sz")).as("__tpos"))
      .join(ord.select(col("shard"), col("pos").as("__tpos"),
        col("node").as("neg_dst")), Seq("shard", "__tpos"))
      .where(col("src") =!= col("neg_dst"))
      .join(und.withColumnRenamed("dst", "neg_dst"),
        Seq("src", "neg_dst"), "left_anti")
      .select(col("src"), col("neg_dst"), col("slot").cast("long").as("slot"))
  }

  /** Multi-source BFS hop distances over the DIRECTED graph `edges(src,
    * dst, …)`: `(node, hops)` for every node reachable from `sources(node)`
    * within `maxHops` hops, `hops` = the minimum hop count (sources score
    * 0). The reachability primitive of the curation toolbox: "everything
    * within h link-hops of a trusted seed set" (seed-distance quality
    * tiers), or its complement, "orphans no seed can reach".
    *
    * Level-synchronous frontier expansion — the standard Pregel/BSP
    * formulation: each round joins the CURRENT frontier (nodes first
    * reached last round) against the edge relation, anti-joins everything
    * already visited, and the survivors are the next frontier at depth
    * r+1. Exact by construction (level order IS distance order), so any
    * engine replays it; the DuckDB oracle is the textbook recursive CTE
    * with a `min(d)` roll-up.
    *
    * Scale shape, same discipline as [[pageRank]]: the edge relation is
    * repartitioned by `src` and persisted ONCE; each round shuffles only
    * the frontier (node-sized, usually much smaller) into that join and
    * the deduped next frontier out. The visited set is re-materialized per
    * round via [[Lineage.materialize]] so lineage stays O(1) and a
    * configured checkpoint dir gives executor-loss-safe rounds. The only
    * driver action per round is the frontier count for early exit —
    * O(diameter) tiny jobs, the price every BSP BFS pays. */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val eoPre = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    // rounds at an edge-count-derived partition count (frontier/visited are
    // graph-sized); the count eagerly materializes the persisted edges
    val ne = eoPre.count()
    val spk = edges.sparkSession
    val sessionP = Lineage.effectiveShufflePartitions(spk)
    val loopP = Lineage.loopPartitions(spk, ne)
    Lineage.withLoopConf(spk, loopP) {
      val eo =
        if (loopP == sessionP) eoPre
        else Lineage.materialize(eoPre.repartition(col("src")))
      if (!(eo eq eoPre)) eoPre.unpersist()
      var dist = Lineage.materialize(
        sources.select(col("node")).distinct().select(col("node"), lit(0L).as("hops")))
      // the visited set is a LAZY union of the materialized frontier leaves
      // (≤ maxHops + 1 of them, each an O(1) leaf plan): re-materializing
      // the whole union every round (the r17 shape) paid one extra
      // checkpoint job per round for a relation the next round only
      // anti-joins against. The frontier-exhaustion probe rides the
      // frontier's own materialization (observe) instead of a separate
      // isEmpty job — ONE driver action per BFS round, down from three.
      var frontier = dist
      var r = 0L
      var done = maxHops == 0
      while (!done) {
        r += 1
        val (next, obs) = Lineage.materializeObserved(
          frontier.join(eo.withColumnRenamed("src", "node"), Seq("node"))
            .select(col("dst").as("node")).distinct()
            .join(dist, Seq("node"), "left_anti")
            .select(col("node"), lit(r).as("hops")),
          count(lit(1)).as("__n"))
        val exhausted = obs("__n").asInstanceOf[Long] == 0L
        if (!exhausted) {
          dist = dist.unionByName(next)
          frontier = next
        }
        if (exhausted || r >= maxHops) done = true
      }
      if (eo eq eoPre) eoPre.unpersist()
      dist
    }
  }

  /** Truncated k-core peeling over the undirected simple graph induced by
    * `edges(src, dst, …)` (self-loops dropped, direction/multiplicity
    * collapsed): repeatedly delete every node whose degree WITHIN the
    * surviving set is < `k`, for up to `maxRounds` rounds or until a round
    * deletes nothing. Returns `(node, core_deg)` for the survivors with
    * their within-core degree (≥ k at fixpoint). The k-core is the classic
    * "dense backbone" extractor — link-farm and mirror-family cores in a
    * crawl host graph sit in high k-cores while honest long-tail pages
    * peel away in the first rounds (Seidman 1983's degeneracy peeling).
    *
    * Semantics are deliberately TRUNCATED at `maxRounds`: both engines
    * compute exactly `min(fixpoint, maxRounds)` rounds, so the DuckDB
    * oracle can unroll `maxRounds` chained CTEs (peeling is idempotent
    * after the fixpoint, so oracle rounds past Spark's early exit are
    * no-ops). On real graphs the fixpoint lands in a few rounds; pick
    * `maxRounds` ≥ the expected peel depth and check the returned degrees
    * (all ≥ k ⇔ converged).
    *
    * Scale shape: the symmetrized edge relation is aggregated and persisted
    * once; each round is one degree aggregation over the alive-restricted
    * edges (two semi-joins on the node key + one map-side-combined count)
    * — everything keyed, nothing quadratic. Alive sets are materialized
    * per round via [[Lineage.materialize]]; the per-round driver action is
    * the survivor count for the early exit, O(rounds) tiny jobs. */
  def kcore(edges: DataFrame, k: Long, maxRounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    def aliveDeg(alive: DataFrame): DataFrame =
      sym.join(alive.withColumnRenamed("node", "src"), Seq("src"))
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
    // initial alive set: survivor count observed during the materialization
    // (one job, not materialize + count)
    val (alive0, obs0) = Lineage.materializeObserved(
      sym.select(col("src").as("node")).distinct(), count(lit(1)).as("__n"))
    var alive = alive0
    var n = obs0("__n").asInstanceOf[Long]
    // peel rounds at an edge-count-derived partition count (alive sets and
    // degree aggregates are graph-sized; sym is already materialized by the
    // alive computation, so the count is a cached-relation scan)
    val ne = sym.count()
    Lineage.withLoopConf(edges.sparkSession, Lineage.loopPartitions(edges.sparkSession, ne)) {
      var rounds = 0
      var done = false
      while (!done && rounds < maxRounds) {
        rounds += 1
        // convergence probe fused into the round's own materialization
        val (next, obs) = Lineage.materializeObserved(
          aliveDeg(alive).where(col("core_deg") >= k).select(col("node")),
          count(lit(1)).as("__n"))
        val m = obs("__n").asInstanceOf[Long]
        if (m == n) done = true else { alive = next; n = m }
      }
    }
    // sym stays persisted under the returned (lazy) plan — blocks release
    // via the ContextCleaner once the caller drops it, the documented cache
    // lifecycle of ngramJaccardPairs/triangleCounts
    aliveDeg(alive)
  }

  /** Link-prediction scores for the NON-edges at distance 2 in the
    * undirected simple graph induced by `edges(src, dst, …)`: for every
    * unordered pair (a, b), a < b, that shares ≥ `minCommon` common
    * neighbors and is NOT itself an edge, returns
    *   - `cn`     — common-neighbor count (exact long),
    *   - `ra_fp`  — resource-allocation index Σ_z 1/deg(z) on the 10⁻⁶
    *                fixed-point grid (`Σ 1000000 div deg(z)`, exact long —
    *                Zhou et al. 2009),
    *   - `aa`     — Adamic–Adar Σ_z 1/ln(deg(z)) (Adamic & Adar 2003),
    *                a double rounded on the boundary-stable 10⁻⁴ grid by
    *                the caller's oracle discipline.
    * Every common neighbor z has ≥ 2 distinct neighbors, so deg(z) ≥ 2 and
    * ln(deg(z)) > 0 — no division guard needed.
    *
    * Scale shape: one wedge self-join keyed on the shared mid node z, then
    * one (a, b)-keyed aggregate and an anti-join against the edge
    * relation — all equi-joins. The wedge volume is Σ deg(z)², which a
    * power-law hub turns quadratic (the triangle "last reducer" curse, but
    * orientation can't save a mid-keyed wedge); `maxDeg` is the standard
    * link-prediction skew valve — mid nodes with deg > maxDeg are dropped
    * (a hub shared by half the graph carries ~zero signal anyway: its RA
    * and AA contributions vanish as 1/deg). The cap is part of the
    * operator's semantics and the oracle replays it. */
  def linkPredictionScores(edges: DataFrame, maxDeg: Long = 1L << 12,
      minCommon: Long = 1L): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = und.select(col("a").as("z"), col("b").as("nb"))
      .unionByName(und.select(col("b").as("z"), col("a").as("nb")))
    val deg = sym.groupBy("z").agg(count(lit(1)).as("deg"))
    val mids = sym.join(deg.where(col("deg") <= maxDeg), Seq("z"))
    val wedges = mids.select(col("z"), col("nb").as("a"), col("deg"))
      .join(mids.select(col("z"), col("nb").as("b")), Seq("z"))
      .where(col("a") < col("b"))
    val scored = wedges
      .groupBy("a", "b").agg(
        count(lit(1)).as("cn"),
        sum(expr("1000000L div deg")).as("ra_fp"),
        sum(lit(1.0) / log(col("deg").cast("double"))).as("aa"))
      .where(col("cn") >= minCommon)
    // und stays persisted under the returned plan (ContextCleaner lifecycle)
    scored.join(und, Seq("a", "b"), "left_anti")
  }

  /** Per-node triangle counts over the undirected simple graph induced by
    * `edges(src, dst, …)` — self-loops dropped, direction and multiplicity
    * collapsed. Returns `(node, triangles)` for every node on ≥ 1 triangle.
    * Triangles measure local clustering: spam link-farms and template/mirror
    * site families show up as dense triangle neighborhoods in a crawl's
    * host graph, which is why this rides next to [[pageRank]] in the
    * source-quality toolbox.
    *
    * Spark-first shape — the degree-oriented wedge join (the MapReduce
    * formulation of Suri & Vassilvitskii 2011, "Counting triangles and the
    * curse of the last reducer"): orient every undirected edge from its
    * lower endpoint to its higher endpoint under the total order
    * (degree, node); enumerate wedges (u→v, u→w) with v before w in that
    * same order by self-joining the oriented relation on u; a wedge closes
    * into a triangle iff the oriented edge v→w exists — exactly one closure
    * probe per triangle, because orientation makes each triangle's
    * lowest-order corner the unique wedge apex.
    *
    * Why orientation matters at 100 TB: the naive wedge count is
    * Σ deg(v)² — a power-law hub with 10⁷ neighbors contributes 10¹⁴
    * wedges to one reducer (the "curse of the last reducer"). Orientation
    * caps every out-degree at O(√m), so the wedge relation is O(m^{3/2})
    * worst case and hub-dominated rows disappear: the hot node becomes a
    * high-IN-degree endpoint, and the join keys on the wedge apex. All
    * three shuffles (degree agg, wedge join, closure join) are keyed
    * equi-joins — no cartesian anywhere. The head-degree rides the
    * oriented relation so the wedge stage needs no second degree join. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // materialized leaf: deg (2 passes) and the orientation join each
    // re-derive the undirected edge set — 3 executions of the caller's
    // edge chain otherwise (a persist would pin session-width task counts
    // on every consumer; see the pageRank note).
    val und = Lineage.materialize(
      edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b"))
        .distinct())
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, node): ties in degree break on the node id, so the
    // order is total and every engine orients identically
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("db")).otherwise(col("da")).as("dv"))
      // feeds three consumers (two wedge sides + the closure probe); persist
      // so the degree joins above run once, not three times
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.select(col("u"), col("v"), col("dv"))
      .join(oriented.select(col("u"), col("v").as("w"), col("dv").as("dw")),
        Seq("u"))
      .where(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("u"), col("v"), col("w"))
    val tris = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    val out = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    out
  }
}
