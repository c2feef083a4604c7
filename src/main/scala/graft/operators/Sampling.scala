package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: hash-Bernoulli
  * sampling, reproducible train/val/test splits, and per-key quota capping.
  *
  * All decisions derive from a portable modular hash of the row id — the same
  * row is selected on every run, on every engine (the arithmetic is chosen to
  * stay inside 63-bit range so SQL engines with checked overflow compute the
  * identical value), and adding rows never flips existing assignments. Each
  * operator is a narrow map except the quota cap (one shuffle on the key).
  */
object Sampling {

  /** Portable hash into [0, Buckets), bit-for-bit reproducible in ANSI SQL
    * (pmod spelled ((x % m) + m) % m for engines whose % keeps the dividend's
    * sign); every intermediate stays inside 63 bits so checked-overflow
    * engines agree.
    *
    * Construction: fold the id through two coprime primes, multiply the
    * (seed-shifted) residues, reduce mod a Mersenne prime, then two MINSTD
    * rounds (×48271 mod 2³¹−1) before the bucket reduction. The intermediate
    * prime reduction is essential: any PURE polynomial in the residues is
    * invariant under id strides that are multiples of Buckets (the stride
    * vanishes mod Buckets in every term), which would co-sample ids exactly
    * 9973 apart. Measured collision rates for all strides tested (1, 2, 100,
    * 9973, 1000003) are at the random level ~1/Buckets, and different seeds
    * produce statistically independent samples. */
  val Buckets = 9973L
  /** Fixed-point scale (2²⁰) for order-independent weight-mass accumulation
    * in [[importanceResample]] — mirrored verbatim by its DuckDB oracle. */
  val FixedPointScale = 1048576.0
  private val M1 = 1000003L
  private val M2 = 999983L
  private val P = 2147483647L // 2^31 − 1
  private val G = 48271L      // MINSTD multiplier

  /** The full 31-bit mixed value in [0, P) before any bucket reduction —
    * use this (not [[hashBucket]]) when reducing modulo a caller-chosen m, so
    * uniformity holds for any m ≪ 2³¹ rather than only m ≪ 9973. */
  private[operators] def hashRaw(id: Column, seed: Long): Column = {
    val s1 = java.lang.Math.floorMod(seed, M1) + 1
    val s2 = java.lang.Math.floorMod(seed, M2) + 1
    val t = pmod((pmod(id, lit(M1)) + lit(s1)) * (pmod(id, lit(M2)) + lit(s2)), lit(P))
    val u = pmod(t * lit(G), lit(P))
    pmod(u * lit(G), lit(P))
  }

  /** JVM twin of [[hashRaw]] — the SAME arithmetic on plain longs, for
    * native expressions that replay a hash-gated decision imperatively
    * (span corruption's native walk). The two must move together; the
    * factor bound (≤ ~2·10⁶ per operand) keeps the product well inside
    * Long. Equality with the Column form is spec-pinned. */
  private[graft] def hashRawLong(id: Long, seed: Long): Long = {
    val s1 = java.lang.Math.floorMod(seed, M1) + 1
    val s2 = java.lang.Math.floorMod(seed, M2) + 1
    val t = java.lang.Math.floorMod(
      (java.lang.Math.floorMod(id, M1) + s1) *
        (java.lang.Math.floorMod(id, M2) + s2), P)
    java.lang.Math.floorMod(java.lang.Math.floorMod(t * G, P) * G, P)
  }

  def hashBucket(id: Column, seed: Long): Column =
    pmod(hashRaw(id, seed), lit(Buckets))

  /** Keep ~rate of rows, chosen by id hash — stable under reruns and data
    * growth (a row's fate never depends on other rows). */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double, seed: Long = 42): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(col(idCol), seed) < (rate * Buckets).toLong)
  }

  /** Cluster-balanced diversity sample: assign every embedding to one of
    * `nLists` Voronoi cells (the [[graft.operators.Similarity]] IVF cell
    * structure — deterministically sampled centroids, argmax-cosine
    * assignment) and keep at most `perCell` vectors per cell, chosen by the
    * portable id hash. The selection counterpart of SemDeDup pruning:
    * instead of deleting near-duplicates, CAP each semantic region so the
    * sample covers the embedding space instead of mirroring its density —
    * the "diverse subset" step of data-curation pipelines.
    *
    * Scale shape: centroids broadcast as literals, assignment is a narrow
    * argmax map, and the per-cell cap is ONE exchange on the cell whose
    * rank window Spark executes as a partial top-k below the shuffle
    * (WindowGroupLimit — each map task forwards at most perCell rows per
    * cell). Output: (idCol, cell) for the kept vectors. */
  def cellBalancedSample(emb: DataFrame, nLists: Int, perCell: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42): DataFrame = {
    require(nLists >= 1, s"nLists must be >= 1, got $nLists")
    require(perCell >= 1, s"perCell must be >= 1, got $perCell")
    val asg = graft.operators.Similarity.cellAssignments(
      emb, nLists, idCol, vecCol, seed)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cell")
      .orderBy(hashRaw(col(idCol), seed).asc, col(idCol).asc)
    asg.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= perCell)
      .select(col(idCol), col("cell"))
  }

  /** Deterministic importance RESAMPLING (the DSIR-family shape, Xie et
    * al. 2023: select pretraining data by importance weight): keep row i
    * with probability ≈ min(1, nTarget·wᵢ/W), W = Σ max(wᵢ, 0) — an
    * expected-`nTarget`-row Bernoulli sample biased by any caller-supplied
    * weight column (quality score, exp(LM-score/T), domain factor…).
    * Non-positive/NULL weights are never kept. The keep decision is
    * `hashBucket(id) < floor(p·Buckets)` — the same integer-exact portable
    * gate as [[sampleByHash]], so the sample is identical on every engine,
    * rerun, and cluster size (the DuckDB oracle replays it row-for-row;
    * complementary to [[weightedSample]], which is exact-k without
    * replacement via a top-k).
    *
    * W itself must also be order-independent or the determinism claim is
    * hollow: a double `sum(w)` associates in partition order, so a
    * fractional weight landing p·Buckets exactly on an integer could flip
    * membership between runs/cluster sizes. W is therefore accumulated in
    * FIXED POINT — `floor(w·2²⁰)` summed as exact DECIMAL(38,0) (the same
    * trick as kmeansCentroids' fixed-point sums), then divided back — which
    * is exactly associative for any weights, not just integer-valued ones.
    * Weights' fractional part is quantized to 2⁻²⁰ (≈1e-6); per-row weights
    * above 2³³ lose fixed-point bits — far outside any quality/LM-score
    * weighting's range.
    *
    * Scale shape: W is one map-side-combined 1-row aggregate riding a
    * broadcast; the gate itself is a narrow filter — the corpus is scanned
    * once and never shuffled. */
  def importanceResample(df: DataFrame, weight: Column, nTarget: Long,
      idCol: String = "doc_id", seed: Long = 42): DataFrame = {
    require(nTarget >= 0, s"nTarget must be >= 0, got $nTarget")
    val w = greatest(coalesce(weight.cast("double"), lit(0.0)), lit(0.0))
    // floor(double)→long in Spark, then exact decimal sum; the final
    // cast-to-double + divide are single IEEE ops the oracle replays
    val tot = df.agg(
      (sum(floor(w * lit(FixedPointScale)).cast("decimal(38,0)"))
        .cast("double") / lit(FixedPointScale)).as("__graft_wsum"))
    df.crossJoin(broadcast(tot))
      .filter(w > 0 &&
        hashBucket(col(idCol), seed) <
          floor(least(lit(1.0), lit(nTarget.toDouble) * w / col("__graft_wsum")) *
            lit(Buckets.toDouble)).cast("long"))
      .drop("__graft_wsum")
  }

  /** The split-assignment COLUMN for an id — a pure hash, usable as a narrow
    * map wherever an id column exists (no join against an assignment table
    * needed; [[graft.operators.Dedup.splitLeakage]] relies on this). */
  def splitAssignment(id: Column, splits: Seq[(String, Double)],
      seed: Long = 42): Column = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0),
      s"split fractions must be non-negative, got ${splits.map(_._2)}")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions must sum to <= 1, got ${splits.map(_._2).sum}")
    val h = hashBucket(id, seed)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * Buckets).toLong)
    splits.init.zip(cuts.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cut), rest) =>
      when(h < cut, lit(name)).otherwise(rest)
    }
  }

  /** Reproducible split into named fractions (e.g. train 0.9 / val 0.05 /
    * test 0.05): adds a `split` column. Fractions must sum to ≤ 1; any hash
    * remainder falls into the LAST split. */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      seed: Long = 42): DataFrame =
    df.withColumn("split", splitAssignment(col(idCol), splits, seed))

  /** Sequence packing for training-data export: concatenate documents in a
    * deterministic order and assign each one its position in fixed
    * token-budget training sequences ("pack and split" — a document crossing
    * a budget boundary continues into the next sequence, the standard
    * LM-pretraining packing rule).
    *
    * Documents are sharded by id hash (so packing is embarrassingly parallel
    * and reproducible under any input partitioning), ordered by id within the
    * shard, and positioned by an exclusive prefix sum of their token counts:
    * `seq_id = floor(prefix / budget)`, `tok_offset = prefix % budget`.
    * Adds `shard`, `seq_id`, `tok_offset`.
    *
    * Scale shape: one exchange on `shard` (pick numShards ≈ cluster cores),
    * then a per-partition running sum (Spark's window frame is streaming for
    * running totals — no buffering). No global sort, no driver state.
    *
    * `dropEmpty` (default true) filters documents whose `tokenCount` is not
    * positive (zero, negative, or NULL) BEFORE sharding: they carry no
    * trainable text, and because they never advance the prefix sum,
    * arbitrarily many of them would share one (seq_id, tok_offset) slot —
    * the unbounded-group hazard [[materializeSequences]]' state bound
    * depends on. With the default on, that precondition holds by
    * construction; pass false only when the caller has already enforced a
    * positive-token contract and wants the filter elided. */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
      budget: Long, numShards: Int, seed: Long = 42,
      dropEmpty: Boolean = true): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    // the three output columns are API; refuse to silently clobber a caller's
    // same-named column (a pre-sharded corpus losing its `shard` would be a
    // silent data bug). Temp columns probe for collision-free names instead.
    Seq("shard", "seq_id", "tok_offset").foreach { c =>
      require(!df.columns.contains(c),
        s"packSequences adds a '$c' column but the input already has one")
    }
    def temp(base: String) = Iterator.from(0).map(i => s"__graft_pack_$base$i")
      .find(c => !df.columns.contains(c)).get
    val (nCol, prefixCol) = (temp("n"), temp("prefix"))
    import org.apache.spark.sql.expressions.Window
    val base = if (dropEmpty) df.filter(tokenCount.cast("long") > 0) else df
    // shard from the full 31-bit hash, NOT the 9973-bucket reduction — with
    // thousands of shards (numShards ≈ cluster cores) the bucket-reduced
    // value would cap usable shards at 9973 and skew load up to 2× whenever
    // numShards does not divide Buckets
    val shard = pmod(hashRaw(col(idCol), seed), lit(numShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.withColumn("shard", shard)
      .withColumn(nCol, tokenCount.cast("long"))
      .withColumn(prefixCol, coalesce(sum(col(nCol)).over(w), lit(0L)))
      // integer division: Column `/` on longs is DOUBLE division, exact only
      // while the prefix stays below 2^53 — a silent mis-bucketing hazard for
      // a hot shard of a 100 TB corpus; `div` keeps the math in longs
      .withColumn("seq_id", expr(s"`$prefixCol` div ${budget}L"))
      .withColumn("tok_offset", pmod(col(prefixCol), lit(budget)))
      .drop(nCol, prefixCol)
  }

  /** LENGTH-BUCKETED BATCHING — the other trainer-facing grouping beside
    * packing: variable-length fine-tuning / inference batches waste compute
    * as padding (every sequence pads to the batch max), so trainers group
    * samples of SIMILAR length and batch within the group (the bucketing
    * strategy of fairseq/HF `group_by_length`). Each document lands in
    * length bucket `n div bucketWidth`; within a (bucket, shard) cell,
    * documents in deterministic id order fill batches of `batchSize`.
    * Padding waste per batch is then bounded by bucketWidth·(batchSize−1)
    * tokens instead of maxLen·(batchSize−1).
    *
    * Output: (idCol, n, bucket, shard, batch_idx, pos_in_batch) — a full
    * deterministic batch assignment, replayable by the SQL oracle.
    *
    * Scale shape: one narrow projection (token count, bucket, shard from
    * the portable id hash), ONE exchange on (bucket, shard), and a
    * per-partition sort for the row_number — no global sort. The shard
    * dimension exists exactly so a hot bucket (most corpora pile up at
    * short lengths) spreads over `numShards` reducers instead of one; at
    * 1000 executors set numShards ≈ cores as with [[packSequences]]. */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokenCount: Column,
      bucketWidth: Long, batchSize: Int, numShards: Int = 8,
      seed: Long = 42): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col(idCol).asc)
    df.select(col(idCol), tokenCount.cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("bucket", expr(s"n div ${bucketWidth}L"))
      .withColumn("shard", pmod(hashRaw(col(idCol), seed), lit(numShards.toLong)))
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("batch_idx", expr(s"__rn div ${batchSize}L"))
      .withColumn("pos_in_batch", pmod(col("__rn"), lit(batchSize.toLong)))
      .drop("__rn")
  }

  /** PADDING-EFFICIENCY REPORT over a [[lengthBucketBatches]] assignment —
    * the audit a trainer reads before committing to a bucket width: every
    * batch pads to its max sequence length, so a batch's padded slots are
    * max(n)·rows − Σn. Rolled up per (bucket, shard): batch count, rows,
    * real tokens, padded slots, and the efficiency share
    * real/(real+padded). Efficiency near 1.0 = the bucket width matches
    * the length distribution; a low-efficiency bucket is the signal to
    * narrow widths there.
    *
    * Scale shape: two map-side-combined aggregations — (bucket, shard,
    * batch_idx) then (bucket, shard) — and, fed by [[lengthBucketBatches]],
    * ZERO additional exchanges: the batching window already hash-partitions
    * on exactly (bucket, shard), which satisfies ClusteredDistribution for
    * BOTH groupings (a partitioning on a subset of the grouping keys
    * clusters the superset too), so each aggregate reuses it — plan-pinned
    * in `PlanSpec` ("one shuffle total"). Note the reuse comes from the
    * UPSTREAM partitioning, not from the second key being a prefix of the
    * first: a first aggregate that itself introduced
    * HashPartitioning(bucket, shard, batch_idx) would NOT satisfy
    * ClusteredDistribution(bucket, shard) and Spark would plan a second
    * (small, batch-count-sized) exchange. All counts are exact longs, one
    * IEEE division per output row. */
  def packEfficiency(batches: DataFrame): DataFrame = {
    val perBatch = batches.groupBy("bucket", "shard", "batch_idx")
      .agg(max("n").as("__mx"), count(lit(1)).as("__rows"),
        sum("n").as("__tok"))
    perBatch.groupBy("bucket", "shard")
      .agg(count(lit(1)).as("n_batches"),
        sum("__rows").as("n_rows"),
        sum("__tok").as("n_tokens"),
        sum(col("__mx") * col("__rows") - col("__tok")).as("pad_slots"))
      .withColumn("efficiency",
        col("n_tokens").cast("double") /
          (col("n_tokens") + col("pad_slots")).cast("double"))
  }

  /** CURRICULUM STAGING — order a corpus easiest-first for curriculum
    * training: learn `stages − 1` score cutoffs (exact interpolated
    * percentiles at k/stages) from a hash sample, broadcast them, and assign
    * every document stage = number of cutoffs its score clears (stage
    * `stages−1` = top-quality slice, trained first in a
    * high-quality-first curriculum; reverse for anti-curriculum). Within a
    * stage the training order is a deterministic shuffle: the portable id
    * hash orders rows inside (stage, shard) cells, the same
    * skew-spreading shard trick as [[lengthBucketBatches]].
    *
    * Output: (idCol, stage, shard, pos) — a complete deterministic training
    * schedule (read stages in the desired order, shards round-robin, pos
    * ascending), fully replayable by the SQL oracle.
    *
    * Scale shape: the cutoff learning aggregates a hash sample to ONE row
    * (broadcast back, the [[graft.operators.TextAnalysis.qualityQuantileFilter]]
    * pattern); the assignment is a narrow map; the only exchange keys on
    * (stage, shard) with an in-partition sort — no global sort of the
    * corpus, no single-reducer window. A data-dependent empty sample yields
    * NULL cutoffs → every doc lands in stage 0 (the conservative "nothing
    * is provably easy" default), never a dropped row. */
  def curriculumStages(df: DataFrame, idCol: String, score: Column,
      stages: Int, sampleRate: Double = 0.5, numShards: Int = 8,
      seed: Long = 42): DataFrame = {
    require(stages >= 2, s"stages must be >= 2, got $stages")
    require(sampleRate > 0 && sampleRate <= 1,
      s"sampleRate must be in (0, 1], got $sampleRate")
    require((sampleRate * Buckets).toLong >= 1,
      s"sampleRate $sampleRate floors to zero of $Buckets hash buckets")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val cutCols = (1 until stages).map(k =>
      percentile(col("__q"), lit(k.toDouble / stages)).as(s"__c$k"))
    val cuts = sampleByHash(df, idCol, sampleRate, seed)
      .select(score.as("__q"))
      .agg(cutCols.head, cutCols.tail: _*)
    // score ONCE into a column, then compare against the cutoffs: inlining
    // `score` into the stage expression evaluated the composite quality
    // score (token split + stopword scan + alpha-ratio regex) once PER
    // CUTOFF per row — stages−1 redundant full-text passes that r17's
    // profile showed dominating the assignment stage. The separate project
    // survives optimization because CollapseProject refuses to duplicate a
    // non-cheap expression consumed more than once (the same single-eval
    // guarantee the guide's §4.4 non-determinism trick buys for UDFs).
    val stage = (1 until stages).map(k =>
        when(col("__s") >= coalesce(col(s"__c$k"), lit(Double.PositiveInfinity)),
          1L).otherwise(0L))
      .reduce(_ + _)
    val w = Window.partitionBy(col("stage"), col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), score.as("__s"), hashRaw(col(idCol), seed).as("__h"))
      .crossJoin(broadcast(cuts))
      .select(col(idCol), stage.as("stage"), col("__h"))
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("__h")
  }

  /** Document-ATOMIC greedy packing — the no-split packing rule used when a
    * document must not cross a sequence boundary (instruction-tuning /
    * SFT-style corpora, where splitting a sample mid-text corrupts it):
    * documents are placed in deterministic (shard, id) order; one that would
    * overflow the `budget` starts a new sequence at offset 0 instead of
    * continuing into it; a single over-budget document occupies a sequence
    * alone. Unlike [[packSequences]]' pack-and-split prefix sum, this
    * recurrence RESETS at every overflow, which no window frame can express
    * — the state (current seq, current fill) is carried by a streaming
    * per-partition scan with O(1) state.
    *
    * Output: input columns + `shard`, `seq_id`, `tok_offset` — the same
    * contract as [[packSequences]], so [[materializeSequences]] /
    * [[materializeTokenIds]] compose unchanged (their per-group state bound
    * IMPROVES here: a group holds at most one budget's worth, no crossing
    * document).
    *
    * Scale shape: one exchange on `shard` (hash of the full 31-bit portable
    * id hash — even load by construction), a per-partition external sort by
    * (shard, id) (spills, never buffers the partition on the heap), then the
    * single-pass scan. No global sort, no driver state, no per-group
    * buffering. `dropEmpty` as in [[packSequences]]: zero-token documents
    * never consume budget, so unboundedly many would pile into one slot. */
  def packSequencesWhole(df: DataFrame, idCol: String, tokenCount: Column,
      budget: Long, numShards: Int, seed: Long = 42,
      dropEmpty: Boolean = true): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    Seq("shard", "seq_id", "tok_offset").foreach { c =>
      require(!df.columns.contains(c),
        s"packSequencesWhole adds a '$c' column but the input already has one")
    }
    val nCol = Iterator.from(0).map(i => s"__graft_packw_n$i")
      .find(c => !df.columns.contains(c)).get
    val base = if (dropEmpty) df.filter(tokenCount.cast("long") > 0) else df
    val parted = base
      .withColumn("shard", pmod(hashRaw(col(idCol), seed), lit(numShards.toLong)))
      // coalesce: with dropEmpty=false a NULL token count reaches the
      // per-partition scan's getLong and would NPE the task — treat it as a
      // zero-token document instead (same slot-sharing caveat as dropEmpty)
      .withColumn(nCol, coalesce(tokenCount.cast("long"), lit(0L)))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      parted.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("seq_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("tok_offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val shardIdx = parted.schema.fieldIndex("shard")
    val nIdx = parted.schema.fieldIndex(nCol)
    // a partition serves every shard hashing to it; state resets on the
    // shard change the sort groups by — still O(1), still one streaming pass
    val packed = parted.mapPartitions { it =>
      var curShard = Long.MinValue
      var seq = 0L
      var fill = 0L
      it.map { r =>
        val sh = r.getLong(shardIdx)
        val n = r.getLong(nIdx)
        if (sh != curShard) { curShard = sh; seq = 0L; fill = 0L }
        // fill == 0 admits an over-budget document at offset 0 (it then
        // overfills, so the NEXT document always rolls to a fresh sequence)
        if (fill > 0 && fill + n > budget) { seq += 1L; fill = 0L }
        val off = fill
        fill += n
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ seq :+ off)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    packed.drop(nCol)
  }

  /** Per-sequence fill accounting for a packed corpus (either packing rule):
    * (shard, seq_id, n_docs, n_tokens, pad) where `pad` is the unused budget
    * a fixed-length trainer would pad — max(budget − n_tokens, 0), zero for
    * the over-filled sequences pack-and-split produces. The padding-waste
    * signal that motivates choosing [[packSequences]] (zero pad, documents
    * split) over [[packSequencesWhole]] (documents intact, nonzero pad).
    * One exchange keyed (shard, seq_id) — reuses the pack's shard
    * partitioning exactly like [[materializeSequences]]. */
  def packFill(packed: DataFrame, tokenCount: Column, budget: Long): DataFrame =
    packed.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
      .withColumn("pad", greatest(lit(budget) - col("n_tokens"), lit(0L)))

  /** Materialize the packed training sequences: concatenate each (shard,
    * seq_id)'s documents in position order, joined with `sep` (e.g. an EOD
    * marker) — the terminal export step after [[packSequences]]. Output:
    * (shard, seq_id, n_docs, seq_text).
    *
    * Scale shape: ONE exchange keyed on (shard, seq_id) — Catalyst reuses
    * [[packSequences]]' hashpartitioning(shard) for the aggregation
    * (PlanSpec-pinned), so the whole pack → materialize path shuffles once.
    * The per-group collected state is bounded by max(budget, largest doc):
    * every document has ≥ 1 token — ENFORCED by [[packSequences]]' default
    * `dropEmpty` (zero-token documents don't advance the prefix sum, so
    * arbitrarily many of them would share one (seq_id, tok_offset) slot;
    * a caller packing with `dropEmpty = false` takes that bound back on
    * themselves) — and an over-budget document is kept whole in its
    * starting sequence (pack-and-split), so the group holds at most one
    * budget's worth of full documents plus the one that crossed in.
    * Ordering inside the sequence is (tok_offset, idCol); the id tie-break
    * keeps the layout deterministic even when offsets collide. */
  def materializeSequences(packed: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sep: String = "\n"): DataFrame =
    packed.groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("tok_offset"), col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          sep).as("seq_text"))

  /** Materialize the packed sequences as TRAINER-FACING TOKEN IDS: the
    * vocab-mapped variant of [[materializeSequences]]. Each document's text
    * is encoded map-side by the native [[graft.functions.TokenIds]]
    * expression (the engine tokenization, one O(1) hash probe per token,
    * OOV → `oovId`), then each (shard, seq_id)'s id arrays are concatenated
    * in (tok_offset, id) position order. Output: (shard, seq_id, n_docs,
    * token_ids array<long>).
    *
    * Scale shape: identical to [[materializeSequences]] — the encoding rides
    * the existing scan (narrow), and the ONE exchange keyed on (shard,
    * seq_id) reuses [[packSequences]]' hashpartitioning(shard). The vocab
    * travels with the serialized expression (config-sized: 256–64K entries);
    * see [[graft.functions.TokenIds]] for the broadcast-variable escalation
    * path. Token conservation: len(token_ids) per group equals the group's
    * summed tokenCount — the empty-text encoding (0 ids) agrees with
    * tokenCount = 0, and [[packSequences]]' default `dropEmpty` keeps such
    * rows out anyway. */
  def materializeTokenIds(packed: DataFrame, vocab: Map[String, Long],
      oovId: Long, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tids = Iterator.from(0).map(i => s"__graft_tids$i")
      .find(c => !packed.columns.contains(c)).get
    packed
      .withColumn(tids,
        graft.functions.TextExpressions.tokenIds(col(textCol), vocab, oovId))
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        flatten(
          transform(
            array_sort(collect_list(
              struct(col("tok_offset"), col(idCol), col(tids)))),
            s => s.getField(tids))).as("token_ids"))
  }

  /** Leakage-safe TEMPORAL holdout with an embargo gap — the time-series
    * counterpart of the hash split: train on the past, test on the future,
    * and DROP a buffer zone between them so nothing with look-ahead
    * correlation (trailing features, sessions straddling the boundary)
    * leaks across (the embargo of combinatorial-purged CV, de Prado 2018).
    * Returns the input plus a `split` column: `train` for buckets ≤ c −
    * embargo, `embargo` for (c − embargo, c], `test` after c — callers
    * filter the embargo zone out; keeping it labeled beats silently
    * dropping rows.
    *
    * The cutoff bucket c is derived FROM THE DATA as the exact
    * `fracNum/fracDen` mass point of the bucketed row distribution
    * ([[Profiling.weightedQuantile]] over per-bucket counts — integer
    * cross-product threshold, so every engine picks the same bucket).
    * Scale shape: one map-side-combined bucket count (bucket-sized), a
    * window over that TINY relation, a 1-row broadcast back onto the
    * corpus — the corpus itself is scanned once and never shuffled. */
  def timeSplit(df: DataFrame, tsUsCol: String, bucketUs: Long,
      fracNum: Int, fracDen: Int, embargoBuckets: Long): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    require(embargoBuckets >= 0,
      s"embargoBuckets must be >= 0, got $embargoBuckets")
    val bucket = expr(s"CAST($tsUsCol AS BIGINT) div $bucketUs")
    val counts = df.select(bucket.as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("__w"))
      .withColumn("__g", lit(1))
    val cut = Profiling.weightedQuantile(counts, Seq("__g"), col("__d"),
        col("__w"), fracNum, fracDen)
      .select(col("wq").as("__cut"))
    df.crossJoin(broadcast(cut))
      .withColumn("split",
        when(bucket <= col("__cut") - embargoBuckets, "train")
          .when(bucket <= col("__cut"), "embargo")
          .otherwise("test"))
      .drop("__cut")
  }

  /** Deterministic corpus shuffle for training export: every row gets a
    * `shard` (portable id hash — even load by construction) and a dense
    * 0-based `pos` within the shard, ordered by an INDEPENDENT second hash
    * (id tie-break, so rows colliding on the order hash still get a total
    * order). Reading shards in any order and each shard by `pos` replays
    * one fixed pseudo-random permutation of the corpus — the reproducible
    * "global shuffle" step before [[packSequences]] (which deliberately
    * keeps id order; compose as shuffle → re-id by (shard, pos) → pack when
    * a shuffled packing is wanted). Different seeds give independent
    * permutations; the same seed gives the same permutation on every run
    * and engine.
    *
    * Scale shape: NO global sort — one exchange on `shard` (pick numShards
    * ≈ cluster cores so each shard's local sort fits an executor), then a
    * per-shard sort + streaming row_number. The window never buffers the
    * partition (running frame), so memory is the sort spill, not the data. */
  def shuffleOrder(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 42): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    Seq("shard", "pos").foreach { c =>
      require(!df.columns.contains(c),
        s"shuffleOrder adds a '$c' column but the input already has one")
    }
    import org.apache.spark.sql.expressions.Window
    // full 31-bit hash for the shard (see packSequences: the 9973-bucket
    // reduction would cap and skew shard counts); seed+1 keeps the order
    // hash independent of the shard hash — with the SAME hash, each shard
    // would read out in residue-class order, not a shuffle
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashRaw(col(idCol), seed + 1).asc, col(idCol).asc)
    df.withColumn("shard", pmod(hashRaw(col(idCol), seed), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Export MANIFEST: per shard (the [[shuffleOrder]] shard contract — same
    * hash, same seed), the row count, token total, and an ORDER-INSENSITIVE
    * content checksum: Σ polyHash64(fingerprint(text)) mod 2⁶⁴, summed in
    * DECIMAL(38,0) so the sum is exact and partition-order-free (the
    * kmeansCentroids fixed-point discipline), folded back to the signed
    * 64-bit domain. This is the integrity record a dataset release ships
    * beside its shards: re-run the manifest on the delivered files and any
    * dropped/duplicated/corrupted document flips the checksum, regardless
    * of row order. NULL-text rows count in n_docs but not the checksum
    * (their fingerprint is NULL on every engine).
    *
    * Scale shape: one narrow map (hash + fingerprint per row) and ONE
    * map-side-combined exchange of numShards·partitions partial rows. */
  def exportManifest(docs: DataFrame, numShards: Int, seed: Long = 42,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    manifestFinish(manifestPartial(docs, numShards, seed, idCol, textCol))

  /** 2⁶⁴ as an exact decimal — the modulus of the manifest checksum's
    * unsigned accumulator (and of the streaming fold over it). */
  private[graft] val ManifestM64: java.math.BigDecimal =
    new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))

  /** The MERGEABLE half of [[exportManifest]]: per-shard
    * (n_docs, n_tokens, cu) where `cu` is the unsigned mod-2⁶⁴ checksum
    * accumulator in DECIMAL(38,0). All three columns are commutative
    * monoids (two plain sums, one wrap-around sum), which is what lets
    * `StreamingManifest.manifestSink` fold micro-batch partials in a
    * [[graft.streaming.GenStore]] and land on the bit-identical one-shot
    * manifest. */
  private[graft] def manifestPartial(docs: DataFrame, numShards: Int,
      seed: Long = 42, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val h = graft.functions.HashExpressions
      .polyHash64(TextAnalysis.fingerprint(col(textCol)))
    val hu = when(h < 0, h.cast("decimal(38,0)") + lit(ManifestM64))
      .otherwise(h.cast("decimal(38,0)"))
    docs
      .select(pmod(hashRaw(col(idCol), seed), lit(numShards.toLong)).as("shard"),
        coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("tc"),
        hu.as("hu"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("n_tokens"),
        pmod(sum(col("hu")), lit(ManifestM64)).as("cu"))
  }

  /** The FINISHING half of [[exportManifest]]: fold the unsigned mod-2⁶⁴
    * accumulator back to the signed 64-bit checksum domain. */
  private[graft] def manifestFinish(partial: DataFrame): DataFrame = {
    val half = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(63))
    partial.select(col("shard"), col("n_docs"), col("n_tokens"),
      when(col("cu") >= lit(half), col("cu") - lit(ManifestM64))
        .otherwise(col("cu"))
        .cast("long").as("checksum"))
  }

  /** WATER-FILLING budget allocation — the exact-count companion of
    * [[mixtureRates]]: given a hard total budget B of rows (or docs — run
    * it on whatever unit the budget is in), allocate fairly across keys
    * with SPILL: every key gets up to the common level t, keys smaller
    * than t keep everything, and their unused share spills to the larger
    * keys (t = the largest integer with Σ min(c_k, t) ≤ B; the remainder
    * B − Σ min(c_k, t) goes +1 each to the first keys ABOVE the level in
    * key order). Σ alloc == min(B, Σ c) EXACTLY — rate-based mixing can
    * only hit a budget in expectation; release planning needs the equality.
    *
    * Everything is integer arithmetic on the KEY-COUNT relation (K rows —
    * sources/languages/snapshots, config scale), so the allocation is
    * engine- and partitioning-exact: the level solve is one windowed pass
    * (per-interval candidate t_i = ⌊(B − P_{i−1})/(K−i+1)⌋, valid in
    * exactly one count interval), never an iterative loop. The corpus
    * itself contributes ONE count aggregation; the global windows run on K
    * rows. Returns (key, n_rows, alloc). Compose with [[quotaPerKey]]-style
    * rank gates to materialize the selection. */
  def waterfillAlloc(df: DataFrame, keyCol: String, budget: Long): DataFrame =
    waterfillAlloc(df, keyCol, budget, lit(1L))

  /** Weighted [[waterfillAlloc]]: the budget and allocations are in UNITS
    * of `weight` (tokens, bytes) — c_k = Σ weight per key, the level is a
    * unit threshold, and the remainder still lands +1 per unsaturated key
    * (sub-unit exactness is meaningless for indivisible rows anyway).
    * Weights must be non-negative integers (cast to long). */
  def waterfillAlloc(df: DataFrame, keyCol: String, budget: Long,
      weight: Column): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    // persist: the K-row count relation feeds the interval solve, the
    // totals AND the final alloc projection — without it the corpus
    // aggregation re-executes per consumer (plan-pinned to one scan)
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(sum(weight.cast("long")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ord = Window.orderBy(col("c").asc, col("key").asc)
    val o = counts
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("p_prev", coalesce(
        sum(col("c")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("c_prev", lag(col("c"), 1, 0L).over(ord))
    val tot = counts.agg(count(lit(1)).cast("long").as("k"),
      sum(col("c")).as("n"))
    // the unique interval whose candidate level lands inside it (empty when
    // budget >= total: everything fits, no level needed)
    val lvlRow = o.crossJoin(broadcast(tot))
      .filter(col("p_prev") <= budget)
      // integer div (operands are non-negative after the p_prev filter, so
      // truncation IS floor); a double `/` would lose exactness past 2^53
      .withColumn("lvl", expr(s"(${budget}L - p_prev) div (k - i + 1)"))
      .filter(col("lvl") < col("c") && col("lvl") >= col("c_prev"))
      .select(col("lvl"),
        (lit(budget) - (col("p_prev") + col("lvl") * (col("k") - col("i") + 1)))
          .as("rem"))
    o.select(col("key"), col("c"))
      .join(broadcast(lvlRow), lit(true), "left")
      .withColumn("over", col("lvl").isNotNull && col("c") > col("lvl"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("over")).orderBy(col("key").asc)).cast("long"))
      .select(col("key"), col("c").as("n_rows"),
        when(col("lvl").isNull, col("c"))
          .otherwise(least(col("c"), col("lvl")) +
            when(col("over") && col("rn") <= col("rem"), 1L).otherwise(0L))
          .cast("long").as("alloc"))
  }

  /** Materialize a PER-KEY allocation (e.g. [[waterfillAlloc]]'s output —
    * any (key, alloc) relation works) as an exact row selection:
    * [[quotaPerKey]]'s deterministic hash-rank gate, but with the cap read
    * per key from `alloc` instead of one global n. Selection is stable
    * under reruns/partitioning (rank order = (hashBucket(id), id)); each
    * key emits EXACTLY min(alloc, count) rows. The allocation relation is
    * key-count sized → broadcast join; the rank is the one
    * window-per-key pass quotaPerKey already pays. */
  def selectByAlloc(df: DataFrame, alloc: DataFrame, keyCol: String,
      idCol: String, seed: Long = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), seed).asc, col(idCol).asc)
    val rk = Iterator.from(0).map(i => s"__graft_alloc_rk$i")
      .find(c => !df.columns.contains(c)).get
    df.join(broadcast(alloc.select(col("key").as(keyCol), col("alloc"))),
        Seq(keyCol))
      .withColumn(rk, row_number().over(w))
      .filter(col(rk) <= col("alloc"))
      .drop(rk, "alloc")
  }

  /** Temperature-based source-mixing rates (the mT5/multilingual-LM recipe):
    * target sampling probability p_s ∝ n_s^alpha over the given per-source
    * sizes, realized as per-row Bernoulli rates r_s = targetTotal·p_s / n_s
    * (capped at 1 — a source cannot be up-sampled by a Bernoulli filter;
    * callers wanting true up-sampling replicate separately). alpha = 1
    * reproduces the natural distribution, alpha → 0 equalizes sources.
    * Pure driver-side math over a CONFIG-SIZED map (sources, not rows) —
    * feed the result to [[stratifiedSample]]. */
  def temperatureRates(sourceCounts: Map[String, Long], alpha: Double,
      targetTotal: Long): Map[String, Double] = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(sourceCounts.nonEmpty, "at least one source required")
    require(sourceCounts.values.forall(_ > 0), "source counts must be positive")
    val weights = sourceCounts.map { case (s, n) => s -> math.pow(n.toDouble, alpha) }
    val z = weights.values.sum
    weights.map { case (s, w) =>
      s -> math.min(1.0, targetTotal * (w / z) / sourceCounts(s)) }
  }

  /** Stratified sampling: an independent hash-Bernoulli rate per key value
    * (the "rebalance sources" operator — downsample the over-represented
    * crawl, keep all of the rare curated set). Keys absent from `rates` keep
    * `defaultRate`. Same stability guarantees as [[sampleByHash]]; a pure
    * narrow map — no shuffle, no per-key state. */
  def stratifiedSample(df: DataFrame, keyCol: String, rates: Map[String, Double],
      idCol: String, defaultRate: Double = 0.0, seed: Long = 42): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rates must be in [0,1], got $r"))
    val cut = rates.toSeq.sortBy(_._1).foldRight(
      lit((defaultRate * Buckets).toLong)) { case ((key, r), rest) =>
      when(col(keyCol) === lit(key), lit((r * Buckets).toLong)).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol), seed) < cut)
  }

  /** Deterministic source UP-sampling — the replication counterpart of
    * [[temperatureRates]] + [[stratifiedSample]] (a Bernoulli filter can only
    * down-sample; temperature mixing over under-represented sources needs
    * rates > 1, i.e. copies). A row whose key has rate r gets floor(r)
    * copies, plus one more exactly when its id hash lands under frac(r) —
    * E[copies] = r, decided purely by (id, seed): stable under reruns and
    * data growth, and r < 1 degenerates to [[stratifiedSample]]'s Bernoulli
    * keep. Adds a 0-based `copy` column so downstream identity stays unique
    * as (id, copy) — feed `id·K + copy` (or a struct) to the export path.
    *
    * Scale shape: a narrow per-row sequence explode — no shuffle, no join;
    * output volume is the mixing target by construction. Keys absent from
    * `rates` keep `defaultRate` (1.0 = pass-through). */
  def upsample(df: DataFrame, keyCol: String, rates: Map[String, Double],
      idCol: String, defaultRate: Double = 1.0, seed: Long = 42): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0, s"rates must be >= 0, got $r"))
    require(!df.columns.contains("copy"),
      "upsample adds a 'copy' column but the input already has one")
    def byKey(f: Double => Long): Column =
      rates.toSeq.sortBy(_._1).foldRight(lit(f(defaultRate))) {
        case ((k, r), rest) => when(col(keyCol) === lit(k), lit(f(r))).otherwise(rest)
      }
    val base = byKey(r => math.floor(r).toLong)
    val cut = byKey(r => ((r - math.floor(r)) * Buckets).toLong)
    val copies = base + when(hashBucket(col(idCol), seed) < cut, lit(1L)).otherwise(lit(0L))
    // rows with 0 copies drop structurally: explode of an empty array
    df.withColumn("copy", explode(
      when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** At most `n` rows per key, chosen deterministically by id-hash order
    * (tie-break by id) — the "cap any single source" operator. The only
    * shuffle is the window partition on the key; Spark's WindowGroupLimit
    * pushes a partial top-n below the exchange. */
  def quotaPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      seed: Long = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), seed).asc, col(idCol).asc)
    // collision-proof temp column name (never clobber a caller's column)
    val rk = Iterator.from(0).map(i => s"__graft_quota_rk$i")
      .find(c => !df.columns.contains(c)).get
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= n)
      .drop(rk)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row draws u = (hashRaw(id)+1)/P ∈ (0,1] and scores u^(1/weight);
    * the k LARGEST scores are a weight-proportional sample without
    * replacement — the training-mix primitive "sample documents by token
    * mass" that plain Bernoulli/stratified rates can't express per-row.
    * Rows with NULL or non-positive weight are ineligible. Deterministic:
    * the only randomness is the id hash, so the selection is stable under
    * reruns, partitioning and row order; ties (two ids hashing equal)
    * break to the smallest id. Scale-invariant in the weights (u^(1/cw)
    * is monotone in u^(1/w)), so any constant weight degenerates to
    * uniform top-k by hash.
    *
    * Scale shape: the score is a narrow map; `orderBy(...).limit(k)` plans
    * as TakeOrderedAndProject — each partition keeps its local top-k and
    * the driver merges k·partitions rows. No global sort, no shuffle of
    * the corpus; k is config-scale. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: Long = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (hashRaw(col(idCol), seed) + lit(1L)).cast("double") / lit(P.toDouble)
    val wk = Iterator.from(0).map(i => s"__graft_ws_key$i")
      .find(c => !df.columns.contains(c)).get
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn(wk, pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col(wk).desc, col(idCol).asc)
      .limit(k)
      .drop(wk)
  }

  /** Training-data MIXTURE sampling: down-sample each source to its share
    * of a target token budget (the Pile/CCNet-style mixing step that turns
    * "weights per source" into an actual corpus). For each (source, weight)
    * the kept fraction is
    *   rate_s = min(1, targetTokens·weight_s / tokens_s)
    * and rows pass the same portable hash gate as [[sampleByHash]] — so the
    * mix is deterministic across reruns and engines, membership never
    * depends on other rows, and a source whose corpus is SMALLER than its
    * requested share is kept whole (rate clamps at 1; the budget shortfall
    * is the signal to upsample separately, not to silently over-draw the
    * others). Sources absent from `weights` are excluded — the mixture
    * DEFINES the output corpus.
    *
    * Scale shape: one map-side-combined per-source token aggregate (rows =
    * #sources), broadcast back onto the corpus for a narrow hash-gate
    * filter — the corpus itself is scanned, never shuffled; the gate-side
    * scan prunes to (id, source, payload) since token counts only feed the
    * tiny totals branch. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      tokens: Column, weights: Seq[(String, Double)], targetTokens: Long,
      seed: Long = 42): DataFrame = {
    require(weights.nonEmpty, "mixtureSample needs at least one source weight")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(targetTokens >= 1, s"targetTokens must be >= 1, got $targetTokens")
    val sp = df.sparkSession
    import sp.implicits._
    val w = weights.toDF(sourceCol, "__wt")
    val rates = df.groupBy(sourceCol).agg(sum(tokens).as("__toks"))
      .join(w, sourceCol)
      .select(col(sourceCol),
        least(lit(1.0), (lit(targetTokens.toDouble) * col("__wt")) /
          col("__toks").cast("double")).as("__rate"))
    df.join(broadcast(rates), sourceCol)
      .where(hashBucket(col(idCol), seed) <
        floor(col("__rate") * lit(Buckets.toDouble)).cast("long"))
      .drop("__rate")
  }
}
