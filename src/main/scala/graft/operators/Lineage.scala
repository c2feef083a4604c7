package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Shared lineage-truncation for iterative operators (pageRank, label
  * propagation, connected components, the pipeline survivor set): every
  * generation of an iterative frontier must be MATERIALIZED eagerly, or the
  * logical plan doubles per round (the frontier feeds the next round's plan
  * twice) and Catalyst analysis alone OOMs the driver on deep graphs.
  *
  * Executor-loss contract: when the context has a checkpoint dir
  * (`SparkContext.setCheckpointDir` / `spark.checkpoint.dir`), the
  * materialization is a RELIABLE `checkpoint(true)` — blocks land on the
  * checkpoint filesystem and survive executor loss, which is the setting to
  * use on preemptible / dynamic-allocation clusters where a 50-round
  * iteration WILL see an executor die. Without one it falls back to
  * `localCheckpoint(true)`: blocks live only in executor storage with no
  * recomputation path, so losing an executor mid-loop fails the job — fine
  * for local mode and tests, not for a 1000-executor run.
  *
  * File lifecycle: reliable checkpoint files are only auto-deleted under
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default false);
  * long-running drivers should set that or clean the dir between jobs.
  * localCheckpoint blocks release via the ContextCleaner as superseded
  * generations go out of scope. */
private[graft] object Lineage {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** [[materialize]] plus aggregate metrics computed IN THE SAME job via
    * `Dataset.observe` (CollectMetricsExec is a pass-through node whose
    * accumulators ride the materialization action) — an iterative round's
    * convergence probe (changed-count, frontier size, survivor count) no
    * longer pays a SECOND driver action re-scanning what the round just
    * wrote. r17 left every loop at two-to-three blocking jobs per round
    * (materialize + probe); at loop scale the probe job is pure fixed
    * overhead — task scheduling + BSP job latency, zero useful bytes.
    *
    * Returns the materialized frame and the observed metric row as a map
    * (`Observation.get` blocks until the action's QueryExecutionListener
    * delivers — the materialization above already completed it). Metrics
    * must be aggregate expressions over the frame, each aliased. */
  def materializeObserved(df: DataFrame, metrics: Column*): (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val out = materialize(df.observe(obs, metrics.head, metrics.tail: _*))
    (out, obs.get)
  }

  /** Run an iterative operator's rounds with `spark.sql.shuffle.partitions`
    * pinned to a partition count derived from the MEASURED problem size,
    * restoring the session setting afterwards:
    *
    *   p = clamp(ceil(rows / rowsPerPartition), 1, session setting)
    *
    * Rationale (optimization guide §2.2 "fewer, larger reduce partitions"):
    * every round of a loop pays its exchanges, its eager materialization
    * and its convergence probe PER PARTITION, and the loop state (ranks,
    * labels, frontiers) is graph-sized, not corpus-sized — r17 profiling
    * measured graph_pagerank spending 153 s of summed task time across
    * 1 824 tasks on a graph of a few hundred nodes (≈ 85 ms of pure
    * scheduling/serialization overhead per near-empty task), dropping to
    * 2.4 s once the rounds ran at a size-appropriate partition count. AQE
    * cannot make this choice here: coalescing is per-exchange byte-based
    * and parallelism-first, so every tiny loop exchange stays at the core
    * count, every round, forever.
    *
    * Scale safety: the session (cluster) setting is the UPPER bound — a
    * production session tuned for the cluster is never exceeded, and a
    * billion-node graph clamps straight to it; only when the measured
    * state is small does the loop stop paying (session partitions ×
    * rounds) of fixed overhead. The count that feeds `rows` is a driver
    * scalar the iterative operators already compute (node count,
    * materialized edge count), never an extra corpus pass. */
  def withLoopPartitions[T](spark: org.apache.spark.sql.SparkSession,
      rows: Long, rowsPerPartition: Long = 500000L)(body: => T): T =
    withShufflePartitions(spark, loopPartitions(spark, rows, rowsPerPartition))(body)

  /** Alias kept deliberately thin: an r18 experiment tried disabling AQE
    * inside size-clamped loops through the same thread-local conf, but
    * `InsertAdaptiveSparkPlan` resolves `spark.sql.adaptive.enabled` from
    * the SESSION conf, not the thread-local SQLConf, so the toggle never
    * took effect (job counts byte-identical in the A/B) — and disabling AQE
    * globally made every loop query WORSE (task-time inflation from
    * uncoalesced 32-way trivial stages; same finding as r17's rejected
    * `parallelismFirst=false`). Only the partition override goes through. */
  def withLoopConf[T](spark: org.apache.spark.sql.SparkSession,
      loopP: Int)(body: => T): T =
    withShufflePartitions(spark, loopP)(body)

  /** The clamp alone: size-derived loop partition count, session setting as
    * the upper bound. Exposed so callers can SKIP the re-anchoring
    * repartition of their persisted edge relation when the clamp lands on
    * the session setting anyway (re-anchoring then would be a same-count
    * reshuffle of the operator's biggest relation — pure waste at
    * production scale, where the clamp is expected to hit the bound). */
  def loopPartitions(spark: org.apache.spark.sql.SparkSession,
      rows: Long, rowsPerPartition: Long = 500000L): Int = {
    val prev = effectiveShufflePartitions(spark)
    math.max(1L, math.min(prev.toLong,
      (math.max(rows, 0L) + rowsPerPartition - 1) / rowsPerPartition)).toInt
  }

  /** The shuffle-partition setting THIS THREAD's plans resolve right now:
    * the thread-local override installed by [[withShufflePartitions]] when
    * inside one (nested loops clamp against the enclosing loop's width, the
    * r17 semantics), the session setting otherwise. */
  def effectiveShufflePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.sql.shuffle.partitions",
        spark.conf.get("spark.sql.shuffle.partitions")).toInt

  /** Run `body` with spark.sql.shuffle.partitions = `p` via a THREAD-LOCAL
    * SQLConf override (`SQLConf.withExistingConf` over a clone of the
    * effective conf): planning of every action issued by this thread inside
    * `body` resolves the override, while concurrent queries on other
    * threads of the same session keep the session setting — the r17
    * implementation mutated the session-global conf and would have silently
    * mis-partitioned a concurrent query (ADVICE r17; ThreadSafetySpec pins
    * the isolation). The thread-local is restored on exit either way.
    *
    * Caveat unchanged from r17: a LAZY frame returned out of `body` binds
    * its exchanges at the CALLER's action, outside the override — loops
    * that need the override on their output materialize it inside (the
    * pipeline_e2e tail pattern). */
  def withShufflePartitions[T](spark: org.apache.spark.sql.SparkSession,
      p: Int)(body: => T): T = {
    val cloned = org.apache.spark.sql.internal.SQLConf.get.clone()
    cloned.setConfString("spark.sql.shuffle.partitions", p.toString)
    org.apache.spark.sql.internal.SQLConf.withExistingConf(cloned)(body)
  }
}
