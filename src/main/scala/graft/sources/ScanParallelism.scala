package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive parallelism floor for base-table scans (optimization
  * guide §2.6 idle capacity / §6 input splits).
  *
  * The bench-scale inputs are single parquet files with a single row group,
  * so a scan plans as ONE partition and every narrow operator above it
  * (tokenize+explode, JSON round-trips, codec walks, hash chains) runs on
  * one core while the rest of local[N] idles — r17 profiling measured
  * s2_json_roundtrip spending 4.9 s of its 5.1 s wall inside one 1-task
  * stage, and the same single-task scan stage under the heavy broadcast
  * builds of eval_retrieval (5.7 s) and dedup_cosine (3.9 s). When the scan
  * would plan fewer partitions than the session's default parallelism,
  * round-robin repartition up to it; Catalyst pushes filters and column
  * pruning below a Repartition, so the exchange carries the pruned scan
  * output. Row-to-partition assignment is retry-deterministic
  * (spark.sql.execution.sortBeforeRepartition, on by default), and no
  * declared query's result depends on partitioning: double outputs ride
  * the epsilon-shifted rounds, orders ride explicit sort keys, and
  * collect_list aggregates are always wrapped in array_sort (r17 audit).
  *
  * The split count is ESTIMATED from the input's filesystem length against
  * spark.sql.files.maxPartitionBytes — never by planning the DataFrame: the
  * first r17 floor asked `df.rdd.getNumPartitions`, which runs the whole
  * analysis/optimization/planning pipeline per call, and with 140 reader
  * call sites that surfaced as a uniform +0.6–0.9 s driver-time tax on
  * every light docs-based query in the full sweep (the win on the heavy
  * queries stayed, but the tail gave most of it back). One FileSystem
  * length lookup is ~1 ms and equally scale-correct.
  *
  * At production scale this is a NO-OP by construction: a 100 TB table's
  * estimated split count is ≥ cores, the condition is false, and no shuffle
  * is added — the floor only fires when input SPLITS, not data, are the
  * parallelism bound (the one-big-gzip shape of guide §2.5's "input skew";
  * the fix there is the same repartition-after-read). */
object ScanParallelism {
  def flooredParquet(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val p = spark.sparkContext.defaultParallelism
    if (estimatedSplits(spark, path) < p) df.repartition(p) else df
  }

  /** ceil(total input bytes / maxPartitionBytes), the planner's split-count
    * estimate to first order (openCostInBytes packing refines it upward,
    * which could only make the floor fire LESS — never spuriously).
    *
    * Single files take the one-RPC `getFileStatus` path; only directories
    * pay `getContentSummary` (a recursive listing on object stores —
    * O(children), fine for the table layouts here but not free). An
    * unreadable input short-circuits to "no floor" BEFORE the ceiling
    * arithmetic: r17 folded the Long.MaxValue sentinel into
    * `(bytes + maxSplit - 1)`, which overflows negative and made the floor
    * fire — the exact inverse of the documented intent (ADVICE r17). */
  private[graft] def estimatedSplits(spark: SparkSession, path: String): Long = {
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes =
      try {
        val st = fs.getFileStatus(hPath)
        if (st.isFile) st.getLen else fs.getContentSummary(hPath).getLength
      } catch { case _: java.io.IOException => -1L } // unknowable → no floor
    if (bytes < 0) Long.MaxValue
    else math.max(1L, bytes / math.max(1L, maxSplit) +
      (if (bytes % math.max(1L, maxSplit) == 0) 0L else 1L))
  }
}
