package graft.sources

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for base-table scans (optimization
  * guide §2.6 idle capacity / §6 input splits).
  *
  * The bench-scale inputs are single parquet files with a single row group,
  * so a scan plans as ONE partition and every narrow operator above it
  * (tokenize+explode, JSON round-trips, codec walks, hash chains) runs on
  * one core while the rest of local[N] idles — r17 profiling measured
  * s2_json_roundtrip spending 4.9 s of its 5.1 s wall inside one 1-task
  * stage, and the same single-task scan stage under the heavy broadcast
  * builds of eval_retrieval (5.7 s) and dedup_cosine (3.9 s). When the
  * planned scan has fewer partitions than the session's default
  * parallelism, round-robin repartition up to it; Catalyst pushes filters
  * and column pruning below a Repartition, so the exchange carries the
  * pruned scan output. Row-to-partition assignment is retry-deterministic
  * (spark.sql.execution.sortBeforeRepartition, on by default), and no
  * declared query's result depends on partitioning: double outputs ride
  * the epsilon-shifted rounds, orders ride explicit sort keys, and
  * collect_list aggregates are always wrapped in array_sort (r17 audit).
  *
  * At production scale this is a NO-OP by construction: a 100 TB table
  * scans as thousands of splits (>= cores), the condition is false, and no
  * shuffle is added — the floor only fires when input SPLITS, not data,
  * are the parallelism bound (the one-big-gzip shape of guide §2.5's
  * "input skew": fix is the same repartition-after-read). */
object ScanParallelism {
  def floor(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
