package graft.operators

import org.apache.spark.sql.DataFrame
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
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    Seq("cnt", "share", "rank").foreach { c =>
      require(!df.columns.contains(c) || c == keyCol,
        s"keySkew adds a '$c' column but the input already has one")
    }
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__graft_total"))
    val top = counts.orderBy(col("cnt").desc, col(keyCol).asc).limit(topN)
    top.join(broadcast(total))
      .withColumn("share",
        col("cnt").cast("double") / col("__graft_total").cast("double"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col(keyCol).asc))
          .cast("long"))
      .drop("__graft_total")
  }
}
