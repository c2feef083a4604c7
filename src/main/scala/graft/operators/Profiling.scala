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
}
