package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured proof of the SCALE.md bucketing claims: the snapshot-diff
  * full-outer join over two generations BUCKETED by the key plans with
  * ZERO exchanges (bucket-local join), and produces row-for-row the same
  * diff as the unbucketed plan. This is the storage-layout lever that turns
  * the per-refresh CDC cost from "shuffle both snapshots" into "stream
  * co-located buckets" at 100 TB. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed snapshot generations diff with zero exchanges, same rows", SlowTest) {
    val base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val oldSnap = base.filter(col("o_orderkey") % 7 =!= 0)
    val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 1.05)
          .otherwise(col("o_totalprice")))
    try {
      Seq(("graft_snap_old", oldSnap), ("graft_snap_new", newSnap)).foreach {
        case (t, df) => df.write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable(t)
      }
      val bucketed = Snapshot.diff(
        spark.table("graft_snap_old"), spark.table("graft_snap_new"),
        "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed diff must join bucket-locally, no shuffle:\n$plan")
      // NOTE a per-bucket Sort remains: sortBy orders each written FILE,
      // and Spark only elides the SMJ sort when a bucket is a single file —
      // with multiple writer tasks per bucket it must merge them. The
      // shuffle (the 100 TB cost) is what bucketing removes; the residual
      // sort streams over already-clustered runs.
      assert(plan.contains("SortMergeJoin"),
        s"expected a bucket-local sort-merge join:\n$plan")
      val unbucketed = Snapshot.diff(oldSnap, newSnap, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: the unbucketed diff does shuffle")
      val a = bucketed.collect().map(_.toSeq).toSet
      val b = unbucketed.collect().map(_.toSeq).toSet
      assert(a == b, "bucketed and unbucketed diffs must agree row-for-row")
      assert(a.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_snap_old")
      spark.sql("DROP TABLE IF EXISTS graft_snap_new")
    }
  }
}
