package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch semantics beyond the oracle rows: estimator accuracy against
  * known truth, and the overlap estimator's exactness at the boundaries
  * (identical sets → 1.0, disjoint sets → 0.0 — boundary cases where the
  * resemblance estimator has zero variance, so exact assertion is sound). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV estimate lands within the k=64 error envelope of the true 150") {
    // sf0.01 has exactly 150 distinct users per event type; RSE ≈ 1/√62 ≈
    // 12.6%, so a 3σ envelope is ±38% — a hash-uniformity regression (the
    // only moving part; the result is otherwise deterministic) would
    // blow far past it
    val est = Sketches.kmvDistinct(
        graft.sources.EventsAdapter.rawEvents(spark, "/root/testdata/sf0.01")
          .select(col("event_type"), col("user_id")),
        Seq("event_type"), col("user_id"), 64)
      .as[(String, Long)].collect().toMap
    assert(est.size == 5)
    est.foreach { case (t, e) =>
      assert(math.abs(e - 150.0) / 150.0 <= 0.38,
        s"estimate for $t out of envelope: $e vs true 150")
    }
  }

  test("overlap: identical sets estimate exactly 1.0, disjoint exactly 0.0") {
    val rows =
      (1L to 300L).map(i => ("a", i)) ++ (1L to 300L).map(i => ("b", i)) ++
        (1001L to 1300L).map(i => ("c", i))
    val got = Sketches.kmvOverlap(rows.toDF("g", "id"),
        "g", graft.functions.HashExpressions.polyHash64(col("id").cast("string")), 64)
      .select("g_a", "g_b", "n_union_k", "n_both", "jaccard_est")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", "b")) == ((64L, 64L, 1.0)),
      s"identical sets must overlap exactly: ${got(("a", "b"))}")
    assert(got(("a", "c"))._2 == 0L && got(("a", "c"))._3 == 0.0,
      s"disjoint sets must not overlap: ${got(("a", "c"))}")
    assert(got(("b", "c"))._1 == 64L, "union sketch must fill to k")
  }
}
