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

  test("HLL estimate lands within the m=256 error envelope; small sets take linear counting") {
    // sf0.01: 150 distinct users per event type — far below 2.5m = 640, so
    // every group takes the LINEAR-COUNTING branch, whose error at V≈m·e^(-n/m)
    // is a couple percent; grant ±10% for hash non-uniformity
    val est = Sketches.hllDistinct(
        graft.sources.EventsAdapter.rawEvents(spark, "/root/testdata/sf0.01")
          .select(col("event_type"), col("user_id")),
        Seq("event_type"), col("user_id"), p = 8)
      .as[(String, Long)].collect().toMap
    assert(est.size == 5)
    est.foreach { case (t, e) =>
      assert(math.abs(e - 150.0) / 150.0 <= 0.10,
        s"linear-counting estimate for $t out of envelope: $e vs true 150")
    }
    // a large set exercises the RAW branch (V = 0 long before n = 2.5m):
    // standard error 1.04/√256 = 6.5%, 4σ envelope ±26%
    val big = (1L to 20000L).map(i => ("g", i)).toDF("g", "id")
    val bigEst = Sketches.hllDistinct(big, Seq("g"), col("id"), p = 8)
      .as[(String, Long)].collect().head._2
    assert(math.abs(bigEst - 20000.0) / 20000.0 <= 0.26,
      s"raw-branch estimate out of envelope: $bigEst vs true 20000")
  }

  test("HLL registers merge by per-bucket max: union sketch == merged shard sketches") {
    val h = graft.functions.HashExpressions.polyHash64(col("id").cast("string"))
    val shard1 = (1L to 700L).map(i => ("g", i)).toDF("g", "id")
    val shard2 = (500L to 1200L).map(i => ("g", i)).toDF("g", "id")
    val merged = Sketches.hllRegisters(shard1, Seq("g"), h, p = 8)
      .unionByName(Sketches.hllRegisters(shard2, Seq("g"), h, p = 8))
      .groupBy("g", "__b").agg(max("reg").as("reg"))
      .as[(String, Long, Int)].collect().toSet
    val whole = Sketches.hllRegisters(shard1.unionByName(shard2), Seq("g"), h, p = 8)
      .as[(String, Long, Int)].collect().toSet
    assert(merged == whole, "max-merged shard registers must equal the union's registers")
  }

  test("AMS F2 estimate brackets the exact self-join size; invariant to partitioning") {
    val ev = graft.sources.EventsAdapter.rawEvents(spark, "/root/testdata/sf0.01")
      .select(col("user_id"))
    val exact = ev.groupBy("user_id").count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    val est = Sketches.amsF2(ev, col("user_id")).as[Long].head()
    assert(est >= (exact * 0.4).toLong && est <= (exact * 1.6).toLong,
      s"F2 estimate $est outside the medians-of-means envelope of exact $exact")
    // counter sums are exact associative longs: any partitioning, same value
    val est2 = Sketches.amsF2(ev.repartition(13), col("user_id")).as[Long].head()
    assert(est2 == est, s"estimate must be partition-invariant: $est2 vs $est")
  }

  test("Count-Min: estimates never undercount, and are exact sans collisions") {
    // skewed stream: key k occurs k times, keys 1..40, w=32 forces collisions
    val rows = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("id")
    val truth = (1L to 40L).map(k => k -> k).toMap
    val cms = Sketches.cmsBuild(rows, col("id"), d = 4, w = 32)
    val probes = (1L to 40L).toDF("id")
    val est = Sketches.cmsEstimate(cms, probes, "id", d = 4, w = 32)
      .as[(Long, Long)].collect().toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS undercounted key $k: ${est(k)} < $t")
    }
    // a wide sketch (no collisions possible across 40 keys in w=4096 with
    // 4 independent rows — verified by the assertion itself) is exact
    val wide = Sketches.cmsEstimate(
      Sketches.cmsBuild(rows, col("id"), d = 4, w = 4096), probes, "id",
      d = 4, w = 4096).as[(Long, Long)].collect().toMap
    assert(wide == truth, "wide CMS should be exact on 40 keys")
    // unqueried key (never inserted): min cell may collide but the 4 rows
    // give it 4 chances to hit an empty cell
    val absent = Sketches.cmsEstimate(cms, Seq(999999L).toDF("id"), "id",
      d = 4, w = 32).as[(Long, Long)].collect().head._2
    assert(absent >= 0L)
  }

  test("Count-Min sketches merge by cell-wise addition") {
    val a = (1L to 20L).toDF("id")
    val b = (10L to 30L).toDF("id")
    val both = (1L to 20L).union(10L to 30L).toDF("id")
    val merged = Sketches.cmsBuild(a, col("id"), 4, 32)
      .unionByName(Sketches.cmsBuild(b, col("id"), 4, 32))
      .groupBy("r", "b").agg(sum("cnt").as("cnt"))
    val direct = Sketches.cmsBuild(both, col("id"), 4, 32)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d = direct.as[(Int, Long, Long)].collect().toSet
    assert(m == d, "merged sketch must equal the sketch of the union stream")
  }
}
