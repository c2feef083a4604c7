package graft

import graft.functions.FunctionCatalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The seven aggregate functions over hand-computed fixtures, including the
  * SURVEY.md §2.1 single-point and out-of-order edge cases, plus seeded
  * randomized checks against naive folds. */
class FunctionCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (value, tsMs) rows aggregated as one group; single partition so the
    * arrival-order modes see the Seq's order as the arrival order. */
  private def agg(fn: String, rows: Seq[(Double, Double)]): Double =
    rows.toDF("value", "ts_ms").coalesce(1)
      .agg(FunctionCatalog.aggregate(fn, col("value"), col("ts_ms")).as("v"))
      .as[Double].head()

  /** Nullable variant: rows may carry SQL NULL in either slot; returns None
    * when the aggregate itself evaluates to NULL. */
  private def aggOpt(fn: String, rows: Seq[(Option[Double], Option[Double])]): Option[Double] = {
    val r = rows.toDF("value", "ts_ms").coalesce(1)
      .agg(FunctionCatalog.aggregate(fn, col("value"), col("ts_ms")).as("v"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private val window = Seq((2.0, 1000.0), (6.0, 2000.0), (1.0, 3000.0))

  test("sum")   { assert(agg("sum", window) == 9.0) }
  test("count") { assert(agg("count", window) == 3.0) }
  test("avg")   { assert(agg("avg", window) == 3.0) }
  test("min")   { assert(agg("min", window) == 1.0) }
  test("max")   { assert(agg("max", window) == 6.0) }

  test("delta = last-by-event-time minus first-by-event-time") {
    assert(agg("delta", window) == -1.0) // 1.0 (ts 3000) - 2.0 (ts 1000)
  }

  test("delta is event-time ordered, not arrival ordered (§2.1.2)") {
    // same rows, shuffled arrival order — answer unchanged
    assert(agg("delta", window.reverse) == -1.0)
  }

  test("rate = delta per second over the observed span") {
    // (1.0 - 2.0) / ((3000 - 1000)/1000) = -0.5
    assert(agg("rate", window) == -0.5)
  }

  test("delta ties on equal timestamps break deterministically by value") {
    // (ts=1000: 3.0 and 7.0) — lexicographic (ts,value): first=3.0, last=7.0
    assert(agg("delta", Seq((3.0, 1000.0), (7.0, 1000.0), (5.0, 2000.0))) == 2.0)
    assert(agg("delta", Seq((7.0, 1000.0), (3.0, 1000.0), (5.0, 2000.0))) == 2.0)
  }

  test("single-point window: delta = 0 (not -v as in the reference, §2.1.1)") {
    assert(agg("delta", Seq((42.0, 1000.0))) == 0.0)
  }

  test("single-point window: rate = 0 (divide-by-zero guard, §2.1.1)") {
    assert(agg("rate", Seq((42.0, 1000.0))) == 0.0)
  }

  test("zero-span multi-point window: rate = 0") {
    assert(agg("rate", Seq((1.0, 1000.0), (9.0, 1000.0))) == 0.0)
  }

  test("delta/rate skip null values and null timestamps at the would-be bound") {
    // ValueAtTimeBound semantics (functions/TimeBoundValue.scala:60-64): a row
    // with a null value OR a null ts carries no ordering information and is
    // skipped, exactly like the null-skipping of the min/max built-ins. Here
    // the null-value row sits at the LATEST ts (3000) and a 9.0 row has a null
    // ts — neither may become the bound: last = 6.0 (ts 2000), first = 2.0.
    val rows = Seq((Some(2.0), Some(1000.0)), (Some(6.0), Some(2000.0)),
      (Option.empty[Double], Some(3000.0)), (Some(9.0), Option.empty[Double]))
    assert(aggOpt("delta", rows).contains(4.0))
    // rate's SPAN is min/max over non-null timestamps (ts 3000 counts even
    // though its value is null — the built-ins it composes skip only their own
    // null input): (6.0 − 2.0) / ((3000 − 1000)/1000)
    assert(aggOpt("rate", rows).contains(2.0))
    // one valid pair left after null-skipping → single-point semantics (§2.1.1)
    assert(aggOpt("delta",
      Seq((Some(5.0), Some(1000.0)), (Option.empty[Double], Some(2000.0)))).contains(0.0))
    // no valid (value, ts) pair at all → NULL, like min/max on an all-null column
    assert(aggOpt("delta",
      Seq((Option.empty[Double], Some(1000.0)), (Some(3.0), Option.empty[Double]))).isEmpty)
  }

  test("extension aggregates: stddev and interpolated percentiles") {
    val rows = Seq((1.0, 1.0), (2.0, 2.0), (3.5, 3.0), (10.0, 4.0), (7.0, 5.0))
    assert(math.abs(agg("stddev", rows) - 3.7349698793966195) < 1e-12)
    assert(agg("stddev", Seq((5.0, 1.0))) == 0.0) // n=1: no sample spread, not null
    assert(agg("p50", rows) == 3.5)
    // rank 3.8 → 7 + 0.8·(10−7); interpolation arithmetic may differ by an
    // ulp from the decimal-exact 9.4 (the oracle's safeRound2 absorbs this)
    assert(math.abs(agg("p95", rows) - 9.4) < 1e-12)
    assert(math.abs(agg("p99", rows) - (7.0 + 0.96 * 3.0)) < 1e-12) // rank 3.96
  }

  test("arrival-order bit-compat delta/rate replicate the reference exactly") {
    // arrival order differs from event-time order here: (6.0, ts 2000) arrives last
    val rows = Seq((2.0, 1000.0), (1.0, 3000.0), (6.0, 2000.0))
    assert(agg("delta_arrival", rows) == 4.0)  // last-arrived 6.0 − first 2.0
    assert(agg("delta", rows) == -1.0)         // event-time mode differs
    assert(agg("rate_arrival", rows) == 4.0 / ((2000.0 - 1000.0) / 1000.0))
    // single-point degenerates (SURVEY §2.1.1): delta → −v, rate → v·1000/ts
    assert(agg("delta_arrival", Seq((42.0, 1000.0))) == -42.0)
    assert(agg("rate_arrival", Seq((42.0, 1000.0))) == (0.0 - 42.0) / ((0.0 - 1000.0) / 1000.0))
  }

  test("unknown function is rejected") {
    intercept[IllegalArgumentException] {
      FunctionCatalog.aggregate("median", col("v"), col("t"))
    }
  }

  private def randomRows(rnd: scala.util.Random, n: Int): Seq[(Double, Double)] =
    Seq.fill(n)((rnd.between(-1e6, 1e6), rnd.between(0L, 10_000_000L).toDouble))

  test("randomized: sum/min/max/count/avg match naive folds", SlowTest) {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val rows = randomRows(rnd, 1 + rnd.nextInt(40))
      val vs = rows.map(_._1)
      assert(agg("count", rows) == vs.length.toDouble)
      assert(math.abs(agg("sum", rows) - vs.sum) <= math.max(1e-9, math.abs(vs.sum) * 1e-9))
      assert(agg("min", rows) == vs.min)
      assert(agg("max", rows) == vs.max)
      assert(math.abs(agg("avg", rows) - vs.sum / vs.length) <= 1e-6)
    }
  }

  test("randomized: delta matches event-time-sorted first/last") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val uniq = randomRows(rnd, 1 + rnd.nextInt(40)).distinctBy(_._2)
      val sorted = uniq.sortBy(_._2)
      val expected = sorted.last._1 - sorted.head._1
      assert(agg("delta", uniq) == expected)
    }
  }
}
