package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine boundary-stable decimal rounding.
  *
  * Spark's `round()` (BigDecimal HALF_UP on the exact binary value) and
  * DuckDB's `ROUND` (multiply-based) can disagree when the value sits within
  * an ulp of a `.…5` decimal boundary — and any column derived from a
  * transcendental (`ln`/`log`/`exp`: each engine's libm is a ≤1-ulp
  * implementation, not THE correctly-rounded one) can land there on one box
  * and not another. `floor(x·10^d + 0.499999)` moves the decision boundary
  * 1e-6 off the decimal lattice: cross-engine noise is ~1e-11 · x while the
  * shifted boundary is ≥ ~1e-6/10^d away from any lattice point, so both
  * engines always agree. The DuckDB mirror of this expression is
  * `SparkEntry.sqlRound4` — the two must move together.
  *
  * This is the round-14 retirement of the plain-`round`-over-transcendental
  * class (the `text_pmi` r13 hash flake): every oracle-compared column whose
  * expression contains `ln`/`log`/`exp` must round through here.
  */
object StableRound {

  /** Boundary-stable 4-decimal rounding (see object doc). */
  def round4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.499999)) / lit(10000.0)

  /** Boundary-stable 2-decimal rounding — same contract as
    * `SparkEntry.safeRound2`/`sqlRound2`. */
  def round2(c: Column): Column =
    floor(c * lit(100.0) + lit(0.499999)) / lit(100.0)
}
