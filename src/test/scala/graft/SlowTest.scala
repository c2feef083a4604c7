package graft

/** Tag for tests excluded from the CORE test tier (bench-style sweeps,
  * multi-round golden streams, whole-corpus learners) — the suite analog of
  * `SparkEntry.coreTier`. `SPARK_GRAFT_TEST_TIER=core sbt test` excludes
  * these (build.sbt wires the `-l` argument); plain `sbt test` runs
  * everything. Tag a test only if it costs ≳2 s AND the code path keeps a
  * faster correctness check somewhere — a quicker test in the core tier or
  * the per-round DuckDB oracle gate — so the core tier stays a real gate,
  * not a smoke test. */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
