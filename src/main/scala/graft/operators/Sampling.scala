package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: hash-Bernoulli
  * sampling, reproducible train/val/test splits, and per-key quota capping.
  *
  * All decisions derive from a portable modular hash of the row id — the same
  * row is selected on every run, on every engine (the arithmetic is chosen to
  * stay inside 63-bit range so SQL engines with checked overflow compute the
  * identical value), and adding rows never flips existing assignments. Each
  * operator is a narrow map except the quota cap (one shuffle on the key).
  */
object Sampling {

  /** Portable Knuth-style multiplicative hash into [0, Buckets). Bit-for-bit
    * reproducible in ANSI SQL (pmod spelled ((x % m) + m) % m for engines
    * whose % keeps the dividend's sign); all intermediates stay inside 63
    * bits so checked-overflow engines agree. Two coprime-modulus folds keep
    * assignments independent up to id periods of lcm(1000003, 999983) ≈ 1e12
    * (a single fold would co-sample ids exactly 1000003 apart). */
  val Buckets = 9973L
  private val M1 = 1000003L
  private val M2 = 999983L
  def hashBucket(id: Column, seed: Long): Column =
    pmod(pmod(id, lit(M1)) * 2654435761L + pmod(id, lit(M2)) * 2654435741L + lit(seed),
      lit(Buckets))

  /** Keep ~rate of rows, chosen by id hash — stable under reruns and data
    * growth (a row's fate never depends on other rows). */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double, seed: Long = 42): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(col(idCol), seed) < (rate * Buckets).toLong)
  }

  /** Reproducible split into named fractions (e.g. train 0.9 / val 0.05 /
    * test 0.05): adds a `split` column. Fractions must sum to ≤ 1; any hash
    * remainder falls into the LAST split. */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      seed: Long = 42): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    val h = hashBucket(col(idCol), seed)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * Buckets).toLong)
    val assignment = splits.init.zip(cuts.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cut), rest) =>
      when(h < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assignment)
  }

  /** At most `n` rows per key, chosen deterministically by id-hash order
    * (tie-break by id) — the "cap any single source" operator. The only
    * shuffle is the window partition on the key; Spark's WindowGroupLimit
    * pushes a partial top-n below the exchange. */
  def quotaPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      seed: Long = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), seed).asc, col(idCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }
}
