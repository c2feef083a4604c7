package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`).
  *
  * Two physical strategies:
  *  - [[bruteForceTopK]]: broadcast the (small) query set, scan the corpus
  *    once, per-query top-k. The corpus is never shuffled — at 100 TB this is
  *    a single narrow pass; only the tiny (query × k) result moves.
  *  - [[lshBucketedPairs]] / [[lshBucketedTopK]]: random-hyperplane LSH
  *    buckets turn the all-pairs problem into an equi-join on bucket id —
  *    the scale path when the query set IS the corpus.
  *
  * Vector math is done with codegen'd higher-order functions
  * (`zip_with`/`aggregate`) in double precision — no UDFs.
  */
object Similarity {

  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector, brute force.
    *
    * `queries` is broadcast (assert it's small); the corpus side stays
    * partition-local until the final per-query top-k, which shuffles only
    * (nQueries × corpusPartitions × k) candidate rows thanks to the
    * partial top-k pushed below the window by Spark's
    * `WindowGroupLimit`/TopK optimization on `row_number <= k`. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic pseudo-random unit hyperplanes (seeded), built at
    * plan-construction time and shipped as a literal — reproducible across
    * runs and executors. */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the projection). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Candidate pairs that share at least one of `tables` independent LSH
    * bucketings, verified with exact cosine ≥ threshold. Equi-join on
    * (table, bucket) — never enumerates the O(n²) pair space. */
  def lshBucketedPairs(emb: DataFrame, threshold: Double, nPlanes: Int = 12,
      tables: Int = 4, dim: Int = 64, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
    val bucketStructs = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(col("v"), hyperplanes(nPlanes, dim, seed + t)).as("bucket"))
    }
    val banded = v.select(col("id"), col("v"), explode(array(bucketStructs: _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.tbl"), col("bb.bucket"))
    val l = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = banded.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
