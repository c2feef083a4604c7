package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall measurement at production parameters (Test/runMain
  * graft.RecallBench [sfDir] [nQueries]): recall@10 of every approximate
  * search family against bruteForceTopK ground truth over the embeddings
  * table — the measured basis for SCALE.md's nProbe/nLists/codebook recipe
  * (round-11 verdict task #3: "residual PQ exists to improve recall; prove
  * it"). Prints one line per configuration:
  *
  *   [recall] ivf nProbe=4 recall@10=0.873 (1745/2000) 1.2s
  *
  * Recall@10 = |approx ∩ truth| / |truth| over (query_id, neighbor_id)
  * pairs, truth = exact cosine top-10. Driver-side set intersection — the
  * pair sets are nQueries·10 rows, config-scale. */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nQueries = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < nQueries)
    val k = 10

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairs(Similarity.bruteForceTopK(queries, emb, k))
    println(s"[recall] truth pairs=${truth.size} (queries=$nQueries, k=$k)")

    def measure(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = pairs(df)
      val hit = (got & truth).size
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[recall] $name recall@10=${hit.toDouble / truth.size}%.3f " +
        f"($hit/${truth.size}) $secs%.1fs")
      spark.catalog.clearCache()
    }

    for (nProbe <- Seq(1, 2, 4, 8))
      measure(s"ivf nLists=16 nProbe=$nProbe")(
        Similarity.ivfTopK(queries, emb, k, nLists = 16, nProbe = nProbe))
    measure("ivf_kmeans nLists=16 nProbe=4 rounds=2")(
      Similarity.ivfTopKWith(queries, emb, k,
        Similarity.kmeansCentroids(emb, 16, rounds = 2), nProbe = 4))
    measure("pq m=8 ksub=16 (sampled books)")(
      Similarity.pqTopK(queries, emb, k, m = 8, ksub = 16))
    measure("pq_kmeans m=8 ksub=16 rounds=2")(
      Similarity.pqTopKWith(queries, emb, k,
        Similarity.pqCodebooksKmeans(emb, 8, 16, rounds = 2)))
    for (nProbe <- Seq(2, 4, 8))
      measure(s"ivfpq flat nLists=16 nProbe=$nProbe m=8")(
        Similarity.ivfPqTopK(queries, emb, k,
          nLists = 16, nProbe = nProbe, m = 8, ksub = 16))
    for (nProbe <- Seq(2, 4, 8))
      measure(s"ivfpq residual nLists=16 nProbe=$nProbe m=8 ksub=16")(
        Similarity.ivfPqTopKResidual(queries, emb, k,
          nLists = 16, nProbe = nProbe, m = 8, ksub = 16))
    // codebook-resolution axis: 6-bit (ksub=64) books at the same m
    measure("pq m=8 ksub=64 (sampled books)")(
      Similarity.pqTopK(queries, emb, k, m = 8, ksub = 64))
    measure("pq_kmeans m=8 ksub=64 rounds=2")(
      Similarity.pqTopKWith(queries, emb, k,
        Similarity.pqCodebooksKmeans(emb, 8, 64, rounds = 2)))
    measure("ivfpq flat nLists=16 nProbe=8 m=8 ksub=64")(
      Similarity.ivfPqTopK(queries, emb, k,
        nLists = 16, nProbe = 8, m = 8, ksub = 64))
    measure("ivfpq residual nLists=16 nProbe=8 m=8 ksub=64")(
      Similarity.ivfPqTopKResidual(queries, emb, k,
        nLists = 16, nProbe = 8, m = 8, ksub = 64))
    // cell-resolution axis: finer cells (nLists=64) shrink the residuals —
    // the regime residual encoding is built for
    measure("ivfpq flat nLists=64 nProbe=32 m=8 ksub=16")(
      Similarity.ivfPqTopK(queries, emb, k,
        nLists = 64, nProbe = 32, m = 8, ksub = 16))
    measure("ivfpq residual nLists=64 nProbe=32 m=8 ksub=16")(
      Similarity.ivfPqTopKResidual(queries, emb, k,
        nLists = 64, nProbe = 32, m = 8, ksub = 16))
    // subspace-count axis: m=16 (4-dim subspaces) at 4-bit books
    measure("pq m=16 ksub=16 (sampled books)")(
      Similarity.pqTopK(queries, emb, k, m = 16, ksub = 16))
    measure("pq_kmeans m=16 ksub=16 rounds=2")(
      Similarity.pqTopKWith(queries, emb, k,
        Similarity.pqCodebooksKmeans(emb, 16, 16, rounds = 2)))
    // binary-sign axis: 1-bit hamming candidates + exact rerank — how big a
    // rerank budget buys back exactness at 512× compression
    for (rr <- Seq(16, 32, 64, 128))
      measure(s"binary-sign rerank=$rr")(
        Similarity.binaryTopK(queries, emb, k, rerank = rr))
    // dimensionality-reduction axis: exact search in PCA-reduced space —
    // how much recall does a 2×/4×/8× cheaper vector buy?
    for (r <- Seq(8, 16, 32)) {
      val (mu, comps) = Similarity.pcaFit(emb, "embedding", k = r, iters = 30)
      val red = Similarity.pcaProject(emb, "vec_id", "embedding", mu, comps)
        .select(col("vec_id"),
          array((1 to r).map(i => col(s"p$i").cast("float")): _*).as("embedding"))
      measure(s"pca r=$r brute force")(
        Similarity.bruteForceTopK(red.filter(col("vec_id") < nQueries), red, k))
    }
    spark.stop()
  }
}
