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

  /** Deterministic mixture-of-Gaussians corpus (round-12 verdict task #4):
    * the fixture's embeddings are ISOTROPIC — the provable worst case for
    * every ANN family (IVF cells are arbitrary Voronoi shards, PQ subspaces
    * carry no structure, PCA has no dominant directions), so recall numbers
    * measured there are lower bounds, not parameter guidance. Real encoder
    * output is heavily clustered; this corpus models it: `kCenters` unit-
    * scale Gaussian centers (per-center seeded RNG), each vector = its
    * center (id mod kCenters — queries then cover every center) plus
    * per-dim N(0, sigma) noise from an id-seeded RNG. Same id, same seed →
    * same vector on any run or partitioning. Intra-cluster cosine ≈
    * 1/(1+sigma²), inter ≈ 0, so sigma sweeps the clusteredness axis. */
  def clusteredCorpus(spark: SparkSession, n: Long, d: Int, kCenters: Int,
      sigma: Double, seed: Long = 42): DataFrame = {
    import spark.implicits._
    val centers = Array.tabulate(kCenters) { c =>
      val rng = new scala.util.Random(seed * 1000003L + c)
      Array.fill(d)(rng.nextGaussian())
    }
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val c = (id % kCenters).toInt
        val rng = new scala.util.Random(seed ^ (id * 0x9E3779B97F4A7CL))
        val v = Array.tabulate(d)(j =>
          (bc.value(c)(j) + sigma * rng.nextGaussian()).toFloat)
        (id, v, c)
      }
    }.toDF("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nQueries = if (args.length > 1) args(1).toInt else 50
    // corpus axis: "iso" = the fixture's isotropic embeddings (worst-case
    // bound); "clustered[:sigma]" = the mixture-of-Gaussians model above
    // (the regime parameter advice must come from)
    val corpus = if (args.length > 2) args(2) else "iso"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fixture = spark.read.parquet(s"$dir/embeddings.parquet")
    val emb = (corpus.split(":") match {
      case Array("iso") => fixture
      case Array("clustered") =>
        clusteredCorpus(spark, fixture.count(), 64, 32, 0.3)
      case Array("clustered", s) =>
        clusteredCorpus(spark, fixture.count(), 64, 32, s.toDouble)
      case other => throw new IllegalArgumentException(
        s"corpus must be iso|clustered[:sigma], got '${other.mkString(":")}'")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[recall] corpus=$corpus rows=${emb.count()}")
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
