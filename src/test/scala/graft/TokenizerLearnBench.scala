package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampled tokenizer-learning probe (Test/runMain graft.TokenizerLearnBench
  * [sfDir] [rounds]) — the measured basis for SCALE.md's production-scale
  * learning recipe (round-14 verdict task #2): the one-merge-per-round loop
  * is the published algorithm, but R≈30k merges = 30k Spark jobs, so the
  * 100 TB recipe is "learn on a hash sample, verify the merge table is
  * stable". This probe measures BOTH halves on the real corpus:
  *
  *   - wall time of the full-corpus learn (the post-persist-fix cost), and
  *   - merge-table agreement of hash-sampled learns (50%, 25%, 10%) against
  *     the full-corpus table: prefix agreement (ranks identical from rank 1
  *     before the first divergence — what an apply chain actually consumes,
  *     since one divergent merge shifts everything after it) and set
  *     agreement (|sampled ∩ full| pairs, rank-blind).
  *
  * Sampling is the deterministic hash gate every sampler in the repo uses
  * (portable xxhash64 on doc_id), so the sampled learn is reproducible on
  * any engine/partitioning. Prints one line per configuration:
  *
  *   [tok] wordpiece rate=0.50 rounds=10 time=3.2s prefix=10/10 set=10/10
  */
object TokenizerLearnBench {

  private def agree(full: Seq[(String, String)], s: Seq[(String, String)])
      : (Int, Int) = {
    val prefix = full.zip(s).takeWhile { case (a, b) => a == b }.size
    val set = full.toSet.intersect(s.toSet).size
    (prefix, set)
  }

  private def collectMerges(df: DataFrame): Seq[(String, String)] =
    df.orderBy("rank").collect().toSeq
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // JVM/codegen warmup on the small SF so the first timed run isn't cold
    TextAnalysis.bpeLearnMerges(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")), 3).collect()

    // production-R probe of the DRIVER-LOCAL loop (round 15): the reduction
    // is one distributed aggregation, the rounds are driver CPU — measure
    // deep-R wall time directly (this is the R≈30k recipe's evidence)
    if (args.contains("local")) {
      for (wordpiece <- Seq(false, true); r <- Seq(100, 1000, 5000)) {
        val fam = if (wordpiece) "wordpiece" else "bpe"
        val t0 = System.nanoTime()
        val n = TextAnalysis
          .subwordLearnMergesLocal(docs, r, "text", wordpiece)
          .count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[tok-local] $fam rounds=$r learned=$n time=$t%.2fs")
      }
      spark.stop()
      return
    }

    // A/B of the per-round persist (round-15 fix) before the sampling sweep
    for (wordpiece <- Seq(false, true); p <- Seq(true, false)) {
      val fam = (if (wordpiece) "wordpiece" else "bpe") +
        (if (p) "+persist" else "-persist")
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        TextAnalysis.subwordLearnMerges(docs, rounds, "text", wordpiece, p)
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tok] $fam rounds=$rounds time=${ts.min}%.2fs")
    }

    for (wordpiece <- Seq(false, true)) {
      val fam = if (wordpiece) "wordpiece" else "bpe"
      def learn(d: DataFrame): DataFrame =
        if (wordpiece) TextAnalysis.wordpieceLearnMerges(d, rounds)
        else TextAnalysis.bpeLearnMerges(d, rounds)
      // best of two timed runs — the Bench methodology, so the full-rate
      // line is comparable with the BENCH_r* record
      val t0 = System.nanoTime()
      val full = collectMerges(learn(docs))
      val tA = (System.nanoTime() - t0) / 1e9
      val t0b = System.nanoTime()
      collectMerges(learn(docs))
      val tFull = math.min(tA, (System.nanoTime() - t0b) / 1e9)
      println(f"[tok] $fam rate=1.00 rounds=$rounds time=$tFull%.2fs " +
        s"prefix=${full.size}/${full.size} set=${full.size}/${full.size}")
      for (pct <- Seq(50, 25, 10)) {
        val sampled = docs.filter(pmod(xxhash64(col("doc_id"), lit(42)),
          lit(100L)) < pct)
        val t1 = System.nanoTime()
        val m = collectMerges(learn(sampled))
        val t = (System.nanoTime() - t1) / 1e9
        val (prefix, set) = agree(full, m)
        println(f"[tok] $fam rate=0.$pct%02d rounds=$rounds time=$t%.2fs " +
          s"prefix=$prefix/${full.size} set=$set/${full.size}")
      }
    }
    spark.stop()
  }
}
