package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for operator sub-stages (not part of the driver
  * contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warm scan")(docs.count())
    val base = docs.select(col("doc_id").as("id"),
      Dedup.wordShingles(col("text"), 3).as("shingles"))
    time("wordShingles")(base.agg(sum(size(col("shingles")))).head().getLong(0))
    val sh = base.select(col("id"), size(col("shingles")).as("n_sh"),
      explode(col("shingles")).as("shingle"))
    time("explode")(sh.count())
    val a = sh.select(col("id").as("id_a"), col("n_sh").as("na"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("n_sh").as("nb"), col("shingle"))
    val joined = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
    time("shingle join")(joined.count())
    val grouped = joined.groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("inter"))
    time("pair groupBy")(grouped.count())
    time("full ngram")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())

    val hashed = base.select(col("id"), explode(col("shingles")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    time("hash explode")(hashed.count())
    val sigCols = (0 until 128).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sigs = hashed.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    time("128 min-aggs")(sigs.count())
    time("full minhash")(Dedup.minhashLshPairs(docs, 3, 128, 32, 0.5).count())
    spark.stop()
  }
}
