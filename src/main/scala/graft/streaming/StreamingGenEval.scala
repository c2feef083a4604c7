package graft.streaming

import graft.operators.Eval
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING corpus-BLEU monitoring — the live generation-quality number
  * over every (candidate, reference) pair seen so far: an online eval of
  * a model under canary traffic, recomputed each micro-batch instead of
  * at the nightly eval.
  *
  * Corpus BLEU pools clipped counts over ALL pairs before any ratio
  * (never an average of per-pair scores), so its sufficient statistics
  * are ADDITIVE: Σ m_n, Σ c_n for n = 1..maxN plus the pooled token
  * lengths and the pair count — a SINGLE-ROW count table, the smallest
  * possible [[GenStore]] state. Each micro-batch collapses its pairs to
  * those sums map-side (through the native
  * [[graft.operators.Eval.generationPairStatsFast]] scan), folds them
  * into the store, and the report recomputes [[Eval.corpusBleu]]'s exact
  * arithmetic from the accumulated sums — per-batch output bit-identical
  * to the one-shot operator over every pair seen (StreamingSpec-pinned).
  *
  * Scale shape: nothing pair-sized is ever kept; the store is ONE row. */
object StreamingGenEval {

  /** foreachBatch sink: fold each micro-batch's pooled BLEU statistics
    * into the store and write the accumulated corpus-BLEU report (the
    * [[Eval.corpusBleu]] schema) to `outDir/batch_id=N`. `rows` must
    * carry `candCol`/`refCol` text columns. */
  def bleuSink(rows: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String, maxN: Int = 4, capTokens: Int = 48,
      candCol: String = "cand",
      refCol: String = "ref"): DataStreamWriter[Row] = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val spark = rows.sparkSession
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the per-pair scan + ONE map-side-combined sum to a single row;
        // __k = 0 is the store's constant key (the state is one row)
        // the id column is aggregated away immediately — a constant keeps
        // the delta trivially replay-idempotent
        val stats = Eval.generationPairStatsFast(
          batch.withColumn("__id", lit(0L)),
          maxN, capTokens, idCol = "__id", candCol = candCol,
          refCol = refCol)
        val delta = stats.agg(
          count(lit(1)).as("n_pairs"),
          (sum("cand_len").as("cand_tokens") ::
            sum("ref_len").as("ref_tokens") ::
            (1 to maxN).toList.flatMap(n => List(
              sum(s"m$n").as(s"m$n"), sum(s"c$n").as(s"c$n")))): _*)
          .withColumn("__k", lit(0L))
        val cols = Seq("n_pairs", "cand_tokens", "ref_tokens") ++
          (1 to maxN).flatMap(n => Seq(s"m$n", s"c$n"))
        val acc = GenStore.foldAgg(spark, stateDir, batchId, delta,
          Seq("__k"), cols.map(c => sum(c).as(c)))
        Eval.corpusBleuFromSums(acc.drop("__k"), maxN)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
