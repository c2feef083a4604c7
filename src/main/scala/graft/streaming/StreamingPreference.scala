package graft.streaming

import graft.operators.Preference
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING Bradley–Terry — the ingest side of the RLHF preference plane
  * (annotator judgments arrive continuously; the reward-model data pipeline
  * wants fresh strengths per micro-batch, not a nightly refit from raw
  * logs).
  *
  * The batch fit ([[graft.operators.Preference.bradleyTerryWeighted]]) is a
  * pure function of the COMPACTED pair-count relation (winner, loser, n) —
  * so the streaming form needs no model state at all, only that count
  * table: each micro-batch's judgments fold into it (counts add), and the
  * refit from the accumulated table is bit-identical to a one-shot fit
  * over every judgment seen so far. Same optimizer for both planes, the
  * `StreamingDedup.incrementalDedupSink` store discipline.
  *
  * State store: the [[GenStore]] generation-addressed count table
  * (gen=N OVERWRITE, prior = largest gen < N → replay-idempotent,
  * exactly-once). Strengths for batch N land under `outDir/batch_id=N`,
  * also OVERWRITE-idempotent.
  *
  * Scale shape: per batch, the batch's judgments compact map-side before
  * touching the store; the store itself is pair-count-sized (distinct
  * ordered pairs, never the judgment log), and the refit inherits the batch
  * operator's shape — item-sized shuffles per MM round, 1-row broadcast
  * normalizer. */
object StreamingPreference {

  /** foreachBatch sink: fold each micro-batch of `(winner, loser)` judgment
    * rows into the pair-count store and write the refit strengths
    * `(item, strength_fp, wins)` for the accumulated judgments. */
  def bradleyTerrySink(comparisons: DataFrame, stateDir: String,
      outDir: String, checkpointDir: String, iters: Int,
      scale: Long = 1L << 20): DataStreamWriter[Row] = {
    val spark = comparisons.sparkSession
    comparisons.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy("winner", "loser")
          .agg(count(lit(1)).cast("long").as("n"))
        val counts = GenStore.fold(spark, stateDir, batchId, delta,
          Seq("winner", "loser"), "n")
        Preference.bradleyTerryWeighted(counts, iters, scale)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }

  /** foreachBatch sink for the AGREEMENT screen
    * ([[graft.operators.Preference.pairAgreementFromCounts]]): the
    * identical pair-count fold as [[bradleyTerrySink]] — the report, like
    * the fit, is a pure function of the compacted directed counts, so the
    * per-batch report over the accumulated table equals the one-shot
    * report over every judgment seen BIT-identically (StreamingSpec pins
    * it). Judgment quality is then surveilled live: a rater burst that
    * flips pairs below majority shows up within its micro-batch, before a
    * nightly refit would have trained on it. */
  def agreementSink(comparisons: DataFrame, stateDir: String,
      outDir: String, checkpointDir: String): DataStreamWriter[Row] = {
    val spark = comparisons.sparkSession
    comparisons.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy("winner", "loser")
          .agg(count(lit(1)).cast("long").as("n"))
        val counts = GenStore.fold(spark, stateDir, batchId, delta,
          Seq("winner", "loser"), "n")
        Preference.pairAgreementFromCounts(counts)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }

  /** foreachBatch sink: Krippendorff's alpha, live — the chance-corrected
    * reliability coefficient over every judgment seen so far, refreshed
    * each micro-batch from the SAME directed pair-count store the
    * Bradley–Terry and agreement sinks use (alpha is a pure function of
    * that compacted table — [[graft.operators.Preference
    * .krippendorffAlphaWeighted]]), so a collapsing annotator pool is
    * visible within its batch instead of at the nightly refit. One-row
    * output per batch under `outDir/batch_id=N`, exactly-once via the
    * GenStore generation discipline. */
  def krippendorffSink(comparisons: DataFrame, stateDir: String,
      outDir: String, checkpointDir: String): DataStreamWriter[Row] = {
    val spark = comparisons.sparkSession
    comparisons.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy("winner", "loser")
          .agg(count(lit(1)).cast("long").as("n"))
        val counts = GenStore.fold(spark, stateDir, batchId, delta,
          Seq("winner", "loser"), "n")
        Preference.krippendorffAlphaWeighted(counts)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
