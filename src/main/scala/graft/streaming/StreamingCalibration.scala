package graft.streaming

import graft.operators.Eval
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING classifier-calibration monitoring — the reward-model /
  * quality-filter reliability diagram recomputed every micro-batch over
  * ALL predictions seen so far, so a drifting judge (a reward model whose
  * confidence decouples from its accuracy mid-run) alarms within a batch
  * instead of at the nightly eval.
  *
  * The diagram ([[graft.operators.Eval.calibrationBinsFromCounts]]) is a
  * pure function of the (bin, n, n_pos) count table, and those counts are
  * ADDITIVE — exactly the [[GenStore]] shape: each micro-batch collapses
  * to its per-bin delta map-side, folds into the generation table, and
  * the report recomputes from the total. Per-batch output is
  * bit-identical to a one-shot [[graft.operators.Eval.calibrationBins]]
  * over every row seen so far — one implementation for both planes.
  *
  * Scale shape: the store is `bins` rows (config-scale — GenStore's
  * count-table contract holds trivially); nothing prediction-sized is
  * kept or shuffled after the map-side bin collapse. */
object StreamingCalibration {

  /** foreachBatch sink: fold each micro-batch's per-bin (n, n_pos) counts
    * into the store and write the accumulated reliability diagram to
    * `outDir/batch_id=N`. `conf` must evaluate into [0, 1] (clamped into
    * the top/bottom bin as in the batch operator); `label` casts to a
    * 0/1 long. */
  def calibrationSink(rows: DataFrame, conf: Column, label: Column,
      bins: Int, stateDir: String, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = rows.sparkSession
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = Eval.calibrationCounts(
          batch.select(conf.as("conf"), label.as("label")), bins)
        val acc = GenStore.foldAgg(spark, stateDir, batchId, delta,
          Seq("bin"), Seq(sum("n").as("n"), sum("n_pos").as("n_pos")))
        Eval.calibrationBinsFromCounts(acc, bins)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
