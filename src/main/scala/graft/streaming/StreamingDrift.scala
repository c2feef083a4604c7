package graft.streaming

import graft.operators.Profiling
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING distribution-drift monitoring — the ingest side of the
  * refresh-acceptance plane: a live feed's feature distribution is compared
  * against a FROZEN baseline snapshot continuously, not once per nightly
  * batch, so a drifting crawl or upstream schema slip alarms within a
  * micro-batch of happening.
  *
  * The PSI report ([[graft.operators.Profiling.psiDriftFromCounts]]) is a
  * pure function of two bucket-count tables — so the streaming form needs
  * only the accumulated stream-side counts (a [[GenStore]] generation
  * table; counts add) plus the fixed baseline counts. The per-batch report
  * is bit-identical to a one-shot `psiDrift` over every row seen so far:
  * one monitor implementation for both planes.
  *
  * Scale shape: each micro-batch collapses to bucket counts map-side
  * before touching the store; the store and the baseline are bucket-table
  * sized (config-scale, tens of rows), and the report join/window runs on
  * those. Nothing log-sized is ever kept or shuffled. */
object StreamingDrift {

  /** foreachBatch sink: fold each micro-batch's `bucket` counts into the
    * stream-side store and write the PSI report of accumulated-stream vs
    * `baseline` (a fixed parquet path of rows to bucket the same way) to
    * `outDir/batch_id=N`. */
  def psiSink(rows: DataFrame, bucket: Column, baselineDir: String,
      stateDir: String, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    val spark = rows.sparkSession
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.select(bucket.as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).cast("long").as("n_new"))
        val acc = GenStore.fold(spark, stateDir, batchId, delta,
          Seq("bucket"), "n_new")
        val base = spark.read.parquet(baselineDir).select(bucket.as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_old"))
        Profiling.psiDriftFromCounts(base, acc)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
