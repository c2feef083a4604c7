package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING audio-quality (VAD) plane — `Multimodal.vadShardRollup`, live:
  * as audio documents stream in, the per-shard voiced-fraction record (doc
  * / undecodable / span counts, voiced and total sample sums, speech
  * ratio) stays continuously current, so an audio-quality gate or billing
  * cut at ANY micro-batch boundary reads finished numbers — no
  * end-of-ingest corpus pass over the WAV bytes.
  *
  * Works because every rollup column is a commutative monoid over document
  * rows (five long sums — `Multimodal.vadShardPartial`): the micro-batch's
  * partial folds into a [[GenStore]] generation table ([[GenStore.foldAgg]])
  * and the finished rollup of the accumulated table is BIT-IDENTICAL to a
  * one-shot `vadShardRollup` over every row seen so far — one
  * implementation for both planes, the [[StreamingManifest]] pattern.
  * Exactly-once via the GenStore generation discipline (a replayed batch
  * rewrites its generation idempotently); restart with the SAME
  * checkpointLocation + stateDir pairing (the GenStore lineage contract).
  *
  * Scale shape: the RIFF chunk walk and window-energy fold run where the
  * batch's bytes are (zero shuffles — the [[Multimodal.vadSegments]]
  * shape); each micro-batch collapses map-side to numShards rows of longs
  * before touching the store; the store is shard-table-sized (the GenStore
  * contract) and the per-batch rewrite is numShards rows. Nothing
  * log-sized — audio bytes least of all — is kept or reshuffled. */
object StreamingVad {

  /** foreachBatch sink: fold each micro-batch's per-shard VAD partial into
    * the store and write the finished quality rollup of everything seen so
    * far to `outDir/batch_id=N`. */
  def vadRatioSink(media: DataFrame, win: Int, thrMeanSq: Long,
      numShards: Int, stateDir: String, outDir: String,
      checkpointDir: String, seed: Long = 42): DataStreamWriter[Row] = {
    val spark = media.sparkSession
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = Multimodal.vadShardPartial(spark, batch, win,
          thrMeanSq, numShards, seed)
        val acc = GenStore.foldAgg(spark, stateDir, batchId, delta,
          Seq("shard"), Seq(
            sum("n_docs").as("n_docs"),
            sum("n_undecodable").as("n_undecodable"),
            sum("n_spans").as("n_spans"),
            sum("speech_samples").as("speech_samples"),
            sum("total_samples").as("total_samples")))
        Multimodal.vadShardFinish(acc)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
