package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING export manifest — the release-artifact plane of
  * `Sampling.exportManifest`, live: as documents stream in, the per-shard
  * integrity record (row count, token total, order-insensitive mod-2⁶⁴
  * content checksum) stays continuously current, so a release cut at ANY
  * micro-batch boundary ships with its manifest already computed — no
  * end-of-ingest corpus pass.
  *
  * Works because every manifest column is a commutative monoid over
  * document rows (two sums and a wrap-around sum — see
  * `Sampling.manifestPartial`): the micro-batch's partial folds into a
  * [[GenStore]] generation table ([[GenStore.foldAgg]], the multi-column
  * fold) and the finished manifest of the accumulated table is
  * BIT-IDENTICAL to a one-shot `exportManifest` over every row seen so far
  * — one manifest implementation for both planes, the
  * [[StreamingPreference]]/[[StreamingDrift]] pattern.
  *
  * Scale shape: each micro-batch collapses map-side to numShards partial
  * rows before touching the store; the store is shard-table-sized
  * (config-scale — the GenStore contract), and the per-batch rewrite is
  * numShards rows. Nothing log-sized is kept or shuffled. */
object StreamingManifest {

  /** foreachBatch sink: fold each micro-batch's per-shard manifest partial
    * into the store and write the finished manifest of everything seen so
    * far to `outDir/batch_id=N`. Exactly-once via the GenStore generation
    * discipline (a replayed batch rewrites its generation idempotently). */
  def manifestSink(docs: DataFrame, numShards: Int, stateDir: String,
      outDir: String, checkpointDir: String, seed: Long = 42,
      idCol: String = "doc_id", textCol: String = "text"): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = Sampling.manifestPartial(batch, numShards, seed,
          idCol, textCol)
        val acc = GenStore.foldAgg(spark, stateDir, batchId, delta,
          Seq("shard"), Seq(
            sum("n_docs").as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            pmod(sum("cu"), lit(Sampling.ManifestM64)).as("cu")))
        Sampling.manifestFinish(acc)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
