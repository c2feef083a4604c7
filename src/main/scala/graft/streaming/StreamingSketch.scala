package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING Count-Min frequency plane — live heavy-hitter surveillance
  * over an ingest feed (which user/source/token is suddenly flooding the
  * stream) with STATE BOUNDED BY THE SKETCH, not by the key cardinality.
  *
  * The Count-Min cell matrix ([[graft.operators.Sketches.cmsBuild]],
  * d×w counters) is additive cell-wise, so it streams through the same
  * [[GenStore]] plane as the Bradley–Terry/PSI/manifest sinks: each
  * micro-batch collapses map-side to ≤ d·w delta cells, the store rewrites
  * the d·w-row generation table (well inside the GenStore
  * count-table-scale contract — the whole point of a sketch), and the
  * accumulated matrix after batch N is BIT-IDENTICAL to a one-shot
  * `cmsBuild` over every row seen (StreamingSpec pins per-batch ==
  * one-shot, replay idempotence and checkpoint-restart resume).
  *
  * The per-batch report estimates the CURRENT batch's distinct keys
  * against the ACCUMULATED sketch — the standard CMS + candidate-refresh
  * heavy-hitter loop: a key's total can only cross a threshold in a batch
  * where the key occurs, so per-batch candidates miss no hitter at the
  * moment it becomes one, while the candidate relation stays
  * batch-key-sized. Estimates carry CMS semantics: always ≥ the true
  * count, within εN for w = ⌈e/ε⌉ at confidence 1 − δ for d = ⌈ln 1/δ⌉.
  *
  * Same portability rationale as the batch sketch: rows hash with
  * [[graft.operators.Sampling.hashRaw]] seeds 1..d, so the accumulated
  * matrix and every estimate replay exactly on any engine. */
object StreamingSketch {

  /** foreachBatch sink: fold the micro-batch's CMS delta cells into the
    * store and write the batch keys' estimates (key, est) to
    * `outDir/batch_id=N`. `d`/`w` are part of the store's identity — never
    * change them across restarts of the same stateDir. */
  def cmsSink(rows: DataFrame, key: Column, d: Int, w: Int,
      stateDir: String, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    val spark = rows.sparkSession
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = Sketches.cmsBuild(batch, key, d, w)
        val acc = GenStore.fold(spark, stateDir, batchId, delta,
          Seq("r", "b"), "cnt")
        val probes = batch.select(key.as("key")).distinct()
        Sketches.cmsEstimate(acc, probes, "key", d, w)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
