package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING blocklist plane — [[TextAnalysis.blocklistHits]], live: as
  * documents stream in, the per-pattern audit record (total occurrences,
  * documents hit) stays continuously current, so a policy dashboard or
  * ingest gate at ANY micro-batch boundary reads finished numbers — no
  * end-of-ingest corpus re-scan.
  *
  * Works because both report columns are commutative monoids over document
  * rows (occurrence and hit-doc counts are long sums; a document arrives in
  * exactly one micro-batch, so per-batch doc counts add): the micro-batch's
  * per-pattern partial folds into a [[GenStore]] generation table
  * ([[GenStore.foldAgg]]), and the accumulated table is BIT-IDENTICAL to a
  * one-shot `blocklistHits` roll-up over every row seen so far — one
  * implementation for both planes, the [[StreamingManifest]] pattern.
  * Exactly-once via the GenStore generation discipline (a replayed batch
  * rewrites its generation idempotently); restart with the SAME
  * checkpointLocation + stateDir pairing (the GenStore lineage contract).
  *
  * Scale shape: the Aho–Corasick walk runs where the batch's text is (one
  * narrow map, no exchange — the [[TextAnalysis.blocklistHits]] shape);
  * each micro-batch collapses map-side to ≤ |patterns| rows of longs
  * before touching the store; the store is pattern-table-sized (the
  * GenStore count-table contract) and the per-batch rewrite is
  * |patterns| rows. Nothing corpus-sized is kept or reshuffled. */
object StreamingBlocklist {

  /** foreachBatch sink: fold each micro-batch's per-pattern blocklist
    * partial into the store and write the finished audit report
    * `(pattern, hits, n_docs)` of everything seen so far to
    * `outDir/batch_id=N`. */
  def blocklistSink(docs: DataFrame, patterns: Seq[String], stateDir: String,
      outDir: String, checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text"): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = TextAnalysis.blocklistHits(batch, patterns, idCol, textCol)
          .groupBy("pattern").agg(
            sum("hits").as("hits"), count(lit(1)).as("n_docs"))
        val acc = GenStore.foldAgg(spark, stateDir, batchId, delta,
          Seq("pattern"), Seq(
            sum("hits").as("hits"), sum("n_docs").as("n_docs")))
        acc.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
  }
}
