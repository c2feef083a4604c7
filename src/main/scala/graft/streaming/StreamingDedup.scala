package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** A near-dup alert: `doc_id` arrived and matched the earlier-kept
  * `prior_id` with estimated Jaccard `est_jaccard` in LSH band `band`. A
  * pair colliding in several bands emits once per colliding band (bounded
  * by `bands`); group downstream if exact-once pairs are needed. */
case class NearDupAlert(doc_id: Long, prior_id: Long, band: Int,
    est_jaccard: Double)

/** Per-bucket dedup state: parallel arrays of kept doc ids and their full
  * MinHash signatures (the PackedCounts lesson from HeavyHitters: parallel
  * arrays encode several times cheaper per micro-batch than nested maps). */
case class BucketSigs(ids: Array[Long], sigs: Array[Array[Long]],
    lastTs: Long)

/** STREAMING deduplication — the ingest-side counterpart of the batch
  * `Dedup.incrementalNew`/`incrementalNewFuzzy` pair (the reference is a
  * streaming service; dedup is the first thing a streaming corpus pipeline
  * needs):
  *
  *  - [[exactDedupStream]]: pure Structured Streaming, bounded state —
  *    watermarked `dropDuplicatesWithinWatermark` on the md5 text
  *    fingerprint.
  *  - [[nearDupAlerts]]: banded-MinHash custom state via
  *    `flatMapGroupsWithState` — emits a (new doc, earlier kept doc) alert
  *    for every detected near-duplicate, with bounded per-bucket state.
  *  - [[incrementalDedupSink]]: `foreachBatch` composition of the ALREADY
  *    ORACLE-VERIFIED batch anti-join against a persistent accumulated-seen
  *    store — the production shape when the kept corpus must outlive any
  *    state-store TTL (a state store cannot hold a year of crawl
  *    fingerprints; a parquet/lakehouse table can).
  */
object StreamingDedup {

  /** Exact streaming dedup: keep the FIRST arrival of each distinct
    * normalized-text fingerprint; duplicates arriving within the watermark
    * delay are dropped, and per-fingerprint state is evicted once the
    * watermark passes (bounded state — the dedup horizon IS the watermark
    * delay, the standard streaming trade-off; for an unbounded horizon use
    * [[incrementalDedupSink]]). NULL-text rows carry a NULL fingerprint:
    * `dropDuplicatesWithinWatermark` treats NULL as a value, so they
    * deduplicate against each other — filter them upstream if every
    * NULL-text row must survive (the batch operator's keep-NULLs contract
    * cannot be expressed here without keeping them out of the key). */
  def exactDedupStream(docs: DataFrame, lagSec: Long,
      textCol: String = "text", tsCol: String = "event_ts"): DataFrame = {
    val fp = Iterator.from(0).map(i => s"__graft_fp$i")
      .find(c => !docs.columns.contains(c)).get
    docs.withColumn(fp, TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, s"$lagSec seconds")
      .dropDuplicatesWithinWatermark(fp)
      .drop(fp)
  }

  /** Streaming NEAR-dup detection with bounded custom state: docs are
    * MinHash-signed and banded exactly like `Dedup.incrementalNewFuzzy`
    * (same [[graft.functions.MinHashSignature]] one-pass expression, same
    * band slicing), every (band, bandHash) bucket keeps the signatures of
    * the docs it has KEPT (first-arrival survivors), and an arriving doc
    * whose signature agrees with a stored one on ≥ `threshold` of its k
    * slots emits a [[NearDupAlert]] instead of being stored. The slot-match
    * fraction is the standard unbiased MinHash Jaccard estimator — the
    * streaming relaxation of the batch operator's exact shingle verify
    * (state stores k longs per doc, never shingle sets, so per-doc state is
    * fixed 8k bytes).
    *
    * Semantics and bounds:
    *  - within a micro-batch, rows fold in (event-time, doc_id) order, so
    *    the kept/dup split is deterministic under any partitioning;
    *  - a replayed doc (same doc_id) matching itself is NOT an alert;
    *  - per-bucket state is capped at `maxTracked` signatures, evicting the
    *    OLDEST kept entry (FIFO) — the dedup horizon under cap pressure is
    *    the bucket's last maxTracked survivors;
    *  - a bucket idle for `ttlSec` of EVENT time is dropped wholesale
    *    (event-time timeout — restart-safe, no wall-clock dependence);
    *  - late rows past the watermark are dropped before the state function.
    *
    * Scale shape: the only exchange is the groupByKey on (band, bandHash) —
    * the same keyed-bucket discipline as every batch LSH path; state is
    * O(buckets · maxTracked · k) longs regardless of stream volume. */
  def nearDupAlerts(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, lagSec: Long, ttlSec: Long,
      maxTracked: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text", tsCol: String = "event_ts"): Dataset[NearDupAlert] = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    require(maxTracked >= 1, s"maxTracked must be >= 1, got $maxTracked")
    val rows = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("__graft_sig"), b * rows + 1, rows)).as("bh"))
    }
    val banded = docs
      .withColumn("__graft_sig",
        Dedup.minhashSignature(Dedup.wordShingles(col(textCol), n), k))
      .filter(col("__graft_sig").isNotNull) // empty shingle set: no signature
      .withWatermark(tsCol, s"$lagSec seconds")
      .select(col(idCol).cast("long").as("doc_id"), col("__graft_sig").as("sig"),
        col(tsCol).as("event_ts"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("event_ts"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
      .as[(Long, Seq[Long], java.sql.Timestamp, Int, Long)]
    banded.groupByKey { case (_, _, _, band, bh) => (band, bh) }
      .flatMapGroupsWithState[BucketSigs, NearDupAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), rowsIt, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(
              BucketSigs(Array.empty, Array.empty, 0L))
            val ids = scala.collection.mutable.ArrayBuffer(prev.ids: _*)
            val sigs = scala.collection.mutable.ArrayBuffer(prev.sigs: _*)
            val alerts = scala.collection.mutable.ArrayBuffer.empty[NearDupAlert]
            var maxTs = prev.lastTs
            // deterministic fold order regardless of partitioning
            val ordered = rowsIt.toArray.sortBy(r => (r._3.getTime, r._1))
            ordered.foreach { case (id, sigSeq, ts, _, _) =>
              if (ts.getTime > maxTs) maxTs = ts.getTime
              val sig = sigSeq.toArray
              var matched = false
              var i = 0
              while (i < ids.length) {
                if (ids(i) == id) matched = true // replay of the same doc: no alert, no re-store
                else {
                  var same = 0
                  var j = 0
                  while (j < k) { if (sigs(i)(j) == sig(j)) same += 1; j += 1 }
                  val est = same.toDouble / k
                  if (est >= threshold) {
                    alerts += NearDupAlert(id, ids(i), band, est)
                    matched = true
                  }
                }
                i += 1
              }
              if (!matched) {
                if (ids.length >= maxTracked) { ids.remove(0); sigs.remove(0) }
                ids += id
                sigs += sig
              }
            }
            state.update(BucketSigs(ids.toArray, sigs.toArray, maxTs))
            // event-time TTL: drop the bucket once the watermark passes
            // lastActivity + ttl (restart-safe — no wall clock)
            state.setTimeoutTimestamp(maxTs + ttlSec * 1000)
            alerts.iterator
          }
      }
  }

  /** The UNBOUNDED-horizon streaming dedup: each micro-batch is first
    * deduplicated within itself (deterministic first-by-id winner per
    * fingerprint), then anti-joined against the accumulated `seenDir`
    * parquet store with the oracle-verified `Dedup.incrementalNew`;
    * survivors append to BOTH the output and the store. `foreachBatch` is
    * the right tool precisely because the seen-set must outlive any state
    * TTL — it is a TABLE, not stream state.
    *
    * Delivery: survivors land under `outDir/batch_id=<id>` with OVERWRITE,
    * so a replayed micro-batch (failure before checkpoint commit)
    * rewrites its own partition idempotently — exactly-once output. The
    * seen-store append is at-least-once under the same replay;
    * incrementalNew is insensitive to duplicate SEEN rows (the anti-join
    * side is distinct-by-fingerprint), so correctness holds — the store
    * just carries benign duplicate rows until compaction. */
  /** STREAMING SEMANTIC near-dup detection — the embedding face of this
    * file (exact: fingerprint; fuzzy: MinHash bands; semantic: IVF-bucketed
    * cosine): each micro-batch is unit-normalized, cell-assigned against a
    * FROZEN centroid generation (an external artifact — e.g. a
    * `Similarity.kmeansCentroids` fit; frozen cells are what make the
    * assignment batch-split-invariant), and cosine-joined WITHIN its cell
    * against both the accumulated store and the batch itself. Pairs at or
    * above `threshold` land under `outDir/batch_id=N` as
    * (id_a < id_b, cell, cosine); every batch vector then appends to the
    * store.
    *
    * Correctness contract (StreamingSpec-pinned): the UNION of the per-batch
    * pair outputs over any batch split equals the one-shot
    * [[graft.operators.Dedup.semanticPairsFrozen]] over all vectors seen,
    * bit-identically (same cells, same sequential-fold dot, ids oriented
    * the same way) — and survives a checkpoint restart.
    *
    * Replay safety: output partitions are per-batch OVERWRITE (exactly-once
    * output); the store append is at-least-once, healed at READ by
    * `dropDuplicates(id)` (v is a pure function of id) plus an anti-join
    * that excludes the current batch's own ids from the stored side — a
    * replayed batch whose append DID land neither self-pairs nor
    * double-counts its pairs.
    *
    * State shape: the store is a parquet TABLE, not stream state and not a
    * [[GenStore]] generation — per-DOCUMENT keys violate GenStore's
    * count-table contract (each generation rewrite would be corpus-sized);
    * an append-only table costs O(batch) I/O per batch and outlives any
    * state-store TTL, the [[incrementalDedupSink]] rationale. The only
    * per-batch exchanges are the cell joins — store-side work is bounded
    * by the probed cells, never all-pairs. */
  def semanticPairsSink(emb: DataFrame, centroids: Seq[Seq[Double]],
      threshold: Double, storeDir: String, outDir: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataStreamWriter[Row] = {
    require(centroids.nonEmpty, "frozen centroid generation must be non-empty")
    val spark = emb.sparkSession
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.Similarity
        val assigned = Similarity.unitVectors(batch, idCol, vecCol, "id", "v")
          .withColumn("cell",
            array_max(Similarity.cellScores(col("v"), centroids))
              .getField("c"))
          .select(col("cell"), col("id"), col("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val path = new org.apache.hadoop.fs.Path(storeDir)
          val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val stored =
            if (fs.exists(path))
              // explicit schema: a crash can land AFTER the store directory
              // is created but BEFORE any parquet footer commits — schema
              // inference would throw on replay and wedge the restart this
              // sink advertises as safe; with the schema given, an empty or
              // partial directory degrades to zero rows
              spark.read.schema(assigned.schema).parquet(storeDir)
                .dropDuplicates("id") // replayed appends are benign
                .join(assigned.select("id"), Seq("id"), "left_anti")
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], assigned.schema)
          val dot = graft.functions.VectorExpressions.dot _
          val cross = stored
            .select(col("cell"), col("id").as("ia"), col("v").as("va"))
            .join(assigned.select(col("cell"), col("id").as("ib"),
              col("v").as("vb")), Seq("cell"))
          val within = assigned
            .select(col("cell"), col("id").as("ia"), col("v").as("va"))
            .join(assigned.select(col("cell"), col("id").as("ib"),
              col("v").as("vb")), Seq("cell"))
            .filter(col("ia") < col("ib"))
          cross.unionByName(within)
            .withColumn("cosine", dot(col("va"), col("vb")))
            .filter(col("cosine") >= threshold)
            .select(least(col("ia"), col("ib")).as("id_a"),
              greatest(col("ia"), col("ib")).as("id_b"),
              col("cell"), col("cosine"))
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          assigned.write.mode("append").parquet(storeDir)
        } finally { assigned.unpersist(); () }
      }
  }

  def incrementalDedupSink(docs: DataFrame, seenDir: String, outDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text"): DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val fp = TextAnalysis.fingerprint(col(textCol))
        val w = Window.partitionBy(fp).orderBy(col(idCol).asc)
        val inBatch = batch
          .withColumn("__graft_rk", row_number().over(w))
          .filter(col("__graft_rk") === 1).drop("__graft_rk")
        // explicit existence probe (Hadoop FS, so object stores work too):
        // the first batch bootstraps an empty seen-side instead of relying
        // on exception-message matching across Spark versions
        val seenPath = new org.apache.hadoop.fs.Path(seenDir)
        val fs = seenPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val seen =
          if (fs.exists(seenPath)) spark.read.parquet(seenDir).select(col(textCol))
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row],
            batch.select(col(textCol)).schema)
        val fresh = Dedup.incrementalNew(inBatch, seen, textCol).cache()
        try {
          fresh.write.mode("overwrite")
            .save(s"$outDir/batch_id=$batchId")
          fresh.select(col(textCol)).write.mode("append").parquet(seenDir)
        } finally { fresh.unpersist(); () }
      }
  }
}
