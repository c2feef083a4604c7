package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-addressed ADDITIVE-COUNT store for foreachBatch sinks — the
  * state backbone shared by [[StreamingPreference]] (pair counts),
  * [[StreamingDrift]] (bucket counts) and [[StreamingManifest]] (per-shard
  * totals). Any stream statistic that is a pure function of additive
  * (more generally: commutative-monoid) per-key aggregates streams this
  * way: fold the micro-batch's delta into the accumulated table, recompute
  * from the total.
  *
  * Layout: the accumulated counts for batch N land under `stateDir/gen=N`
  * with OVERWRITE; the fold for batch N reads the LARGEST generation < N.
  * A replayed micro-batch (failure before the checkpoint commit) re-reads
  * the same prior and rewrites its own generation idempotently —
  * exactly-once state with no compare-and-swap. Generations older than the
  * prior are pruned after the write. The store is count-table-sized
  * (distinct keys), never log-sized.
  *
  * CONTRACT — keys must stay count-table-scale: every micro-batch rewrites
  * the ENTIRE accumulated table (O(state) I/O per batch — that is what buys
  * the CAS-free idempotence), so the key set must be config-scale (pairs,
  * buckets, shards: 10⁰–10⁶ rows), never per-document. A per-document
  * statistic routed through this store would turn each micro-batch into a
  * corpus-sized parquet rewrite; use a keyed streaming aggregation with
  * watermark eviction for that shape instead.
  *
  * The generation addressing keys on the streaming query's batchId, so a
  * store is bound to ONE checkpoint lineage: restart with the SAME
  * checkpointLocation (batchIds continue — StreamingSpec pins this) and
  * pair a fresh checkpoint with a fresh stateDir. A new checkpoint over an
  * old store would restart batchIds at 0 and shadow the accumulated
  * generations rather than fold into them. */
private[graft] object GenStore {

  /** Fold `delta(keys..., cntCol)` into the store for `batchId` and return
    * the accumulated relation (read back from the just-written
    * generation, so downstream refits read parquet, not a lineage chain
    * through every prior batch). */
  def fold(spark: SparkSession, stateDir: String, batchId: Long,
      delta: DataFrame, keys: Seq[String], cntCol: String): DataFrame =
    foldAgg(spark, stateDir, batchId, delta, keys,
      Seq(sum(cntCol).as(cntCol)))

  /** The multi-column generalization of [[fold]]: `delta` carries one row
    * per key with SEVERAL mergeable columns, and `aggs` gives the fold
    * expression for each (e.g. `sum("n")`, or a modular
    * `pmod(sum("cu"), m)` for a wrap-around checksum). Each agg must be a
    * commutative monoid over its column with the delta rows as the
    * generators — that is exactly what makes per-batch folding land on the
    * bit-identical result of a one-shot aggregate over all rows seen. */
  def foldAgg(spark: SparkSession, stateDir: String, batchId: Long,
      delta: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens =
      if (fs.exists(root))
        fs.listStatus(root).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("gen="))
          .map(_.stripPrefix("gen=").toLong)
      else Seq.empty[Long]
    val prior = gens.filter(_ < batchId).sorted.lastOption
    val acc = prior match {
      case Some(g) =>
        spark.read.parquet(s"$stateDir/gen=$g").unionByName(delta)
          .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      case None => delta
    }
    acc.write.mode("overwrite").parquet(s"$stateDir/gen=$batchId")
    gens.filter(g => g < batchId && !prior.contains(g)).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/gen=$g"), true)
      ()
    }
    spark.read.parquet(s"$stateDir/gen=$batchId")
  }
}
