package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-addressed ADDITIVE-COUNT store for foreachBatch sinks — the
  * state backbone shared by [[StreamingPreference]] (pair counts) and
  * [[StreamingDrift]] (bucket counts). Any stream statistic that is a pure
  * function of additive counts streams this way: fold the micro-batch's
  * delta into the accumulated table, recompute from the total.
  *
  * Layout: the accumulated counts for batch N land under `stateDir/gen=N`
  * with OVERWRITE; the fold for batch N reads the LARGEST generation < N.
  * A replayed micro-batch (failure before the checkpoint commit) re-reads
  * the same prior and rewrites its own generation idempotently —
  * exactly-once state with no compare-and-swap. Generations older than the
  * prior are pruned after the write. The store is count-table-sized
  * (distinct keys), never log-sized.
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
      delta: DataFrame, keys: Seq[String], cntCol: String): DataFrame = {
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
          .groupBy(keys.map(col): _*).agg(sum(cntCol).as(cntCol))
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
