package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation for iterative operators (pageRank, label
  * propagation, connected components, the pipeline survivor set): every
  * generation of an iterative frontier must be MATERIALIZED eagerly, or the
  * logical plan doubles per round (the frontier feeds the next round's plan
  * twice) and Catalyst analysis alone OOMs the driver on deep graphs.
  *
  * Executor-loss contract: when the context has a checkpoint dir
  * (`SparkContext.setCheckpointDir` / `spark.checkpoint.dir`), the
  * materialization is a RELIABLE `checkpoint(true)` — blocks land on the
  * checkpoint filesystem and survive executor loss, which is the setting to
  * use on preemptible / dynamic-allocation clusters where a 50-round
  * iteration WILL see an executor die. Without one it falls back to
  * `localCheckpoint(true)`: blocks live only in executor storage with no
  * recomputation path, so losing an executor mid-loop fails the job — fine
  * for local mode and tests, not for a 1000-executor run.
  *
  * File lifecycle: reliable checkpoint files are only auto-deleted under
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default false);
  * long-running drivers should set that or clean the dir between jobs.
  * localCheckpoint blocks release via the ContextCleaner as superseded
  * generations go out of scope. */
private[graft] object Lineage {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
}
