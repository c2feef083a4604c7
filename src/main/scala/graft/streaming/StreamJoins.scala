package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream time-interval joins — the streaming counterpart of
  * [[graft.operators.Relational.rangeJoinBinned]], built on Structured
  * Streaming's native watermarked join (the one stateful operator where
  * Spark already implements the bounded-state bookkeeping for us).
  *
  * Not part of the reference surface (monasca-aggregator never joins two
  * streams); this is the graft extension for streaming attribution — "every
  * click within the hour before its purchase" — over unbounded inputs.
  */
object StreamJoins {

  /** Inner-join `left` rows to `right` rows with the same key and
    * `rightTs` ∈ [`leftTs` − `lookbackSec`, `leftTs`] (inclusive backward
    * interval — the streaming analogue of the batch range join's
    * containment predicate).
    *
    * State boundedness — the 100 TB-stream contract: BOTH the watermark and
    * the time-range predicate are load-bearing. Spark derives each side's
    * state-eviction horizon from the join's time constraint (left rows can
    * stop waiting once the right watermark passes `leftTs`, right rows once
    * the left watermark passes `rightTs + lookbackSec`), so per-key state
    * never outgrows watermark + lookback regardless of stream length. A
    * bare equality join between streams would require unbounded state and
    * Spark rejects it in append mode.
    *
    * Column names must be disjoint across the two sides (rename upstream,
    * same contract as the batch operator). Inner matches emit as soon as
    * both rows have arrived; the watermark only bounds state and lateness,
    * it does not delay inner-join output. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lookbackSec: Long, watermarkSec: Long): DataFrame = {
    require(lookbackSec >= 0, s"lookbackSec must be >= 0, got $lookbackSec")
    require(watermarkSec >= 0, s"watermarkSec must be >= 0, got $watermarkSec")
    left.withWatermark(leftTs, s"$watermarkSec seconds")
      .join(right.withWatermark(rightTs, s"$watermarkSec seconds"),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookbackSec SECONDS") &&
          col(rightTs) <= col(leftTs))
  }
}
