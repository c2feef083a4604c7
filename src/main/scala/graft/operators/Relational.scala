package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Time-relational operators Spark lacks as built-ins: the as-of join
  * (pandas `merge_asof`, DuckDB `ASOF JOIN`, kdb `aj`) and the binned range
  * join (Databricks' range-join hint, absent from OSS Spark). Both are
  * declared against the DataFrame API so Catalyst keeps pushdown/pruning;
  * neither ever degenerates into a cartesian product.
  *
  * Not part of the reference surface (monasca-aggregator has no joins at
  * all — `aggregation/aggregation_rule.go` only filters and groups one
  * stream); these are graft extensions for the training-data/event-analytics
  * side of the engine.
  */
object Relational {

  /** Inclusive as-of join: for each left row, attach the payload of the
    * LATEST right row with the same `key` whose `rightTime` <= `leftTime`
    * (and, if `toleranceUs >= 0`, within `leftTime - toleranceUs`);
    * `direction = "forward"` flips both inequalities (EARLIEST right row at
    * or after `leftTime`, within `leftTime + toleranceUs`), and
    * `direction = "nearest"` takes the closer of the two (see
    * [[asofNearest]]). Left rows with
    * no qualifying right row keep NULL payloads (left-outer semantics).
    * Ties on (key, rightTime) resolve to the largest `rightTieBreak`
    * backward and the smallest forward, making the result fully
    * deterministic.
    *
    * Spark-first shape: this is NOT implemented as a join. Both sides are
    * tagged and UNIONed, shuffled ONCE on the key, sorted by (time, side,
    * tie-break) and the latest right payload is carried forward with
    * `last(_, ignoreNulls = true)` over an unbounded-preceding running
    * window — then the right carrier rows are dropped. Cost is one exchange
    * per side + one sort: exactly a sort-merge join's shuffle without its
    * per-key pairwise matching, so a key whose right side has millions of
    * rows streams linearly instead of quadratically. At 100 TB the only
    * skew hazard is a single hot KEY exceeding one task's sort spill —
    * the classic mitigation (split the key by time range, as-of join each
    * range against the previous range's last row) composes from this same
    * primitive.
    *
    * Time columns must be numeric (pass `unix_micros(ts)` for timestamps —
    * a timestamp→long SQL cast would silently truncate to seconds).
    * Payload columns are emitted as `prefix + name`; `rightTime` is always
    * available as `prefix + rightTime` for staleness checks downstream.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: String, toleranceUs: Long = -1L,
      prefix: String = "asof_", direction: String = "backward"): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return asofNearest(left, right, key, leftTime, rightTime, payload,
        rightTieBreak, toleranceUs, prefix)
    val (lSide, rSide, pCols) = asofSides(left, right, key, leftTime,
      rightTime, payload, rightTieBreak, direction)

    // right rows sort BEFORE left rows at equal time (inclusive backward);
    // among right ties the largest tie-break is seen last and wins
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc_nulls_first, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asofFinish(lSide.union(rSide), w, toleranceUs, prefix, rightTime, pCols,
      left.schema)
  }

  /** The tagged-union sides of the as-of algorithm, shared by [[asofJoin]]
    * and [[asofJoinTimeSplit]]. `__side`: 0 = right carrier, 1 = left
    * (probe); the split variant injects synthetic `-1` rows that must sort
    * before both. */
  private def asofSides(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: String, direction: String): (DataFrame, DataFrame, Seq[String]) = {
    // forward = the backward algorithm on time-negated axes: the LATEST
    // preceding row of (-t) is the EARLIEST following row of t, and the
    // negated tie-break makes forward ties resolve to the SMALLEST id
    // (the deterministic mirror of backward's largest)
    val sign = if (direction == "backward") 1L else -1L
    val leftFields = left.schema.fields

    // the right payload travels as ONE struct column so a single
    // last(ignoreNulls) carries every field (plus the match time — original
    // in __rt for output, sign-adjusted in __srt for the tolerance check)
    val pCols = payload.filterNot(_ == rightTime)
    val pStruct = struct(
      col(rightTime).cast(LongType).as("__rt") +:
        (col(rightTime).cast(LongType) * lit(sign)).as("__srt") +:
        pCols.map(col): _*)
    // the payload slot's concrete type, so the left side can carry a
    // null literal of the SAME struct type and the union resolves by position
    val pType = right.select(pStruct.as("__p")).schema.fields.head.dataType

    val rSide = right.select(
      Seq(col(key).as("__k"),
        (col(rightTime).cast(LongType) * lit(sign)).as("__t"),
        lit(0).as("__side"),
        (col(rightTieBreak).cast(LongType) * lit(sign)).as("__tb"),
        pStruct.as("__p")) ++
        leftFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val lSide = left.select(
      Seq(col(key).as("__k"),
        (col(leftTime).cast(LongType) * lit(sign)).as("__t"),
        lit(1).as("__side"), lit(Long.MaxValue).as("__tb"),
        lit(null).cast(pType).as("__p")) ++
        leftFields.map(f => col(f.name)): _*)
    (lSide, rSide, pCols)
  }

  /** Shared tail: running-last carry over `w`, tolerance gate, and the
    * left-rows-only projection back to the caller's schema. */
  private def asofFinish(unioned: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
      toleranceUs: Long, prefix: String, rightTime: String,
      pCols: Seq[String], leftSchema: StructType): DataFrame = {
    val carried = last(col("__p"), ignoreNulls = true).over(w)
    val matched =
      if (toleranceUs < 0) carried
      else when(carried.getField("__srt") >= col("__t") - lit(toleranceUs), carried)
    unioned
      .withColumn("__m", matched)
      .where(col("__side") === 1)
      .select(leftSchema.fields.map(f => col(f.name)) ++
        ((s"$prefix$rightTime", col("__m").getField("__rt")) +:
          pCols.map(p => (s"$prefix$p", col("__m").getField(p))))
          .map { case (n, c) => c.as(n) }: _*)
  }

  /** SKEW-SAFE as-of join — the time-split mitigation [[asofJoin]]'s
    * scaladoc prescribes, implemented (round-11 verdict task #7): the
    * single-key sort hazard (one task sorting a hot key's millions of rows)
    * is removed by splitting every key's timeline into `chunkUs`-wide
    * chunks and running the SAME tagged-union running-last algorithm per
    * (key, chunk) — with each chunk seeded by a synthetic carrier row
    * holding the latest right payload from all EARLIER chunks, so a match
    * across a chunk boundary (or many empty chunks back) is still found.
    * Result is row-for-row IDENTICAL to [[asofJoin]] (property-tested ∀
    * data/chunk size, and the driver query shares the unsalted oracle).
    *
    * How the carry-in is built without touching the big relation twice at
    * full width: per-(key, chunk) LAST right payload is a map-side-combined
    * aggregate (the exchange moves one summary row per (key, chunk), not
    * events), the carry-in is a running last-ignoring-nulls over the
    * summary rows ordered by chunk EXCLUDING the current one, and the
    * surviving carriers re-enter the union as `__side = -1` rows at the
    * chunk start instant (they sort before every real row in the chunk;
    * inclusive-boundary ties stay exact because the carrier holds the
    * ORIGINAL match time for the tolerance gate).
    *
    * Cost vs [[asofJoin]]: the same one full-width exchange (now keyed
    * (key, chunk)) plus two summary-sized ones — the hot key's sort
    * becomes ~rows/chunks per task. Pick chunkUs so a hot key's densest
    * chunk fits a task's sort buffer (e.g. hour chunks for a key logging
    * 1e9 events/day → ~4e7 rows/task). `direction` backward|forward
    * (nearest composes from the two directional runs the way
    * [[asofNearest]] does). */
  def asofJoinTimeSplit(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: String, chunkUs: Long, toleranceUs: Long = -1L,
      prefix: String = "asof_", direction: String = "backward"): DataFrame = {
    require(payload.nonEmpty, "asofJoinTimeSplit needs at least one payload column")
    require(chunkUs >= 1, s"chunkUs must be >= 1, got $chunkUs")
    require(Set("backward", "forward").contains(direction),
      s"direction must be backward|forward, got $direction")
    val (lSide, rSide, pCols) = asofSides(left, right, key, leftTime,
      rightTime, payload, rightTieBreak, direction)
    // floor division (sign-adjusted __t is negative for forward joins —
    // truncation would misalign chunk boundaries around zero)
    val chunk = expr(s"(__t div ${chunkUs}L) + " +
      s"(CASE WHEN __t % ${chunkUs}L < 0 THEN -1 ELSE 0 END)")
    val unioned = lSide.union(rSide).withColumn("__c", chunk)
    // last right payload per (key, chunk): max_by on (__t, __tb) = exactly
    // the running-last winner among the chunk's right rows. The struct
    // payload forces a SortAggregate, but the PARTIAL side still combines
    // map-side (plan-pinned partial_max_by): each input partition sorts
    // locally and collapses to one row per (key, chunk) BEFORE any
    // exchange — the summaries' network cost is (key, chunk)-sized, never
    // event-sized, and no extra full-width shuffle exists.
    // NOTE the aggregation runs over BOTH sides (left rows contribute a
    // NULL ordering, which max_by ignores): a left-only (key, chunk) must
    // still produce a summary row, or its carrier — and every match
    // reaching it from earlier chunks — would silently vanish
    val chunkLast = unioned
      .groupBy(col("__k"), col("__c"))
      .agg(max_by(struct(col("__t"), col("__tb"), col("__p")),
        when(col("__side") === 0, struct(col("__t"), col("__tb"))))
        .as("__last"))
    // carry-in for each (key, chunk): the latest right payload of any
    // EARLIER chunk (rowsBetween excludes the current — in-chunk rows are
    // already present). One row per (key, chunk): skew-immune by size.
    val wc = Window.partitionBy("__k").orderBy(col("__c").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carriers = chunkLast
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wc))
      .where(col("__carry").isNotNull)
      .select(
        Seq(col("__k"), (col("__c") * lit(chunkUs)).as("__t"),
          lit(-1).as("__side"), col("__carry").getField("__tb").as("__tb"),
          col("__carry").getField("__p").as("__p")) ++
          left.schema.fields.map(f => lit(null).cast(f.dataType).as(f.name)) :+
          col("__c"): _*)
    // per-(key, chunk) window: the carrier (__side -1, __t = chunk start)
    // sorts before every real row of its chunk, so the running last sees
    // exactly the history the unsalted window would have seen
    val w = Window.partitionBy("__k", "__c")
      .orderBy(col("__t").asc_nulls_first, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asofFinish(unioned.union(carriers), w, toleranceUs, prefix, rightTime,
      pCols, left.schema)
  }

  /** `direction = "nearest"`: each left row takes whichever of its backward
    * and forward as-of matches is CLOSER in time (tie → backward, pandas
    * `merge_asof(direction='nearest')`); `toleranceUs` bounds both sides.
    * Within each direction the tie-breaks are the directional contracts
    * (backward: latest time, largest tie-break; forward: earliest, smallest).
    *
    * Same no-join-node shape, still ONE exchange: both sides union once and
    * the two directional carriers are two running `last(ignoreNulls)`
    * windows over the same hash partitioning with opposite sort orders
    * (forward = backward on the time-reversed axis, so BOTH frames are
    * incremental unbounded-PRECEDING scans — never the O(n²)
    * unbounded-following frame). Catalyst plans exchange → sort → window →
    * sort → window. */
  private def asofNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightTieBreak: String, toleranceUs: Long, prefix: String): DataFrame = {
    val leftFields = left.schema.fields
    val pCols = payload.filterNot(_ == rightTime)
    val pStruct = struct(
      col(rightTime).cast(LongType).as("__rt") +: pCols.map(col): _*)
    val pType = right.select(pStruct.as("__p")).schema.fields.head.dataType

    val rSide = right.select(
      Seq(col(key).as("__k"), col(rightTime).cast(LongType).as("__t"),
        lit(0).as("__side"),
        col(rightTieBreak).cast(LongType).as("__tb"),
        (-col(rightTieBreak).cast(LongType)).as("__tbf"),
        pStruct.as("__p")) ++
        leftFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val lSide = left.select(
      Seq(col(key).as("__k"), col(leftTime).cast(LongType).as("__t"),
        lit(1).as("__side"), lit(Long.MaxValue).as("__tb"),
        lit(Long.MaxValue).as("__tbf"), lit(null).cast(pType).as("__p")) ++
        leftFields.map(f => col(f.name)): _*)

    // backward: rights sort before lefts at equal time (inclusive); last
    // right seen among time-ties has the largest __tb and wins
    val wb = Window.partitionBy("__k")
      .orderBy(col("__t").asc_nulls_first, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward = backward on the reversed time axis: walk times descending,
    // rights still before lefts at equal time (inclusive); __tbf = −tb so
    // the last right seen among time-ties is the SMALLEST tb
    val wf = Window.partitionBy("__k")
      .orderBy(col("__t").desc_nulls_first, col("__side").asc, col("__tbf").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def gated(c: Column, dist: Column) =
      if (toleranceUs < 0) c else when(dist <= lit(toleranceUs), c)
    val unioned = lSide.union(rSide)
      .withColumn("__cb", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__cf", last(col("__p"), ignoreNulls = true).over(wf))
      .withColumn("__b", gated(col("__cb"), col("__t") - col("__cb").getField("__rt")))
      .withColumn("__f", gated(col("__cf"), col("__cf").getField("__rt") - col("__t")))
    val chosen = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .otherwise(when(col("__t") - col("__b").getField("__rt") <=
          col("__f").getField("__rt") - col("__t"),
        col("__b")).otherwise(col("__f")))

    unioned.where(col("__side") === 1)
      .withColumn("__m", chosen)
      .select(leftFields.map(f => col(f.name)) ++
        ((s"$prefix$rightTime", col("__m").getField("__rt")) +:
          pCols.map(p => (s"$prefix$p", col("__m").getField(p))))
          .map { case (n, c) => c.as(n) }: _*)
  }

  /** Range (interval) join via time-binning: each `intervals` row
    * [startCol, endCol] (inclusive bounds, long values) matches every
    * `points` row whose `pointTime` falls inside it and whose `keys` match.
    * OSS Spark plans a bare `p.ts BETWEEN i.s AND i.e` predicate as a
    * broadcast-nested-loop (or cartesian) join — quadratic per key. This
    * operator makes it an EQUI-join: intervals explode to the `binWidth`-
    * sized bins they cover, points compute their single containing bin, and
    * the join keys on (keys…, bin) with the range predicate left as a cheap
    * post-filter. Each qualifying (point, interval) pair meets in EXACTLY
    * one bin — the point's — so no dedup pass is needed.
    *
    * Scale shape: shuffle on (keys, bin) distributes uniformly as long as
    * `binWidth` is on the order of the typical interval length (an interval
    * explodes to ~len/binWidth + 1 rows; a bin holds ~binWidth worth of
    * points). Pathological inputs — one giant interval covering everything —
    * degrade to interval-row replication, never to a cartesian product.
    * Column sets must be disjoint apart from `keys` (rename upstream).
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      pointTime: String, startCol: String, endCol: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast(LongType),
        floor(col(endCol) / binWidth).cast(LongType))))
    val pt = points.withColumn("__bin",
      floor(col(pointTime) / binWidth).cast(LongType))
    pt.join(iv, keys :+ "__bin")
      .where(col(pointTime) >= col(startCol) && col(pointTime) <= col(endCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join via the same binning: each `left` interval
    * [`lStart`, `lEnd`] matches every `right` interval [`rStart`, `rEnd`]
    * with equal `keys` that overlaps it — inclusive bounds, i.e.
    * `lStart <= rEnd AND rStart <= lEnd`. The interval×interval analogue of
    * [[rangeJoinBinned]] (timeline alignment: video segments × transcript
    * spans, sessions × incident windows), which OSS Spark would likewise
    * plan as a nested-loop join.
    *
    * Both sides explode to the bins they cover; overlapping pairs share at
    * least one bin, and possibly many — the dedup is FREE, not a distinct
    * pass: a pair is kept only in the overlap region's FIRST bin,
    * `floor(max(lStart, rStart) / binWidth)`. That value equals
    * `max(floor(lStart/w), floor(rStart/w))` (floor and max commute), a bin
    * both sides cover, so every qualifying pair survives in exactly one bin.
    *
    * Scale shape matches [[rangeJoinBinned]]: shuffle on (keys, bin), each
    * interval replicated ~len/binWidth + 1 times, worst case replication —
    * never a cartesian. Bounds must satisfy start <= end on both sides;
    * column sets disjoint apart from `keys`.
    */
  def overlapJoinBinned(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn("__bin",
      explode(sequence(floor(col(s) / binWidth).cast(LongType),
        floor(col(e) / binWidth).cast(LongType))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), keys :+ "__bin")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") ===
          floor(greatest(col(lStart), col(rStart)) / binWidth).cast(LongType))
      .drop("__bin")
  }
}
