package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot lifecycle operators for a corpus that is periodically refreshed:
  * apply a changeset to a base snapshot (CDC merge / MERGE INTO semantics),
  * diff two snapshots (what a re-crawl added/removed/changed), and build
  * SCD-2 validity intervals from a change log. A 100 TB training corpus is
  * not static — crawls re-run, licensing takedowns arrive, quality scores
  * get recomputed — and reprocessing the world per refresh is the cost these
  * operators exist to avoid.
  *
  * Not part of the reference surface (monasca-aggregator is a stateless
  * stream aggregator with no batch snapshots); graft extensions.
  */
object Snapshot {

  /** Apply a changeset to a base snapshot: rows of `changes` REPLACE the
    * base row with the same `key` (upsert — inserts are keys absent from
    * the base), and change rows with `deleteCol = true` remove the key
    * entirely. Both inputs must share the payload schema; `changes` carries
    * the extra boolean `deleteCol`. The changeset must be pre-compacted to
    * at most one row per key (the usual CDC log-compaction contract); with
    * multiple rows per key the survivor among them is the one with the
    * largest `orderCol` value, so passing a version/sequence column makes
    * the uncompacted case deterministic too — PROVIDED (key, orderCol) is
    * unique within the changeset (a log offset is; two change rows tying
    * on both key and version have no defined winner on any engine).
    *
    * Spark-first shape: NOT a join. Base rows are tagged precedence 0 and
    * change rows precedence 1, UNIONed, and one hash exchange on the key
    * feeds a per-key top-1 (`row_number` over precedence desc, orderCol
    * desc) — the same single-shuffle shape as the as-of join. A full-outer
    * join would shuffle both sides too but then pay the pairwise match and
    * a second projection to coalesce 2× columns; the union form also keeps
    * AQE free to coalesce post-shuffle partitions. At 100 TB the base
    * dominates and the changeset is typically <1% — the exchange moves each
    * row once, and a bucketed/partitioned base can skip even that via
    * storage-partitioned scan (SCALE.md).
    */
  def mergeChanges(base: DataFrame, changes: DataFrame, key: String,
      deleteCol: String, orderCol: Option[String] = None): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(key), s"merge key '$key' missing from base")
    require(changes.columns.contains(deleteCol),
      s"changes side must carry boolean '$deleteCol'")
    Seq("__prec", "__ord", "__del", "__rn").foreach { c =>
      require(!payload.contains(c), s"mergeChanges reserves column '$c'")
    }
    val ord = orderCol.map(col).getOrElse(lit(0L))
    val b = base.select(payload.map(col) :+ lit(0).as("__prec") :+
      lit(0L).cast("long").as("__ord") :+ lit(false).as("__del"): _*)
    val c = changes.select(payload.map(col) :+ lit(1).as("__prec") :+
      ord.cast("long").as("__ord") :+ col(deleteCol).as("__del"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__prec").desc, col("__ord").desc)
    b.union(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__del"))
      .select(payload.map(col): _*)
  }

  /** Diff two snapshots of the same table on `key`: one output row per key
    * whose presence or compared payload changed —
    * `change ∈ {added, removed, changed}` (keys equal on every `compare`
    * column are silently dropped). Old values come back as `old_<col>`,
    * new as `new_<col>`; comparison is null-safe (`<=>`), so NULL→NULL is
    * unchanged and NULL→value is a change.
    *
    * Scale shape: this one IS a shuffle join — a diff genuinely needs both
    * sides keyed together, and unlike [[mergeChanges]] neither side
    * dominates. Full-outer hash join on the key: one exchange per side,
    * no window, no sort (SMJ suppressed by leaving Spark free to pick;
    * with both snapshots bucketed by key on disk the exchanges vanish).
    * The unchanged majority is filtered BEFORE the projection so the wide
    * old/new row shape only materializes for actual changes.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      compare: Seq[String]): DataFrame = {
    require(compare.nonEmpty, "diff needs at least one compare column")
    val o = oldSnap.select((key +: compare).map(c => col(c).as(s"old_$c")): _*)
    val n = newSnap.select((key +: compare).map(c => col(c).as(s"new_$c")): _*)
    val ok = col(s"old_$key"); val nk = col(s"new_$key")
    val same = compare.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, ok === nk, "full_outer")
      .filter(ok.isNull || nk.isNull || !same)
      .select(
        coalesce(nk, ok).as(key) +:
          when(ok.isNull, "added").when(nk.isNull, "removed")
            .otherwise("changed").as("change") +:
          compare.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Build SCD-2 validity intervals from a change log: `updates` holds one
    * row per observed state `(key, ts, attrs...)`; output is one row per
    * VERSION — consecutive observations with identical `attrs` collapse
    * into one interval — with `valid_from` = first ts observed at that
    * state and `valid_to` = next version's valid_from (NULL = still
    * current). `(ts, tieBreak)` must be unique within a key (an event id /
    * log offset), so replayed logs produce identical history.
    *
    * Scale shape: ONE hash exchange on the key and one (ts, tieBreak)
    * sort feed everything. No version counter, no re-aggregation: a
    * version's first observation IS its boundary row, so the change-detect
    * lag marks boundaries, the filter keeps only them, and the valid_to
    * lead runs over the survivors — same partitioning, same order, so
    * Catalyst plans a single Exchange + Sort and two pipelined Window ops
    * (pinned in PlanSpec). State never leaves the key's partition; a
    * 100 TB log shards by key exactly like the sessionizer.
    */
  def scd2(updates: DataFrame, key: String, ts: String, attrs: Seq[String],
      tieBreak: String): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val ordered = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(tieBreak).asc)
    // a version boundary is any row whose attrs differ (null-safely) from
    // the previous observation of the same key; the first row always is
    val changed = attrs.map(a => !(col(a) <=> lag(col(a), 1).over(ordered)))
      .reduce(_ || _)
    updates
      .withColumn("__boundary",
        lag(col(ts), 1).over(ordered).isNull || changed)
      .filter(col("__boundary"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(ordered))
      .select((col(key) +: attrs.map(col)) ++
        Seq(col("valid_from"), col("valid_to")): _*)
  }
}
