package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout optimization for multi-dimensional read pruning: Z-order
  * (Morton) clustering, the standard technique for making parquet row-group
  * min/max zone maps selective on MORE THAN ONE column at once (Morton 1966;
  * the same layout Delta/Iceberg expose as `OPTIMIZE ZORDER BY`).
  *
  * Why this matters at 100 TB: a table range-sorted on one column prunes
  * scans filtered on that column only — a filter on any other dimension
  * reads everything. Interleaving the bits of two dimensions into one sort
  * key bounds every file's extent in BOTH dimensions, so a predicate box on
  * either (or both) skips most files from the footer min/max alone — no
  * index, no extra shuffle at read time, just a better sort key at write
  * time.
  *
  * Everything is plain bitwise arithmetic on built-in expressions — the
  * whole z-value computation stays inside whole-stage codegen and constant-
  * folds when inputs are literal, and the DuckDB oracle replays it with the
  * identical mask chain.
  */
object Layout {

  /** Spread the low 31 bits of `c` to even bit positions 0,2,…,60 — the
    * classic public mask-shift Morton spread (each step doubles the gap).
    * Inputs are masked to 31 bits, so every intermediate and the final
    * interleave stay strictly positive in a signed 64-bit long: the same
    * arithmetic is exact on any engine with BIGINT shifts. */
  private[operators] def spread31(c: Column): Column = {
    val b0 = c.bitwiseAND(lit(0x7fffffffL))
    val b1 = b0.bitwiseOR(shiftleft(b0, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    val b2 = b1.bitwiseOR(shiftleft(b1, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    val b3 = b2.bitwiseOR(shiftleft(b2, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    val b4 = b3.bitwiseOR(shiftleft(b3, 2)).bitwiseAND(lit(0x3333333333333333L))
    b4.bitwiseOR(shiftleft(b4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Z (Morton) value of two non-negative dimensions: x's bits on
    * even positions, y's on odd. Dimensions beyond 31 bits must be reduced
    * first (bucket, pmod, or shift) — the mask silently drops high bits,
    * which would silently break locality, so prefer an explicit reduction. */
  def zValue(x: Column, y: Column): Column =
    spread31(x.cast("long")).bitwiseOR(shiftleft(spread31(y.cast("long")), 1))

  /** N-dimensional Z value: bit j of dimension i lands at position
    * j·n + i, interleaving `bitsEach` low bits of every dimension
    * (n·bitsEach ≤ 62 keeps the result positive). The 2-dim case is
    * bit-identical to [[zValue]] at bitsEach=31 (property-pinned) — prefer
    * [[zValue]] there (5 mask steps vs 62 bit extracts); this general form
    * covers 3+ clustering dimensions (e.g. user × day × hour). The per-bit
    * extracts are all native expressions: still whole-stage codegen, still
    * replayable in plain SQL bit arithmetic. */
  def zValueN(dims: Seq[Column], bitsEach: Int): Column = {
    require(dims.size >= 2, s"need >= 2 dimensions, got ${dims.size}")
    require(bitsEach >= 1 && dims.size * bitsEach <= 62,
      s"${dims.size} dims × $bitsEach bits must fit 62 bits")
    dims.zipWithIndex.map { case (c, i) =>
      val cl = c.cast("long")
      (0 until bitsEach).map { j =>
        shiftleft(shiftright(cl, j).bitwiseAND(lit(1L)), j * dims.size + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for writing: range-partition into `numFiles` output
    * partitions by the z-value of the two dimensions and sort within each —
    * one shuffle at WRITE time, after which every output file's min/max
    * footer is tight in both dimensions. The z column is dropped; the
    * writer's own parquet stats do the rest. */
  def zorderCluster(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = "__graft_z"
    df.withColumn(z, zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** 2-D HILBERT curve value of two non-negative dimensions (masked to the
    * low `order` bits each — same explicit-reduction caveat as [[zValue]]):
    * the continuous space-filling alternative to Z-order. Consecutive
    * Hilbert indexes are always grid-adjacent, so equal-count file cuts
    * get tighter per-file bounding boxes than the Z curve's quadrant
    * jumps — strictly better min/max pruning on skewed predicate boxes.
    * One codegen'd [[graft.functions.HilbertIndex2D]] per row. */
  def hilbertValue(x: Column, y: Column, order: Int): Column =
    graft.functions.SpaceFillingExpressions.hilbert2d(
      x.cast("long"), y.cast("long"), order)

  /** [[zorderCluster]] with the Hilbert key: range-partition into
    * `numFiles` output partitions by the Hilbert value and sort within —
    * the same one-shuffle write-time clustering, a tighter curve. */
  def hilbertCluster(df: DataFrame, xCol: String, yCol: String, order: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val h = "__graft_h"
    df.withColumn(h, hilbertValue(col(xCol), col(yCol), order))
      .repartitionByRange(numFiles, col(h))
      .sortWithinPartitions(col(h))
      .drop(h)
  }

  /** The zone map a writer would persist: per output partition (= file),
    * min/max of each listed dimension plus the row count — the audit
    * surface for "how prunable is this layout". Runs as one narrow
    * partition-local aggregation over the already-clustered frame. */
  def zoneMap(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "zoneMap needs at least one dimension")
    df.withColumn("__file", spark_partition_id())
      .groupBy(col("__file"))
      .agg(count(lit(1)).as("rows"),
        dims.flatMap(d => Seq(min(col(d)).as(s"${d}_min"),
          max(col(d)).as(s"${d}_max"))): _*)
  }

  /** How many of `zones`' files a conjunctive box predicate must read —
    * the number the layout exists to minimize. Pure arithmetic over the
    * zone-map rows (file-count-sized, not data-sized). */
  def filesRead(zones: DataFrame, bounds: Map[String, (Long, Long)]): Long =
    zones.where(bounds.map { case (d, (lo, hi)) =>
        col(s"${d}_min") <= hi && col(s"${d}_max") >= lo
      }.reduce(_ && _)).count()
}
