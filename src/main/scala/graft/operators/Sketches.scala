package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Mergeable cardinality / resemblance sketches for corpus profiling at
  * 100 TB: KMV (k-minimum-values, a.k.a. bottom-k) distinct-count estimation
  * and cross-source set-resemblance (Jaccard) estimation.
  *
  * Why KMV and not HyperLogLog: Spark's `approx_count_distinct` (HLL++) is
  * register-layout-dependent — no external engine can replay it, so it can
  * never sit behind the project's exact-equality oracle gate. KMV's sketch is
  * just "the k smallest distinct values of a deterministic hash": given the
  * same portable hash the sketch — and therefore the ESTIMATE — is
  * bit-reproducible on any engine (the DuckDB oracle replays it exactly),
  * while keeping the same mergeability story as HLL (union of two sketches =
  * k smallest of the union of their value sets; estimators in Bar-Yossef et
  * al. 2002 "Counting distinct elements in a data stream" and Beyer et al.
  * 2007 "On synopses for distinct-value estimation under multiset
  * operations").
  *
  * Scale shape: the ONLY corpus-wide stage is the per-group bottom-k, which
  * plans as a partial WindowGroupLimit BELOW the group exchange — each input
  * partition forwards only rows carrying its k smallest distinct hashes, so
  * the shuffle moves ≈ k·partitions rows per group, never the distinct value
  * set (the trap an exact `groupBy(group, h)` pre-dedup would re-create).
  * Everything after the sketch is sketch-sized (k rows per group).
  */
object Sketches {

  /** Exclusive upper bound of [[Sampling.hashRaw]]'s range (the Mersenne
    * prime 2³¹−1) — the denominator domain of the KMV estimator below. */
  val HashDomain = 2147483647L

  /** The KMV sketch relation: for each group, the k smallest DISTINCT values
    * of `hash` (one row per kept value, columns `groupCols :+ "__h"`).
    *
    * `hash` must be a deterministic per-item hash; ORDER is taken in the
    * column's own type (signed for a 64-bit hash — fine for resemblance,
    * where only a consistent total order matters; use [[Sampling.hashRaw]]'s
    * [0, 2³¹−1) domain when the magnitude feeds an estimator).
    *
    * dense_rank (not row_number) so duplicate hash rows never displace a
    * distinct value from the bottom-k; the trailing distinct() collapses
    * those duplicates on the already-k-bounded survivors. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(groupCols.nonEmpty, "kmvSketch needs at least one group column")
    val g = groupCols.map(col)
    val rk = dense_rank().over(
      Window.partitionBy(g: _*).orderBy(col("__h").asc))
    df.select(g :+ hash.as("__h"): _*)
      .withColumn("__rk", rk)
      .where(col("__rk") <= k)
      .select(g :+ col("__h"): _*)
      .distinct()
  }

  /** Distinct-count estimate per group from a k-sized KMV sketch over
    * [[Sampling.hashRaw]] of `id` — `(group, est_distinct)`.
    *
    * Estimator, all-integer so every engine computes the identical value:
    * with m = |sketch| and h_k = max(sketch),
    *   m < k  → est = m                       (the sketch IS the value set)
    *   m = k  → est = (k−1)·P div (h_k + 1)   (bottom-k estimator with
    *            U_(k) ≈ (h_k+1)/P; relative standard error ≈ 1/√(k−2))
    * Hash collisions of distinct ids merge in the sketch — part of the
    * estimator's error budget, identical on every replay. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], idCol: Column,
      k: Int, seed: Long = 42): DataFrame = {
    val sk = kmvSketch(df, groupCols, Sampling.hashRaw(idCol, seed), k)
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__m"), max(col("__h")).as("__hk"))
      .select(groupCols.map(col) :+
        when(col("__m") < k, col("__m"))
          .otherwise(expr(s"(${(k - 1).toLong} * ${HashDomain}L) div (__hk + 1L)"))
          .cast("long").as("est_distinct"): _*)
  }

  /** Cross-group resemblance: for every unordered pair of groups, the
    * union-sketch Jaccard estimate over a shared deterministic item hash —
    * `(g_a, g_b, n_union_k, n_both, jaccard_est)`.
    *
    * Method (Beyer et al. 2007 §5 / classic minwise resemblance): take the k
    * smallest distinct hashes of the pair's UNION (computable from the two
    * per-group sketches alone — the union's bottom-k is a subset of the
    * sketches' union), count how many of those k live in BOTH groups;
    * jaccard_est = n_both / n_union_k is unbiased for |A∩B| / |A∪B|.
    *
    * The corpus is touched once (the per-group sketch); the pair stage runs
    * on k·groups rows — with g groups it materializes g·(g−1)/2 pairs, so it
    * targets the source/shard-profiling regime (tens to thousands of groups),
    * not pairwise-document similarity (that is [[Dedup]]'s job). */
  /** Mergeable fixed-bin histogram quantiles — the corpus-scale path for
    * per-group p50/p95/p99 when exact `percentile` (which buffers every
    * value per group) stops being affordable. The bin layout (lo, width,
    * bins) is FIXED up front, so per-partition histograms merge by plain
    * addition — map-side combine collapses each input partition to ≤ bins
    * rows per group before the one group exchange, and a second tiny
    * exchange never exceeds bins rows per group.
    *
    * Returned quantile = the LOWER EDGE of the first bin whose cumulative
    * count reaches ceil(q·n): deterministic, engine-portable (the DuckDB
    * oracle replays it bit-for-bit), and within one bin width of the exact
    * quantile by construction — the sketch's stated resolution, not an
    * estimate with a tail. Values below `lo` clamp into bin 0 and values
    * beyond the last edge into bin `bins−1` (their edges then under/
    * over-state accordingly — size the layout from a profile first).
    *
    * Why not t-digest/KLL: their merge results depend on buffer order, so
    * no external engine can replay them; the fixed layout trades adaptive
    * resolution for bit-reproducibility and associativity. */
  def histQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, width: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(width > 0, s"width must be > 0, got $width")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    val g = groupCols.map(col)
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0)),
      lit((bins - 1).toLong)).cast("long")
    val counts = df.select(g :+ bin.as("__bin"): _*)
      .groupBy(g :+ col("__bin"): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(g: _*).orderBy(col("__bin").asc)
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val edge = lit(lo) + col("__bin").cast("double") * lit(width)
    cum.groupBy(g: _*).agg(
      min(when(col("__cum") >= ceil(lit(qs.head) * col("__n")), edge))
        .as(qName(qs.head)),
      qs.tail.map(q =>
        min(when(col("__cum") >= ceil(lit(q) * col("__n")), edge))
          .as(qName(q))): _*)
  }

  private def qName(q: Double): String =
    "p" + (q * 100).round.toString

  /** KMV state: the ≤ k smallest distinct 64-bit hashes, kept sorted in
    * UNSIGNED order (array state encodes ~6× cheaper per state-store
    * round-trip than a collection — same measurement as
    * [[HeavyHitters.PackedCounts]]). */
  case class KmvHashes(hashes: Array[Long])

  /** One emitted per-(window, tenant) distinct estimate. */
  case class KmvEstimate(window_start: Long, tenant_id: String,
      est_distinct: Long)

  /** The 64-bit-domain KMV estimator over an unsigned-sorted bottom-k array:
    * exact below k, else (k−1)·2⁶⁴ / (h_k+1) with h_k read as unsigned
    * (BigInt only at emission — once per closed group, never per row). */
  def kmvEstimate64(sortedUnsigned: Array[Long], k: Int): Long =
    if (sortedUnsigned.length < k) sortedUnsigned.length.toLong
    else {
      val hk = BigInt(java.lang.Long.toUnsignedString(sortedUnsigned.last))
      ((BigInt(k - 1) << 64) / (hk + 1)).toLong
    }

  /** STREAMING distinct-count estimate per (event-time window, tenant) —
    * the KMV counterpart of [[HeavyHitters.byWindowStreaming]], and the
    * bounded-state replacement for streaming `dropDuplicates`+count when
    * per-window cardinality is unbounded: state is O(k) longs per open
    * window REGARDLESS of stream cardinality, merged per batch in
    * O(rows·log k).
    *
    * The estimate is emitted exactly once, when the watermark passes the
    * window end (+lag): an estimate over a half-open window would repeat
    * with a different value per batch, which Append mode can't retract.
    * The hash is the portable [[graft.functions.PolyHash64]] over the dim
    * value, estimator = [[kmvEstimate64]] (64-bit unsigned domain — the
    * string-keyed twin of [[kmvDistinct]]'s 31-bit numeric-id domain), so a
    * batch replay over the same envelope rows reproduces the emission
    * bit-for-bit (golden-tested in StreamingSpec). */
  def kmvDistinctStreaming(envs: DataFrame, windowSizeSec: Long,
      dimKey: String, k: Int, lagSec: Long): Dataset[KmvEstimate] = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = envs.sparkSession
    import spark.implicits._
    val input = envs.select(
        col("meta").getItem("tenantId").as("tenant_id"),
        col("metric.dimensions").getItem(dimKey).as("value"),
        (col("metric.timestamp") / 1000).cast("timestamp").as("event_ts"))
      .filter(col("value").isNotNull)
      .withWatermark("event_ts", s"$lagSec seconds")
      .withColumn("window_start",
        (floor(col("event_ts").cast("double") / windowSizeSec) * windowSizeSec)
          .cast("long"))
      // the hash runs as a codegen'd column BEFORE the state function —
      // rows reach the state store as (keys, one long); event_ts rides
      // along for the event-time timeout to resolve
      .select(col("window_start"), col("tenant_id"),
        graft.functions.HashExpressions.polyHash64(col("value")).as("h"),
        col("event_ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
    input.groupByKey { case (w, t, _, _) => (w, t) }
      .flatMapGroupsWithState[KmvHashes, KmvEstimate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((w, t), rows, state) =>
          if (state.hasTimedOut) {
            val hs = state.get.hashes
            state.remove()
            Iterator.single(KmvEstimate(w, t, kmvEstimate64(hs, k)))
          } else {
            val cmp = new java.util.Comparator[java.lang.Long] {
              def compare(a: java.lang.Long, b: java.lang.Long): Int =
                java.lang.Long.compareUnsigned(a, b)
            }
            val set = new java.util.TreeSet[java.lang.Long](cmp)
            state.getOption.foreach(_.hashes.foreach(h => set.add(h)))
            rows.foreach { case (_, _, h, _) =>
              if (set.size < k) set.add(h)
              else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
                set.add(h)
                if (set.size > k) set.pollLast()
              }
            }
            val out = new Array[Long](set.size)
            val it = set.iterator
            var i = 0
            while (it.hasNext) { out(i) = it.next(); i += 1 }
            state.update(KmvHashes(out))
            state.setTimeoutTimestamp(math.max((w + windowSizeSec) * 1000,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** HLL register state: one byte per bucket (m = 2^p), 0 = "no value hashed
    * here yet" — 256 bytes/window at p=8, the cheapest bounded-cardinality
    * state in the file. */
  case class HllRegs(regs: Array[Byte])

  case class HllEstimate(window_start: Long, tenant_id: String,
      est_distinct: Long)

  /** The [[hllDistinct]] estimator over a raw register array — the SAME
    * integer math ([[hllAlphaScaled]], 2^K scaling, [[hllLnLut]] linear
    * counting), factored so the streaming emission below is bit-identical
    * to a batch replay over the same rows (golden-tested). */
  def hllEstimateFromRegisters(regs: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val K = 65 - p
    var cnt = 0
    var s1 = BigInt(0)
    var i = 0
    while (i < m) {
      val r = regs(i).toInt
      if (r > 0) { cnt += 1; s1 += BigInt(1) << (K - r) }
      i += 1
    }
    val v = m - cnt
    val sp = (BigInt(v) << K) + s1
    val raw = (BigInt(hllAlphaScaled(m)) * m * m * (BigInt(1) << K) /
      (sp * 1000000L)).toLong
    if (raw * 2 <= 5L * m && v > 0) (m.toLong * hllLnLut(m)(v - 1)._2) / (1L << 20)
    else raw
  }

  /** STREAMING distinct-count estimate per (event-time window, tenant) via
    * portable HLL — the register-state sibling of [[kmvDistinctStreaming]]:
    * state is a FLAT m-byte array regardless of stream cardinality, merged
    * per batch in O(rows) byte-max updates (no tree, no sort), and the
    * estimate — emitted exactly once when the watermark passes the window
    * end (+lag) — replays bit-for-bit as the batch [[hllDistinct]] over the
    * same envelope rows. The hash runs as a codegen'd [[graft.functions
    * .PolyHash64]] column BEFORE the state function, so rows reach the
    * state store as (keys, one long). */
  def hllDistinctStreaming(envs: DataFrame, windowSizeSec: Long,
      dimKey: String, p: Int, lagSec: Long): Dataset[HllEstimate] = {
    require(p >= 4 && p <= 14, s"precision p must be in [4,14], got $p")
    val spark = envs.sparkSession
    import spark.implicits._
    val m = 1 << p
    val K = 65 - p
    val input = envs.select(
        col("meta").getItem("tenantId").as("tenant_id"),
        col("metric.dimensions").getItem(dimKey).as("value"),
        (col("metric.timestamp") / 1000).cast("timestamp").as("event_ts"))
      .filter(col("value").isNotNull)
      .withWatermark("event_ts", s"$lagSec seconds")
      .withColumn("window_start",
        (floor(col("event_ts").cast("double") / windowSizeSec) * windowSizeSec)
          .cast("long"))
      .select(col("window_start"), col("tenant_id"),
        graft.functions.HashExpressions.polyHash64(col("value")).as("h"),
        col("event_ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
    input.groupByKey { case (w, t, _, _) => (w, t) }
      .flatMapGroupsWithState[HllRegs, HllEstimate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((w, t), rows, state) =>
          if (state.hasTimedOut) {
            val regs = state.get.regs
            state.remove()
            Iterator.single(HllEstimate(w, t, hllEstimateFromRegisters(regs, p)))
          } else {
            val regs = state.getOption.map(_.regs.clone())
              .getOrElse(new Array[Byte](m))
            rows.foreach { case (_, _, h, _) =>
              val b = (h & (m - 1)).toInt
              val wbits = h >>> p
              val rho =
                if (wbits == 0L) K
                else K - (64 - java.lang.Long.numberOfLeadingZeros(wbits))
              if (rho > regs(b)) regs(b) = rho.toByte
            }
            state.update(HllRegs(regs))
            state.setTimeoutTimestamp(math.max((w + windowSizeSec) * 1000,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  def kmvOverlap(df: DataFrame, groupCol: String, hash: Column,
      k: Int): DataFrame = {
    val sk = kmvSketch(df, Seq(groupCol), hash, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcs = sk.select(col(groupCol)).distinct()
    // tiny (groups²/2 rows); both joins below broadcast it
    val pairs = srcs.select(col(groupCol).as("g_a"))
      .crossJoin(srcs.select(col(groupCol).as("g_b")))
      .where(col("g_a") < col("g_b"))
    val aRows = pairs.join(sk.withColumnRenamed(groupCol, "g_a"), Seq("g_a"))
      .select(col("g_a"), col("g_b"), col("__h"), lit(0).as("__side"))
    val bRows = pairs.join(sk.withColumnRenamed(groupCol, "g_b"), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("__h"), lit(1).as("__side"))
    // membership of each union hash in each side, then the union's bottom-k
    val mem = aRows.unionByName(bRows)
      .groupBy(col("g_a"), col("g_b"), col("__h"))
      .agg(max(when(col("__side") === 0, 1).otherwise(0)).as("__ina"),
        max(when(col("__side") === 1, 1).otherwise(0)).as("__inb"))
    val rk = dense_rank().over(
      Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("__h").asc))
    val out = mem.withColumn("__rk", rk).where(col("__rk") <= k)
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_union_k"),
        sum(col("__ina") * col("__inb")).as("n_both"))
      .select(col("g_a"), col("g_b"), col("n_union_k"), col("n_both"),
        (col("n_both").cast("double") / col("n_union_k").cast("double"))
          .as("jaccard_est"))
    out
  }

  // ------------------------------------------- portable HyperLogLog

  /** Registers-per-group of a PORTABLE HyperLogLog sketch (Flajolet et al.
    * 2007): bucket = low `p` bits of the portable 64-bit
    * [[graft.functions.PolyHash64]], rho = leading-zero count of the
    * remaining 64−p bits + 1, register = max rho per bucket. Unlike Spark's
    * built-in `approx_count_distinct` (HLL++, engine-private register
    * layout and bias tables — unreplayable by construction, see the KMV
    * note above), every piece here is plain integer arithmetic over a
    * published hash, so the DuckDB oracle replays registers AND estimate
    * bit-for-bit. Rows: ≤ m = 2^p per group, one map-side-combined
    * exchange (partial max below the shuffle — the same shape as any
    * grouped agg); registers MERGE across shards/days by per-bucket max,
    * which is exactly re-running this aggregate over a union.
    *
    * rho via `length(bin(w))`: both engines print a long's minimal binary
    * form, so (65−p) − bitlen(w) == Long.numberOfLeadingZeros arithmetic
    * without a custom expression; w == 0 (all remaining bits zero) takes
    * the maximal rho = 65−p. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], hash: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"precision p must be in [4,14], got $p")
    val m = 1L << p
    val maxRho = 65 - p
    val g = groupCols.map(col)
    df.select(g :+ hash.as("__h"): _*)
      .select(g :+ col("__h").bitwiseAND(lit(m - 1)).as("__b") :+
        expr(s"shiftrightunsigned(__h, $p)").as("__w"): _*)
      .select(g :+ col("__b") :+
        when(col("__w") === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("__w"))))
          .cast("int").as("__rho"): _*)
      .groupBy(g :+ col("__b"): _*)
      .agg(max(col("__rho")).as("reg"))
  }

  /** alpha_m correction constant, scaled by 10⁶ and floored — an exact
    * integer both engines multiply with (never a runtime double). */
  def hllAlphaScaled(m: Int): Long = {
    require(m >= 128, s"the alpha_m closed form here assumes m >= 128, got $m")
    math.floor(1e6 * 0.7213 / (1 + 1.079 / m)).toLong
  }

  /** The linear-counting lookup table (V zero registers → round(ln(m/V)·2²⁰))
    * — ONE Scala source of truth for the engine's broadcast relation and the
    * oracle's VALUES list, so the two can never drift on libm behavior. */
  def hllLnLut(m: Int): Seq[(Long, Long)] =
    (1 to m).map(v => (v.toLong, math.round(math.log(m.toDouble / v) * (1L << 20))))

  /** Distinct-count estimate per group from a portable HLL over
    * [[graft.functions.PolyHash64]] of `idCol` (cast to string) —
    * `(group, est_distinct)`, standard error ≈ 1.04/√m.
    *
    * Estimator, integer-exact end to end: with K = 65−p (max rho) and
    * S′ = Σ_j 2^{K−M_j} over all m registers (absent buckets at M=0),
    *   raw = (⌊α_m·10⁶⌋ · m² · 2^K) div (10⁶ · S′)     — DECIMAL(38,0) sums
    *   est = (m · lut(V)) div 2²⁰  when raw ≤ 5m/2 and V > 0   (linear
    *         counting through the shared [[hllLnLut]]),  else raw.
    * The 2^K scaling makes every register's harmonic term an exact integer,
    * so the sum is associative — identical on any partitioning and in the
    * oracle's HUGEINT replay — where the textbook Σ 2^{−M_j} double sum is
    * neither. No 32-bit large-range correction: 64-bit hashes don't
    * saturate. Per group the post-sketch math touches ≤ m rows; the LUT is
    * an m-row broadcast. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], idCol: Column,
      p: Int = 8): DataFrame = {
    val m = 1 << p
    val K = 65 - p
    val g = groupCols.map(col)
    val spark = df.sparkSession
    import spark.implicits._
    val regs = hllRegisters(df, groupCols,
      graft.functions.HashExpressions.polyHash64(idCol.cast("string")), p)
    val num = BigInt(hllAlphaScaled(m)) * m * m * (BigInt(1) << K)
    val stats = regs.groupBy(g: _*)
      .agg(count(lit(1)).as("__cnt"),
        sum(expr(s"cast(shiftleft(1L, $K - reg) as decimal(38,0))")).as("__s1"))
      .withColumn("__v", lit(m.toLong) - col("__cnt"))
      .withColumn("__sp",
        expr(s"cast($m - __cnt as decimal(38,0)) * cast(${1L << K} as decimal(38,0)) + __s1"))
      .withColumn("__raw", expr(s"cast('$num' as decimal(38,0)) div (__sp * 1000000)"))
    val lut = hllLnLut(m).toDF("__lv", "__lnfp")
    stats.join(broadcast(lut), col("__v") === col("__lv"), "left")
      .select(g :+
        when(col("__raw") * 2 <= lit(5L * m) && col("__v") > 0,
          expr(s"($m * __lnfp) div ${1L << 20}"))
          .otherwise(col("__raw")).as("est_distinct"): _*)
  }

  // --------------------------------------------------- AMS F2 sketch

  /** AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996):
    * estimates F2 = Σ_t f_t² of the key's frequency vector IN ONE NARROW
    * PASS — and F2 is precisely the row count an equi-self-join on that key
    * produces (2·pairs + n), i.e. the fan-out every inverted-index join in
    * [[Dedup]] pays. This is the planning probe behind the df-cap /
    * prefix-filter decisions: measure F2 first, pick the valve, never
    * discover a quadratic join by timing out (the dedup_cosine unigram trap
    * was found by exactly this quantity, computed the slow way).
    *
    * Estimator: `d1·d2` ±1-sign counters — sign_i(key) = bit i of the
    * avalanche-mixed [[graft.functions.PolyHash64]] of the key (ONE hash
    * per row; a structured LCG-style hash's parity is measurably biased —
    * the first cut used [[Sampling.hashRaw]] parities and underestimated
    * 5×) — each counter Z_i = Σ_rows sign_i(key) so E[Z_i²] = F2; means of
    * `d1` squares, median of the `d2` means (medians-of-means, the paper's
    * boosting; d1·d2 ≤ 64 — one bit per counter). Every step is exact
    * integer arithmetic — counter sums are associative longs, squares
    * < 2⁶³ for up to 3·10⁹ rows, the mean a floor division, the median an
    * odd-count array pick — so the DuckDB oracle replays the ESTIMATE
    * bit-for-bit. Sketches merge across shards by counter-wise addition
    * (same bit ⇒ same signs).
    *
    * Plan shape: one map-side-combined global aggregate (d1·d2 long sums),
    * zero exchanges beyond the single-row final combine. */
  def amsF2(df: DataFrame, keyCol: Column, d1: Int = 8, d2: Int = 5): DataFrame = {
    require(d1 >= 1 && d2 >= 1 && d2 % 2 == 1,
      s"need d1 >= 1 and odd d2 >= 1, got d1=$d1 d2=$d2")
    val n = d1 * d2
    require(n <= 64, s"d1*d2 must be <= 64 (one sign bit per counter), got $n")
    val hashed = df.select(
      graft.functions.HashExpressions.polyHash64(keyCol.cast("string")).as("__h"))
    val sums = (0 until n).map { i =>
      sum(expr(s"(shiftrightunsigned(__h, $i) & 1) * 2 - 1").cast("long"))
        .as(s"__z$i")
    }
    val sumSquares = (0 until d2).map { g =>
      (0 until d1).map { j =>
        val z = col(s"__z${g * d1 + j}")
        z * z
      }.reduce(_ + _).as(s"__m$g")
    }
    hashed.agg(sums.head, sums.tail: _*)
      .select(sumSquares: _*)
      .select((0 until d2).map(g => expr(s"__m$g div $d1").as(s"__m$g")): _*)
      .select(element_at(
        array_sort(array((0 until d2).map(g => col(s"__m$g")): _*)),
        (d2 + 1) / 2).as("est_f2"))
  }

  // ------------------------------------------------- Count-Min sketch

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): a `d`×`w` counter
    * matrix where row i counts occurrences hashed by h_i; a point query
    * reads one cell per row and takes the MIN — always ≥ the true count
    * (collisions only inflate), within εN with probability 1−δ for
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Same portability rationale as KMV vs HLL:
    * the rows use [[Sampling.hashRaw]] with seeds 1..d, so the whole matrix
    * — and therefore every estimate — replays bit-for-bit in the DuckDB
    * oracle, unlike an engine-private sketch register layout.
    *
    * Build shape: a d-way explode (narrow — d is 3..8) then ONE map-side-
    * combined groupBy on (row, bucket): each input partition collapses to
    * ≤ d·w partial cells before the exchange, so the shuffle moves
    * d·w·partitions counters, never rows. The result is d·w cells — config-
    * sized, mergeable across shards/days by cell-wise addition. */
  def cmsBuild(df: DataFrame, keyCol: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"depth d must be in [1,16], got $d")
    require(w >= 2, s"width w must be >= 2, got $w")
    val rows = (0 until d).map(i => struct(lit(i).as("r"),
      pmod(Sampling.hashRaw(keyCol, i + 1), lit(w.toLong)).as("b")))
    df.select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` against a built sketch: min over the d
    * rows of the probed cell, 0 when every cell is empty. The sketch is
    * d·w rows — broadcast, so probing any number of keys is one narrow
    * broadcast join, no shuffle of the probe side. `d`/`w` must match the
    * build. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val rows = (0 until d).map(i => struct(lit(i).as("r"),
      pmod(Sampling.hashRaw(col(keyCol), i + 1), lit(w.toLong)).as("b")))
    probes
      .select(col(keyCol), explode(array(rows: _*)).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cms), Seq("r", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
