package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization — a graft extension beyond the reference's tumbling windows
  * (aggregation/aggregation_rule.go:51 knows only fixed windows): events of
  * the same (tenant, key) closer than `gapSec` merge into one session via
  * Spark's native `session_window`, which is streaming-capable (watermark +
  * append mode) with state merged incrementally per key.
  *
  * Window semantics (and the gaps-and-islands SQL oracle mirrors this
  * exactly): an event at t extends its session to [start, t + gap); the next
  * event merges iff its session overlaps OR TOUCHES the previous one
  * (Spark merges on next_start <= prev_end), i.e. a NEW session starts only
  * when ts − prev_ts > gap, with a boundary event at exactly prev_ts + gap
  * still merging. Session start = first event's timestamp, end = last
  * event's timestamp + gap.
  *
  * Scale shape: one exchange on (tenant, key); Spark sorts within partitions
  * and merges adjacent windows — no per-event state beyond the open session,
  * and in streaming the state store holds one entry per open session.
  */
object Sessions {

  /** Per-(tenant, dimKey) sessions over MetricEnvelope rows: micro-second
    * session bounds, event count and value sum. */
  def sessionize(envs: DataFrame, gapSec: Long, dimKey: String = "user_id"): DataFrame =
    aggregate(prepare(envs, dimKey), gapSec)

  /** Streaming sessionization: identical plan with a watermark inserted
    * before the stateful aggregation — append mode emits each session once,
    * when the watermark passes its end; state holds only OPEN sessions. */
  def sessionizeStreaming(envs: DataFrame, gapSec: Long, lagSec: Long,
      dimKey: String = "user_id"): DataFrame =
    aggregate(prepare(envs, dimKey).withWatermark("event_ts", s"$lagSec seconds"), gapSec)

  private def prepare(envs: DataFrame, dimKey: String): DataFrame =
    envs.select(
        col("meta").getItem("tenantId").as("tenant_id"),
        col("metric.dimensions").getItem(dimKey).as("key"),
        (col("metric.timestamp") / 1000).cast("timestamp").as("event_ts"),
        col("metric.value").as("value"))
      .filter(col("key").isNotNull)

  private def aggregate(prepared: DataFrame, gapSec: Long): DataFrame = {
    require(gapSec >= 1, s"gapSec must be >= 1, got $gapSec")
    prepared
      .groupBy(session_window(col("event_ts"), s"$gapSec seconds").as("sw"),
        col("tenant_id"), col("key"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("tenant_id"), col("key"), col("n_events"), col("sum_value"))
  }

  /** Funnel analysis — ordered step progression per user: step 1's time is
    * the user's earliest `steps(0)` event; step k's time is the earliest
    * `steps(k−1)` event AT OR AFTER step k−1's time and within `horizonUs`
    * of it. Output: one row per user that reached step 1, with
    * `step_1_us … step_n_us` (NULL once the funnel breaks) and `n_steps`
    * reached — the per-user row an aggregation turns into the classic
    * funnel-conversion report.
    *
    * Scale shape: step 1 is one map-side-combined min per user; each later
    * step is ONE keyed equi-join on the user between the (tiny) frontier
    * relation and that step's pre-filtered events, followed by another
    * combined min — steps·2 exchanges over per-type slices, never a window
    * over the full event log and never a product. Deterministic by
    * construction: only `min(ts)` decides, so same-timestamp ties are
    * irrelevant. */
  def funnel(events: DataFrame, steps: Seq[String], horizonUs: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      timeUsCol: String = "ts_us"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(horizonUs >= 1, s"horizonUs must be >= 1, got $horizonUs")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(timeUsCol).cast("long")).as("step_1_us"))
    val funneled = steps.zipWithIndex.tail.foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"step_${i}_us"
        val cur = s"step_${i + 1}_us"
        val stepEvents = events.filter(col(typeCol) === step)
          .select(col(userCol), col(timeUsCol).cast("long").as("__graft_ts"))
        acc.join(stepEvents, Seq(userCol), "left")
          .withColumn("__graft_hit",
            when(col("__graft_ts") >= col(prev) &&
              col("__graft_ts") <= col(prev) + lit(horizonUs), col("__graft_ts")))
          .groupBy((userCol +: (1 to i).map(j => s"step_${j}_us")).map(col): _*)
          .agg(min(col("__graft_hit")).as(cur))
    }
    funneled.withColumn("n_steps",
      (1 to steps.size).map(i => when(col(s"step_${i}_us").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /** Pairwise association rules over baskets (market-basket analysis,
    * the support/confidence/lift of Agrawal et al. 1993 restricted to
    * 2-itemsets — the size that stays tractable declaratively): a basket
    * is the DISTINCT item set of one `basketCols` group, and for every
    * co-occurring unordered item pair the output carries
    * `(item_a, item_b, n_ab, n_a, n_b, support, confidence_ab, lift)` —
    * support = n_ab/N, confidence(a→b) = n_ab/n_a, lift = n_ab·N/(n_a·n_b),
    * each ONE IEEE division/multiply over exact integer counts (engine-
    * portable). `minPairCount` prunes the noise tail before the stats
    * joins.
    *
    * Scale shape: the corpus collapses to the distinct (basket, item)
    * relation in one map-side-combined exchange; the pair join is keyed on
    * the basket and fans out C(items-per-basket, 2) — bounded by the
    * per-basket item cap, NOT corpus size (items-per-basket is small by
    * construction: event types, categories, tags); the basket total N is a
    * 1-row broadcast and the per-item counts join on the item key. */
  def associationRules(df: DataFrame, basketCols: Seq[String],
      itemCol: String, minPairCount: Long = 1): DataFrame = {
    require(basketCols.nonEmpty, "associationRules needs basket key columns")
    val b = basketCols.map(col)
    val baskets = df.select(b :+ col(itemCol).as("item"): _*).distinct()
    val nb = baskets.select(b: _*).distinct()
      .agg(count(lit(1)).as("__nb"))
    val itemCounts = baskets.groupBy("item").agg(count(lit(1)).as("__ni"))
    val pairs = baskets.toDF(basketCols :+ "item_a": _*)
      .join(baskets.toDF(basketCols :+ "item_b": _*), basketCols)
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("item").as("item_a"), col("__ni").as("n_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"), col("__ni").as("n_b")), "item_b")
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("__nb").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence_ab"),
        ((col("n_ab") * col("__nb")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** Cohort retention: users grouped by their FIRST active time bucket
    * (cohort), counted per (cohort, age) where age = bucket − cohort —
    * `(cohort_bucket, age, n_active, n_cohort, retention)`, the classic
    * retention triangle. `retention` = n_active / n_cohort from two exact
    * longs (one IEEE division — engine-stable); age 0 is the cohort itself
    * (retention 1.0). Buckets use the same truncating `div` contract as the
    * trailing aggregates — document/guard ts ≥ 0 (`d7_trailing` note).
    *
    * Scale shape: ONE corpus-touching exchange — the distinct (user,
    * bucket) aggregate (map-side combined); the cohort min re-groups the
    * already user-bucket-sized relation, rides a keyed join back, and the
    * (cohort, age) count plus the broadcast-sized cohort-size join are all
    * post-distinct relations. Nothing downstream of the first aggregate
    * ever sees raw events. */
  def retention(events: DataFrame, bucketUs: Long, userCol: String = "user_id",
      timeUsCol: String = "ts_us"): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val ud = events.select(col(userCol).as("k"),
        expr(s"CAST($timeUsCol AS BIGINT) div $bucketUs").as("d"))
      .distinct()
    val cohort = ud.groupBy("k").agg(min("d").as("c"))
    val active = ud.join(cohort, "k")
      .groupBy(col("c").as("cohort_bucket"), (col("d") - col("c")).as("age"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohort.groupBy(col("c").as("cohort_bucket"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(sizes, "cohort_bucket")
      .select(col("cohort_bucket"), col("age"), col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention"))
  }
}
