package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of Z-order clustering is the file-pruning WIN, not the key
  * arithmetic (the driver oracle pins that): this spec builds the zone maps
  * a writer would persist for three candidate layouts of the same events
  * (z-clustered, user-sorted, day-sorted; 16 files each) and counts how many
  * files three predicate shapes must read from min/max stats alone. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val ev = graft.sources.EventsAdapter
    .rawEvents(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"),
      expr("ts_us div 86400000000L").as("day"))

  private def zonesOf(sortKey: org.apache.spark.sql.Column) =
    Layout.zoneMap(
      ev.repartitionByRange(16, sortKey).sortWithinPartitions(sortKey),
      Seq("user_id", "day")).collect()

  private lazy val zZones = Layout.zoneMap(
    Layout.zorderCluster(ev, "user_id", "day", 16),
    Seq("user_id", "day")).collect()
  private lazy val uZones = zonesOf(col("user_id"))
  private lazy val dZones = zonesOf(col("day"))

  private def files(zones: Array[org.apache.spark.sql.Row],
      box: Map[String, (Long, Long)]): Int = {
    import spark.implicits._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(zones.toIndexedSeq, 1),
      Layout.zoneMap(ev, Seq("user_id", "day")).schema)
    Layout.filesRead(df, box).toInt
  }

  // sf0.001: users span 0..14, days 19723..19752; a ~20% box on each dim
  private val userBox = "user_id" -> (3L, 5L)
  private val dayBox = "day" -> (19730L, 19735L)

  test("two-dimensional box: the z layout reads no more files than either sort", SlowTest) {
    val z = files(zZones, Map(userBox, dayBox))
    val u = files(uZones, Map(userBox, dayBox))
    val d = files(dZones, Map(userBox, dayBox))
    assert(z <= u && z <= d, s"z=$z must not lose to user=$u / day=$d")
    assert(z <= 6, s"the box must prune most of the 16 z files, read $z")
  }

  test("single-dimension filters: each sort is blind to the OTHER dimension, z prunes both") {
    val full = (0L, Long.MaxValue >> 2)
    // day filter: user-sorted files nearly all span every day (boundary
    // files where a user changes can be narrower — hence ~, not ==16)
    val uDay = files(uZones, Map("user_id" -> full, dayBox))
    val zDay = files(zZones, Map("user_id" -> full, dayBox))
    assert(uDay >= 13, s"user-sorted layout must be near-blind to a day filter, read $uDay")
    assert(zDay <= 10 && zDay < uDay,
      s"z layout must out-prune the user sort on a day-only filter: z=$zDay u=$uDay")
    // user filter: day-sorted files all span every user — zero pruning
    val dUser = files(dZones, Map(userBox, "day" -> full))
    val zUser = files(zZones, Map(userBox, "day" -> full))
    assert(dUser >= 13, s"day-sorted layout must be near-blind to a user filter, read $dUser")
    assert(zUser <= 14 && zUser < dUser,
      s"z layout must out-prune the day sort on a user-only filter: z=$zUser d=$dUser")
  }

  test("hilbert curve: bijective on the order-3 grid, consecutive indexes " +
      "grid-adjacent (the continuity Z cannot offer)") {
    import spark.implicits._
    val pts = (0L until 8L).flatMap(x => (0L until 8L).map(y => (x, y)))
      .toDF("x", "y")
    val got = pts.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), 3).as("h"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // bijection: the 64 cells map exactly onto 0..63
    assert(got.map(_._3).toSeq == (0L until 64L))
    // classic orientation starts at the origin
    assert((got.head._1, got.head._2) == ((0L, 0L)))
    // continuity: every consecutive index pair is grid-adjacent — the
    // property Z-order lacks (its quadrant seams jump diagonally)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
          s"non-adjacent step $a -> $b")
      case _ =>
    }
    // Z on the same grid violates continuity at least once (the seam jump)
    val z = pts.select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(z.sliding(2).exists {
      case Array(a, b) => math.abs(a._1 - b._1) + math.abs(a._2 - b._2) > 1
      case _ => false
    })
  }

  // SlowTest: a full 16-file clustering write path; the order-3 grid test
  // above plus the driver oracle gate keep the fast coverage
  test("hilbert layout: prunes the 2-D box at least as well as both " +
      "single sorts", SlowTest) {
    val hZones = Layout.zoneMap(
      Layout.hilbertCluster(ev, "user_id", "day", order = 21, numFiles = 16),
      Seq("user_id", "day")).collect()
    val h = files(hZones, Map(userBox, dayBox))
    val u = files(uZones, Map(userBox, dayBox))
    val d = files(dZones, Map(userBox, dayBox))
    assert(h <= u && h <= d, s"hilbert=$h must not lose to user=$u / day=$d")
    assert(h <= 6, s"the box must prune most of the 16 hilbert files, read $h")
  }

  test("zone maps partition the data: counts sum to the input, 16 files") {
    assert(zZones.length == 16)
    val total = zZones.map(_.getAs[Long]("rows")).sum
    assert(total == ev.count(), s"zone rows must cover the table: $total")
  }
}
