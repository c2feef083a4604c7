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

  test("two-dimensional box: the z layout reads no more files than either sort") {
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

  test("zone maps partition the data: counts sum to the input, 16 files") {
    assert(zZones.length == 16)
    val total = zZones.map(_.getAs[Long]("rows")).sum
    assert(total == ev.count(), s"zone rows must cover the table: $total")
  }
}
