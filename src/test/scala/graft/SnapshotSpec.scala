package graft

import graft.operators.{FuzzyString, Snapshot}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot lifecycle (CDC merge / diff / SCD-2) and the SymSpell
  * edit-distance join: semantics on hand-built cases plus an exhaustive
  * equality property for the deletion-neighborhood candidates against
  * brute-force Levenshtein. */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeChanges: upsert replaces, insert adds, delete removes") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "b2", 21.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (9L, "z", 90.0, false)   // insert
    ).toDF("k", "s", "v", "del")
    val got = Snapshot.mergeChanges(base, changes, "k", "del")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "z", 90.0)))
  }

  test("mergeChanges: uncompacted changes resolve by the largest orderCol") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val changes = Seq(
      (1L, "v1", false, 1L),
      (1L, "v3", false, 3L), // latest version wins
      (1L, "v2", false, 2L),
      (2L, "w5", false, 5L),
      (2L, "gone", true, 9L) // latest change for key 2 is a delete
    ).toDF("k", "s", "del", "ver")
    val got = Snapshot.mergeChanges(base, changes, "k", "del", Some("ver"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "v3")))
  }

  test("diff: added/removed/changed with null-safe comparison") {
    val oldSnap = Seq(
      (1L, Some(10.0)), // unchanged → dropped
      (2L, Some(20.0)), // changed value
      (3L, Some(30.0)), // removed
      (4L, None),       // NULL → NULL: unchanged → dropped
      (5L, None)        // NULL → value: changed
    ).toDF("k", "v")
    val newSnap = Seq(
      (1L, Some(10.0)), (2L, Some(25.0)), (4L, None),
      (5L, Some(50.0)), (6L, Some(60.0)) // added
    ).toDF("k", "v")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("v"))
      .select("k", "change").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "changed"), (3L, "removed"), (5L, "changed"), (6L, "added")))
  }

  test("scd2: consecutive identical states collapse; intervals chain") {
    val log = Seq(
      (1L, 10L, "free", 100L), (1L, 20L, "free", 101L), // collapses into one
      (1L, 30L, "pro", 102L), (1L, 40L, "free", 103L),  // back to free = NEW version
      (2L, 10L, "pro", 104L)
    ).toDF("k", "ts", "plan", "id")
    val got = Snapshot.scd2(log, "k", "ts", Seq("plan"), "id")
      .as[(Long, String, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, "free", 10L, Some(30L)),
      (1L, "pro", 30L, Some(40L)),
      (1L, "free", 40L, None),
      (2L, "pro", 10L, None)))
  }

  test("scd2: NULL attribute states compare null-safely") {
    val log = Seq(
      (1L, 10L, Option.empty[String], 1L),
      (1L, 20L, Option.empty[String], 2L), // NULL == NULL → same version
      (1L, 30L, Some("x"), 3L)             // NULL → x → boundary
    ).toDF("k", "ts", "plan", "id")
    val got = Snapshot.scd2(log, "k", "ts", Seq("plan"), "id")
      .as[(Long, Option[String], Long, Option[Long])].collect()
      .sortBy(_._3)
    assert(got.toSeq == Seq(
      (1L, None, 10L, Some(30L)), (1L, Some("x"), 30L, None)))
  }

  test("deletion neighborhood: exact contents at d=1") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyString.deletionNeighborhood(col("s"), 1).as("v"))
      .as[Seq[String]].head().sorted
    assert(got == Seq("ab", "abc", "ac", "bc"))
  }

  test("edit-distance pairs match brute-force Levenshtein exactly (d=1 and d=2)") {
    // a vocabulary rich in near-misses: substitutions, deletions, inserts,
    // transposition (distance 2 for plain Levenshtein), duplicates of
    // length <= d (the "" variant hazard), and unicode
    val words = Seq("cat", "cart", "car", "bar", "bat", "ct", "a", "b", "",
      "hello", "hallo", "hellos", "shello", "ohell", "héllo",
      "aaaa", "aaab", "abab", "baba")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = FuzzyString.editDistancePairs(df, "id", "s", d)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
        .collect().sortBy(p => (p._1, p._2))
      val brute = for {
        (a, i) <- words.zipWithIndex; (b, j) <- words.zipWithIndex
        if i < j
        dist = lev(a, b) if dist <= d
      } yield (i.toLong, j.toLong, dist.toLong)
      assert(got.toSeq == brute.sortBy(p => (p._1, p._2)),
        s"mismatch at d=$d")
    }
  }

  test("edit-distance clusters merge transitively to one canonical name", SlowTest) {
    import graft.operators.Dedup
    // chain: consecutive names at distance 1; the endpoints are distance 3
    // apart — only TRANSITIVE closure puts them in one cluster
    val names = Seq("aaaa", "aaab", "aabb", "abbb", "zzzz")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
      .select(org.apache.spark.sql.functions.col("s").as("p_name")).distinct()
    val clusters = Dedup.connectedComponents(
        graft.operators.FuzzyString.editDistancePairs(names, "p_name", "p_name", 2))
      .as[(String, String)].collect().toMap
    assert(clusters.keySet == Set("aaaa", "aaab", "aabb", "abbb")) // zzzz: no edges
    assert(clusters.values.toSet == Set("aaaa"), s"one canonical: $clusters")
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }
}
