package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

/** PageRank semantics on graphs whose stationary structure is known in
  * closed form — complements the PropertySpec model equivalence and the
  * bit-exact driver oracle with human-checkable structure. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int = 10) =
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric cycle: all nodes rank equal, mass conserved to rounding", SlowTest) {
    val r = ranks(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
    assert(r.values.toSet.size == 1, s"cycle ranks must be equal: $r")
    // each round floors at most dampDen units per node out of the mass
    val scale = 1L << 20
    assert(math.abs(r.values.sum - 3 * scale) <= 3L * 10 * 100,
      s"mass must be conserved up to rounding: ${r.values.sum} vs ${3 * scale}")
  }

  test("star: the sink ranks strictly above its sources; dangling mass recycles", SlowTest) {
    // 1,2,3 → 4; node 4 has no out-edge, so its mass re-enters uniformly —
    // a bug dropping dangling mass would drain rank 4 toward base instead
    val r = ranks(Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
    assert(r(4L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L),
      s"star center must dominate its symmetric leaves: $r")
    val scale = 1L << 20
    assert(r(4L) > scale, s"the sink must hold more than its initial mass: $r")
  }

  test("edge weights steer rank: the heavier-in target ranks higher", SlowTest) {
    val r = ranks(Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
    assert(r(2L) > r(3L), s"9:1 weighted split must favor node 2: $r")
  }

  private def tris(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.map { case (s, d) => (s, d, 1L) }
        .toDF("src", "dst", "w"))
      .as[(Long, Long)].collect().toMap

  test("triangles: K4 gives every node 3; direction/multiplicity/loops collapse") {
    // K4 has C(3,2)=3 triangles through each vertex; feed it as a messy
    // directed multigraph — reversed duplicates, a parallel edge, a loop
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val r = tris(k4 ++ Seq((1L, 1L), (2L, 3L), (2L, 3L)))
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 must count 3 per node: $r")
  }

  test("triangles: a triangle with a pendant and a hub counts only the cycle") {
    // 1-2-3 triangle, 4 pendant off 3, star hub 9 → {5,6,7} (no closures)
    val r = tris(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (9L, 5L), (9L, 6L), (9L, 7L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"only the 1-2-3 cycle closes: $r")
  }

  test("label propagation splits weakly-bridged cliques where CC would merge them", SlowTest) {
    // two strong triangles joined by a w=1 bridge: LPA keeps them separate
    // communities (min member as label), connected components would not
    val edges = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (3L, 1L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (6L, 4L, 10L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val got = Graph.labelPropagation(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L),
      s"bridged triangles must keep two communities: $got")
    // deterministic under repartitioning: the tie-break is a total order
    val got2 = Graph.labelPropagation(edges.repartition(7), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got2 == got)
  }

  test("negative sampling: no true edges, no self-pairs, deterministic, near-full yield") {
    val edges = (1L to 40L).map(i => (i, i % 40 + 1, 1L)) // a 40-cycle
      .toDF("src", "dst", "w")
    val neg = Graph.negativeEdges(edges, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val trueEdges = (1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i % 40 + 1, i))).toSet
    assert(neg.forall { case (s, d, _) => s != d && !trueEdges.contains((s, d)) },
      "negatives must avoid self-pairs and true edges")
    assert(neg.forall(_._3 >= 1L) && neg.forall(_._3 <= 3L))
    // sparse graph: nearly every (node, slot) survives the anti-join
    assert(neg.size >= 40 * 3 - 12, s"yield too low: ${neg.size} of 120")
    val neg2 = Graph.negativeEdges(edges.repartition(5), k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(neg2 == neg, "the draw must be partition-invariant")
  }

  test("triangles: two triangles sharing an edge double-count the shared pair") {
    // {1,2,3} and {2,3,4}: nodes 2,3 sit on both
    val r = tris(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L)))
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      s"shared-edge wheel must give 2,3 two triangles each: $r")
  }

  private def bfs(edges: Seq[(Long, Long)], srcs: Seq[Long],
      maxHops: Int): Map[Long, Long] =
    Graph.bfsDistances(edges.map { case (s, d) => (s, d, 1L) }
        .toDF("src", "dst", "w"),
      srcs.toDF("node"), maxHops).as[(Long, Long)].collect().toMap

  test("bfs: hop distances on a path + island, capped at maxHops", SlowTest) {
    // 1→2→3→4→5 and a separate 10→11; seeds {1, 10}, horizon 2
    val r = bfs(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)),
      Seq(1L, 10L), maxHops = 2)
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L, 11L -> 1L),
      s"horizon-2 distances wrong: $r")
  }

  test("bfs: min distance wins on diamonds; early exit past the fixpoint", SlowTest) {
    // 1→2→4, 1→3, 3→4 (two routes to 4), generous horizon exercises the
    // empty-frontier early exit; direction respected (nothing reaches 1)
    val r = bfs(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L), (4L, 1L)),
      Seq(1L), maxHops = 10)
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      s"diamond min-distances wrong: $r")
  }

  private def core(edges: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] =
    Graph.kcore(edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
      k, rounds).as[(Long, Long)].collect().toMap

  test("kcore: K4 survives 3-core, pendant chain peels over two rounds", SlowTest) {
    // K4 on {1..4} + chain 1-5-6: round 1 drops 6 (deg 1) and 5 (deg 2),
    // round 2 confirms the fixpoint; K4 keeps within-core degree 3
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val r = core(k4 ++ Seq((1L, 5L), (5L, 6L)), k = 3, rounds = 8)
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core of K4+tail must be K4: $r")
  }

  test("kcore: truncation at maxRounds is the documented semantics", SlowTest) {
    // path 1-2-3-4-5 under k=2: round 1 peels the endpoints; truncated at
    // 1 round the survivors are {2,3,4} with their within-survivor degrees
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r1 = core(path, k = 2, rounds = 1)
    assert(r1 == Map(2L -> 1L, 3L -> 2L, 4L -> 1L),
      s"one truncated peel of the path is {2,3,4}: $r1")
    // run to fixpoint: the whole path unravels
    assert(core(path, k = 2, rounds = 8).isEmpty, "a path has no 2-core")
  }

  private def lp(edges: Seq[(Long, Long)], maxDeg: Long, minCommon: Long) =
    Graph.linkPredictionScores(
      edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
      maxDeg, minCommon)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap

  test("linkpred: square scores both diagonals, triangle yields nothing", SlowTest) {
    // C4 1-2-3-4-1: (1,3) share {2,4} (both deg 2), (2,4) share {1,3};
    // cn=2, RA = 2·(10⁶ div 2), AA = 2/ln 2
    val r = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
      maxDeg = 1L << 12, minCommon = 1)
    assert(r.keySet == Set((1L, 3L), (2L, 4L)), s"C4 diagonals only: $r")
    val (cn, ra, aa) = r((1L, 3L))
    assert(cn == 2L && ra == 1000000L,
      s"C4 diagonal must score cn=2, ra=10⁶: $r")
    assert(math.abs(aa - 2.0 / math.log(2.0)) < 1e-9, s"AA = 2/ln2: $aa")
    // a triangle's distance-2 pairs are all true edges — anti-joined away
    assert(lp(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 1L << 12, 1L).isEmpty,
      "triangle has no non-edge candidates")
  }

  test("linkpred: the hub cap drops high-degree mids from scoring", SlowTest) {
    // star 9-{1,2,3}: deg(9)=3; with maxDeg=2 the hub can't be a mid, so
    // no pairs emerge; with the cap open, all 3 leaf pairs score via 9
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L))
    assert(lp(star, maxDeg = 2L, minCommon = 1L).isEmpty,
      "capped hub must not mediate pairs")
    val open = lp(star, maxDeg = 1L << 12, minCommon = 1L)
    assert(open.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"open cap scores all leaf pairs: $open")
    val (cn, ra, aa) = open((1L, 2L))
    assert(cn == 1L && ra == 333333L, s"leaf pair via deg-3 hub: ${open((1L, 2L))}")
    assert(math.abs(aa - 1.0 / math.log(3.0)) < 1e-9, s"AA = 1/ln3: $aa")
  }
}
