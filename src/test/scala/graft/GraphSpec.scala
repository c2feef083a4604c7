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

  test("symmetric cycle: all nodes rank equal, mass conserved to rounding") {
    val r = ranks(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
    assert(r.values.toSet.size == 1, s"cycle ranks must be equal: $r")
    // each round floors at most dampDen units per node out of the mass
    val scale = 1L << 20
    assert(math.abs(r.values.sum - 3 * scale) <= 3L * 10 * 100,
      s"mass must be conserved up to rounding: ${r.values.sum} vs ${3 * scale}")
  }

  test("star: the sink ranks strictly above its sources; dangling mass recycles") {
    // 1,2,3 → 4; node 4 has no out-edge, so its mass re-enters uniformly —
    // a bug dropping dangling mass would drain rank 4 toward base instead
    val r = ranks(Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
    assert(r(4L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L),
      s"star center must dominate its symmetric leaves: $r")
    val scale = 1L << 20
    assert(r(4L) > scale, s"the sink must hold more than its initial mass: $r")
  }

  test("edge weights steer rank: the heavier-in target ranks higher") {
    val r = ranks(Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
    assert(r(2L) > r(3L), s"9:1 weighted split must favor node 2: $r")
  }
}
