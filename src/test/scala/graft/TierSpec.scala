package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-tier invariants (SparkEntry.coreTier/extendedTier): the tiers
  * must PARTITION the registry, core must contain the full reference-parity
  * surface, and every extension family must keep at least one core
  * representative — otherwise a core-only driver run would silently lose a
  * family's coverage signal. */
class TierSpec extends AnyFunSuite {

  private val all = SparkEntry.queries.keySet
  private val core = SparkEntry.coreTier
  private val ext = SparkEntry.extendedTier

  test("tiers partition the registry (disjoint, complete, no dangling names)") {
    assert((core & ext).isEmpty, s"overlap: ${core & ext}")
    assert(core ++ ext == all,
      s"missing from both tiers: ${all -- core -- ext}")
    assert(core.subsetOf(all), s"core names not in registry: ${core -- all}")
  }

  test("core contains the whole oracle-checkable reference-parity surface") {
    val parity = Set("s2_json_roundtrip", "f1_name_filter", "f2_dim_filter",
      "f3_dim_reject", "f4_group_presence", "f5_multi_rule", "w1_count_1h",
      "p1_envelope", "r1_rollup_1d", "r2_rollup_rewindow") ++
      (1 to 12).map(i => all.find(_.startsWith(s"a${i}_")).getOrElse(
        fail(s"parity aggregate a$i missing from the registry")))
    assert(parity.subsetOf(core), s"parity rows outside core: ${parity -- core}")
  }

  test("every family keeps at least one core representative") {
    def family(n: String): String = n.split("_")(0) match {
      case f if f.matches("[afr][0-9]+|w1|s2|p1") => "parity"
      case f if f.startsWith("d") && f.matches("d[0-9]+b?") => "d-series"
      case f => f
    }
    val missing = all.groupBy(family).collect {
      case (fam, names) if (names & core).isEmpty => fam -> names
    }
    assert(missing.isEmpty,
      s"families with no core representative: ${missing.keys}")
  }

  test("the tier filter honors SPARK_GRAFT_TIER semantics") {
    // (env can't be set from inside the JVM portably — test the mapping
    // by exercising the default path plus the set arithmetic it relies on)
    assert(SparkEntry.tierFilter()("dedup_exact")) // default = all
    assert(core("text_bpe") || ext("text_bpe"))
  }
}
