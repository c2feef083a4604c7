package graft

import graft.model.{AggregationSpec, RollupSpec}
import graft.spec.SpecLoader
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's validation unit tests
  * (aggregation/aggregation_rule_test.go:23-97) — same inputs, same error
  * strings (aggregation/aggregation_rule.go:29-47). */
class SpecValidationSpec extends AnyFunSuite {

  private def base = AggregationSpec(
    name = "Aggregation",
    function = "avg",
    filteredMetricName = "metric",
    groupedDimensions = Seq("hostname", "service"),
    aggregatedMetricName = "aggregated-metric")

  test("bad rollup dimension not in groupedDimensions") {
    val s = base.copy(rollup = Some(RollupSpec("sum", Seq("service1"))))
    assert(SpecLoader.validate(s) ==
      Left("Rule Aggregation must have all rollup.groupedDimensions also in groupedDimensions"))
  }

  test("rollup dims against empty grouped dims") {
    val s = base.copy(groupedDimensions = Seq.empty,
      rollup = Some(RollupSpec("sum", Seq("service"))))
    assert(SpecLoader.validate(s) ==
      Left("Rule Aggregation must have all rollup.groupedDimensions also in groupedDimensions"))
  }

  test("valid spec round-trips") {
    val s = base.copy(rollup = Some(RollupSpec("sum", Seq("service"))))
    assert(SpecLoader.validate(s) == Right(s))
  }

  test("missing aggregated metric name") {
    assert(SpecLoader.validate(base.copy(aggregatedMetricName = "")) ==
      Left("Rule Aggregation must have an aggregated metric name"))
  }

  test("missing filtered metric name") {
    assert(SpecLoader.validate(base.copy(filteredMetricName = "")) ==
      Left("Rule Aggregation must have a filtered metric name"))
  }

  test("missing function") {
    assert(SpecLoader.validate(base.copy(function = "")) ==
      Left("Rule Aggregation must have a function"))
  }

  test("empty rollup dims are a subset of anything (utils.go CheckSubArray)") {
    assert(SpecLoader.validate(
      base.copy(rollup = Some(RollupSpec("sum", Seq.empty)))).isRight)
  }

  test("engine config loads the reference config.yaml shape with its defaults") {
    import graft.spec.EngineConfig
    val yaml =
      """windowSize: 30
        |consumerTopic: in-metrics
        |kafka:
        |  bootstrap.servers: broker:9092
        |""".stripMargin
    val c = EngineConfig.load(new java.io.ByteArrayInputStream(yaml.getBytes("UTF-8")))
    assert(c.windowSize == 30L)
    assert(c.windowLag == 2L) // default (server.go:96-97)
    assert(c.consumerTopic == "in-metrics")
    assert(c.producerTopic == "metrics") // default
    assert(c.kafkaBootstrapServers == "broker:9092")
    assert(EngineConfig() == EngineConfig.load(
      new java.io.ByteArrayInputStream("".getBytes("UTF-8"))))
  }

  test("yaml loading parses all spec fields") {
    val yaml =
      """aggregationSpecifications:
        |  - name: Aggregation4
        |    aggregatedMetricName: aggregated-metric4
        |    filteredMetricName: metric4
        |    filteredDimensions: {service: mini-mon}
        |    rejectedDimensions: {hostname: ""}
        |    groupedDimensions: [service]
        |    function: count
        |    rollup:
        |      function: sum
        |      groupedDimensions: [service]
        |""".stripMargin
    val in = new java.io.ByteArrayInputStream(yaml.getBytes("UTF-8"))
    val Seq(s) = SpecLoader.load(in)
    assert(s.name == "Aggregation4")
    assert(s.function == "count")
    assert(s.filteredMetricName == "metric4")
    assert(s.filteredDimensions == Map("service" -> "mini-mon"))
    assert(s.rejectedDimensions == Map("hostname" -> ""))
    assert(s.groupedDimensions == Seq("service"))
    assert(s.rollup.contains(RollupSpec("sum", Seq("service"))))
    assert(SpecLoader.validate(s).isRight)
  }
}
