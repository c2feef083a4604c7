package graft.spec

import graft.model.{AggregationSpec, RollupSpec}
import org.yaml.snakeyaml.Yaml

import java.io.{FileInputStream, InputStream}
import scala.jdk.CollectionConverters._

/** Loads `aggregation-specifications.yaml` into [[AggregationSpec]]s and
  * validates them with the exact semantics (and error strings) of the
  * reference's `NewAggregationRule` (aggregation/aggregation_rule.go:29-47).
  *
  * YAML shape (reference aggregation-specifications.yaml):
  * {{{
  * aggregationSpecifications:
  *   - name: Aggregation3
  *     aggregatedMetricName: aggregated-metric3
  *     filteredMetricName: metric3
  *     groupedDimensions: [hostname, service]
  *     function: avg
  *     rollup: {function: sum, groupedDimensions: [service]}
  * }}}
  */
object SpecLoader {

  /** Validation parity with aggregation/aggregation_rule.go:29-47: a rule must
    * declare an aggregated metric name, a filtered metric name and a function,
    * and rollup dims must be a subset of the grouped dims
    * (subset helper semantics: aggregation/utils.go:17-39 — the empty set is a
    * subset of anything). Returns the spec or the reference's error message. */
  def validate(spec: AggregationSpec): Either[String, AggregationSpec] = {
    if (spec.aggregatedMetricName.isEmpty)
      Left(s"Rule ${spec.name} must have an aggregated metric name")
    else if (spec.filteredMetricName.isEmpty)
      Left(s"Rule ${spec.name} must have a filtered metric name")
    else if (spec.function.isEmpty)
      Left(s"Rule ${spec.name} must have a function")
    else spec.rollup match {
      case Some(r) if !r.groupedDimensions.forall(spec.groupedDimensions.contains) =>
        Left(s"Rule ${spec.name} must have all rollup.groupedDimensions also in groupedDimensions")
      case _ => Right(spec)
    }
  }

  def load(path: String): Seq[AggregationSpec] = {
    val in = new FileInputStream(path)
    try load(in) finally in.close()
  }

  def load(in: InputStream): Seq[AggregationSpec] = {
    val root = new Yaml().load[java.util.Map[String, AnyRef]](in)
    val specs = root.asScala.getOrElse("aggregationSpecifications",
      throw new IllegalArgumentException("missing aggregationSpecifications"))
    specs.asInstanceOf[java.util.List[java.util.Map[String, AnyRef]]]
      .asScala.toSeq.map(parseOne)
  }

  def loadValidated(path: String): Seq[AggregationSpec] =
    load(path).map(s => validate(s).fold(e => throw new IllegalArgumentException(e), identity))

  private def parseOne(m: java.util.Map[String, AnyRef]): AggregationSpec = {
    val sm = m.asScala
    def str(k: String): String = sm.get(k).map(_.toString).getOrElse("")
    def strMap(k: String): Map[String, String] = sm.get(k) match {
      case Some(mm: java.util.Map[_, _]) =>
        mm.asScala.map { case (a, b) =>
          a.toString -> (if (b == null) "" else b.toString)
        }.toMap
      case _ => Map.empty
    }
    def strSeq(k: String): Seq[String] = sm.get(k) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case _ => Seq.empty
    }
    val rollup = sm.get("rollup") match {
      case Some(rm: java.util.Map[_, _]) =>
        val r = rm.asScala.map { case (a, b) => a.toString -> b }
        Some(RollupSpec(
          function = r.get("function").map(_.toString).getOrElse(""),
          groupedDimensions = r.get("groupedDimensions") match {
            case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
            case _ => Seq.empty
          },
          // explicit-null YAML values (`windowSize:`) are treated as absent
          windowSizeSec = r.get("windowSize").filter(_ != null).map { v =>
            try v.toString.toLong
            catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"Rule ${sm.get("name").map(_.toString).getOrElse("")} " +
                  s"rollup.windowSize must be an integer number of seconds, got $v")
            }
          }))
      case _ => None
    }
    AggregationSpec(
      name = str("name"),
      function = str("function"),
      filteredMetricName = str("filteredMetricName"),
      filteredDimensions = strMap("filteredDimensions"),
      rejectedDimensions = strMap("rejectedDimensions"),
      groupedDimensions = strSeq("groupedDimensions"),
      aggregatedMetricName = str("aggregatedMetricName"),
      rollup = rollup)
  }
}
