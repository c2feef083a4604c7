package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Value carried by the lexicographically largest (latest=true) or smallest
  * (latest=false) `(ts, value)` pair of the group — the deterministic
  * first/last-by-event-time primitive behind the `delta` and `rate` aggregate
  * functions (reference semantics: aggregation/delta_metric.go:19-36,
  * aggregation/rate_metric.go:19-43, re-based onto event-time order per
  * SURVEY §2.1).
  *
  * Why not `max(struct(ts, v)).v` or `max_by(v, struct(ts, v))`: both keep a
  * STRUCT in the aggregation buffer, which `UnsafeRow` cannot mutate in
  * place, so `HashAggregateExec` rejects them and the whole rule pipeline
  * degrades to Sort + SortAggregate on both sides of the exchange — the only
  * full sort of the fact table in the engine, O(n log n) per partition where
  * every sibling aggregate is O(n). This DeclarativeAggregate tracks the same
  * pair in two primitive DOUBLE buffer slots, so it hash-aggregates with
  * whole-stage-codegen'd update/merge expressions. Including the value in the
  * comparison key keeps equal-ts ties deterministic across partition merges
  * (a bare argmax on ts alone would be merge-order dependent).
  */
case class ValueAtTimeBound(value: Expression, ts: Expression, latest: Boolean)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = ts

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (latest) "last_by_time" else "first_by_time"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == DoubleType && ts.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double value, double ts), got " +
          s"(${value.dataType.simpleString}, ${ts.dataType.simpleString})")

  private lazy val bufT = AttributeReference("bufT", DoubleType)()
  private lazy val bufV = AttributeReference("bufV", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bufT, bufV)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(null, DoubleType))

  /** Strict lexicographic (t, v) comparison: does (nt, nv) beat (ct, cv)? */
  private def beats(ct: Expression, cv: Expression,
      nt: Expression, nv: Expression): Expression =
    if (latest) Or(GreaterThan(nt, ct), And(EqualTo(nt, ct), GreaterThan(nv, cv)))
    else Or(LessThan(nt, ct), And(EqualTo(nt, ct), LessThan(nv, cv)))

  override lazy val updateExpressions: Seq[Expression] = {
    // null ts or value rows carry no ordering information — skipped, exactly
    // like the null-skipping of the sibling min/max/sum built-ins
    val take = And(And(IsNotNull(ts), IsNotNull(value)),
      Or(IsNull(bufT), beats(bufT, bufV, ts, value)))
    Seq(If(take, ts, bufT), If(take, value, bufV))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bufT.right),
      Or(IsNull(bufT.left), beats(bufT.left, bufV.left, bufT.right, bufV.right)))
    Seq(If(take, bufT.right, bufT.left), If(take, bufV.right, bufV.left))
  }

  override lazy val evaluateExpression: Expression = bufV

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValueAtTimeBound =
    copy(value = newLeft, ts = newRight)
}
