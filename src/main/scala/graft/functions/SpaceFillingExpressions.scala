package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D HILBERT CURVE index (Hilbert
  * 1891; the xy→d walk is the classic public iterative formulation, e.g.
  * Wikipedia "Hilbert curve", also the layout key behind Delta/Iceberg's
  * `OPTIMIZE ... HILBERT`): map a grid point (x, y) on the 2^order × 2^order
  * grid to its position along the space-filling curve.
  *
  * Why a curve index next to [[graft.operators.Layout.zValue]]: both bound
  * every output file's extent in BOTH dimensions, but Z-order's bit
  * interleave takes 4 long diagonal jumps per quadrant recursion while the
  * Hilbert curve is CONTINUOUS — consecutive indexes are always grid-
  * adjacent (|Δx|+|Δy| = 1, property-pinned in LayoutSpec), so equal-count
  * file cuts get tighter bounding boxes and strictly better min/max
  * pruning on skewed boxes. The price is this per-level rotation walk —
  * not expressible as a static mask chain — hence a custom expression: the
  * `order`-iteration loop compiles into whole-stage codegen (and a matching
  * interpreted eval); a lambda-fold spelling would pay interpreter dispatch
  * per level per row.
  *
  * Inputs are masked to the low `order` bits (same silent-mask contract as
  * [[graft.operators.Layout.zValue]] — reduce wider dimensions explicitly
  * first). With order ≤ 31 the index stays below 2^62: positive in a
  * signed 64-bit long on every engine. The walk is pure integer arithmetic
  * in a fixed order, so a DuckDB recursive CTE replays it bit-identically.
  */
case class HilbertIndex2D(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HilbertIndex2D requires two bigint arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private val mask: Long = (1L << order) - 1L

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0L) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${order - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

object SpaceFillingExpressions {
  /** Codegen'd 2-D Hilbert curve index of two bigint columns (masked to
    * `order` low bits). */
  def hilbert2d(x: Column, y: Column, order: Int): Column =
    GraftBridge.column(HilbertIndex2D(
      GraftBridge.expression(x), GraftBridge.expression(y), order))
}
