package graft.sql

import graft.functions.{DotProduct, RollingHashes, WordNGrams}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of graft's native expressions, so they are usable
  * from `spark.sql(...)` strings and views:
  *
  *   spark.sql.extensions=graft.sql.GraftExtensions     (deployment)
  *   GraftExtensions.register(spark)                    (existing session)
  *
  * Functions: graft_dot(array<double>, array<double>) → double,
  * graft_word_ngrams(string, n) → array<string>,
  * graft_rolling_hashes(string, window) → array<bigint>.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  private[sql] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "graft_word_ngrams"),
      (args: Seq[Expression]) =>
        WordNGrams(args(0), intLit(args(1), "graft_word_ngrams"))),
    (FunctionIdentifier("graft_rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashes].getName, "graft_rolling_hashes"),
      (args: Seq[Expression]) =>
        RollingHashes(args(0), intLit(args(1), "graft_rolling_hashes"))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
