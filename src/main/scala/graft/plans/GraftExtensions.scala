package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension wiring (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the engine's native expressions with the session's function
  * registry, so they resolve in both the Column API (`call_function`) and
  * raw SQL.
  *
  * [[GraftExtensions.register]] is the imperative twin for sessions the
  * engine does not construct (the driver harness creates its own) —
  * idempotent, called from the table loader so every registry query is
  * self-sufficient.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_normalize_key",
      new ExpressionInfo(classOf[NormalizeKeyExpression].getName, "graft_normalize_key"),
      (children: Seq[Expression]) => NormalizeKeyExpression(children.head)))

  /** Imperative registration for externally-created sessions. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
