package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.FunctionBridge
import graft.functions.DotProductFF

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for the SQL surface. Activate at build time with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`), or on a live session with
  * [[GraftExtensions.register]].
  *
  * Functions:
  *  - `graft_dot(array<float>, array<float>) -> double` — exact
  *    left-to-right dot product (graft.functions.DotProductFF).
  *
  * Planner strategies:
  *  - [[graft.plans.TopKStrategy]] — plans the custom partial
  *    top-k-per-key prune node (graft.plans.PartialTopKPerKey).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFF].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductFF(children.head, children(1))))
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  /** Register the same functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    FunctionBridge.registerTemp(spark, "graft_dot",
      children => DotProductFF(children.head, children(1)))
}
