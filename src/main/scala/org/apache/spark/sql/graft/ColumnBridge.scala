package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the private[sql] Column<->Expression conversion — the
  * supported pattern for libraries contributing native Catalyst
  * expressions (Spark 4 made `new Column(expr)` internal; extension
  * libraries reach it via an org.apache.spark.sql subpackage). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into the private[sql] Dataset<->LogicalPlan conversion — what
  * a library needs to wrap a DataFrame's plan in its own logical node
  * and hand the result back as a DataFrame (the extension-operator
  * pattern; physical planning happens via an injected SparkStrategy). */
object PlanBridge {
  import org.apache.spark.sql.{DataFrame, SparkSession, classic}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  def logical(df: DataFrame): LogicalPlan = df.queryExecution.logical

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

/** Test-surface into private[sql] SparkSessionExtensions accessors:
  * verifies what an extensions object WOULD wire at builder time
  * without tearing down the shared test session (getOrCreate ignores
  * spark.sql.extensions once a session exists). */
object ExtensionsBridge {
  import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, classic}

  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession): Seq[AnyRef] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}

/** Runtime function registration against an existing session (the
  * builder-time path is graft.GraftExtensions via
  * spark.sql.extensions). */
object FunctionBridge {
  def registerTemp(spark: org.apache.spark.sql.SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}

/** Bridge to the RDD a `localCheckpoint`ed Dataset is rooted at: its
  * analyzed plan is a LogicalRDD wrapping exactly the RDD the
  * checkpoint persisted. Used by graft.operators.Ckpt.serRound to
  * release a superseded round's blocks by THAT id alone, instead of a
  * persisted-id keySet diff that could sweep in an unrelated lazy
  * .cache() whose first action happened inside the eager-checkpoint
  * window. */
object CheckpointBridge {
  def checkpointRddIds(ds: org.apache.spark.sql.Dataset[_]): Set[Int] =
    ds.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet
}
