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

/** Runtime function registration against an existing session (the
  * builder-time path is graft.GraftExtensions via
  * spark.sql.extensions). */
object FunctionBridge {
  def registerTemp(spark: org.apache.spark.sql.SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}
