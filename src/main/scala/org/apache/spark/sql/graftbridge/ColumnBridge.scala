package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column/Expression conversion `private[sql]`
  * (columnNodeSupport.scala); extension libraries reach it by declaring a
  * bridge inside the org.apache.spark.sql package — the same technique used
  * by public Spark connector/extension projects.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
