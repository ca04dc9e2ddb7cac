package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` implementation-agnostic; the catalyst
  * Expression ⇄ Column bridge (`classic.ExpressionUtils`) is
  * `private[sql]`. This shim lives inside the sql package namespace to
  * re-export exactly those two conversions for graft's custom
  * expressions — the standard pattern for out-of-tree Catalyst
  * extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
