package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the private[sql] Expression <-> Column converters —
  * the standard technique for registering custom Catalyst expressions from
  * an external library (the public `Column` constructor was removed in
  * Spark 4's Column-node refactor).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
