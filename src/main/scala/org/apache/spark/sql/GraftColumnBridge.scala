package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned crossing between custom Catalyst `Expression`s and
  * the public `Column` API (Spark 4 made both directions private[sql];
  * this bridge is the standard extension-library pattern). Keep this
  * file the ONLY one in the org.apache.spark.sql package.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
