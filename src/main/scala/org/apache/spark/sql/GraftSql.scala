package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard mechanism for libraries that ship custom Catalyst
  * expressions (Spark 4 moved `Column(expr)` behind ColumnNode; this
  * is the supported-by-convention access path, same as frameless /
  * spark-alchemy use).
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
