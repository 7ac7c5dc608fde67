package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the constructors
  * `private[sql]`; a subpackage of `org.apache.spark.sql` is the
  * sanctioned-by-convention way for libraries to lift custom Catalyst
  * expressions into user-facing Columns (no other internals touched). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
