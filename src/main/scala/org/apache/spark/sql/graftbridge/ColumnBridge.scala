package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column ⇄ Expression constructors; the
  * supported path for *registered* functions is `call_function`, but an
  * expression carrying non-Expression state (a Broadcast handle) cannot
  * go through the registry. This bridge re-exports the two `private[sql]`
  * converters from a subpackage of org.apache.spark.sql — the standard
  * extension-library pattern for this need. Scope: exactly these two
  * calls, nothing else.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
