package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's Column wraps a ColumnNode and the
  * conversion helpers live in `org.apache.spark.sql.classic`, which is
  * package-private to `org.apache.spark.sql` — hence this one-file shim in
  * that namespace (the standard extension-library technique for custom
  * Catalyst expressions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
