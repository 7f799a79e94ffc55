package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ catalyst-Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the supported
  * conversion lives on `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is package-private to `sql`. This one-file shim — the standard extension
  * technique for libraries that define native Catalyst expressions without a
  * full `SparkSessionExtensions` function-registry round-trip — re-exports
  * the two converters to graft code. Nothing else in the repo lives outside
  * the `graft` namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
