package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ⇄ Expression converters — the
  * minimal hook a library needs to expose a custom Catalyst
  * `Expression` as a user-facing `Column` function (the converters are
  * public bytecode but Scala-package-private, hence this subpackage).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
