package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` constructor (Columns are
  * now backed by ColumnNodes for Connect parity); the classic
  * converter lives behind `private[sql]`. This one-file interop
  * package exposes the two conversions a library defining native
  * Catalyst expressions needs. Standard practice for Spark-extension
  * libraries; no internal state is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
