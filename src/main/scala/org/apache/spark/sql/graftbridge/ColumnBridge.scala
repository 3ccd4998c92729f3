package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so the bridge lives in an `org.apache.spark.sql`
  * subpackage — the standard pattern for Spark-native extensions that
  * construct Catalyst expressions directly (same access route Spark's
  * own connectors use; no reflection, no copied code). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
