package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into `private[sql]` Spark internals: converts between
 * public `Column` and Catalyst `Expression` so graft's custom
 * expressions (e.g. [[graft.functions.JaroWinkler]]) can be used from
 * the DataFrame API without registering SQL extensions.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
