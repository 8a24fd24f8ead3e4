package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters (the supported
  * internal path used by Spark's own function implementations). Lives in
  * the org.apache.spark.sql package purely for access; no Spark internals
  * are modified. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
