package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters (the supported
  * internal path used by Spark's own function implementations). Lives in
  * the org.apache.spark.sql package purely for access; no Spark internals
  * are modified. */
object GraftShim {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  /** Unwrap a Column to its Catalyst Expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
