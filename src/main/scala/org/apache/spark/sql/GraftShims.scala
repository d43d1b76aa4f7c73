package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 decoupled `Column` from `Expression` (columns
  * wrap a `ColumnNode`); the converters live in `private[sql]` scope, so
  * this shim re-exports them from inside the `org.apache.spark.sql`
  * package. Compiled against the public Spark 4.1 jars only.
  */
object GraftShims {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
