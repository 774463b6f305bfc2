package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into Spark's `private[sql]` Column ↔ Expression
  * converters, required to expose a custom Catalyst expression through
  * the public Column API. Lives under `org.apache.spark.sql` for
  * access; keep it to these two calls — everything else in the
  * library uses public Spark APIs only.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
