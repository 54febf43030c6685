package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge.
  *
  * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; the
  * registry path (`call_function`) covers expressions whose only
  * parameters are child columns, but a kernel carrying plan-embedded
  * constants (the IVF codebook in
  * [[graft.functions.NearestCentroidIndex]]) needs direct Column
  * construction. This object lives in the `org.apache.spark.sql`
  * package solely to re-export those two conversions — the standard
  * interop seam for libraries extending Catalyst; no Spark internals
  * are modified or shadowed. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
