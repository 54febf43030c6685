package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProductFloat

/** Session extension registering the engine's native expressions
  * (SURVEY.md §7.5: the sanctioned integration point for custom
  * Catalyst code — a function injection, never a new planner rule,
  * because nothing here changes planning).
  *
  * Install via `spark.sql.extensions=graft.GraftExtensions`; the
  * expression is then callable from SQL and from
  * `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(DotProductFloat.Name),
      new ExpressionInfo(classOf[DotProductFloat].getName, DotProductFloat.Name),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"${DotProductFloat.Name} expects 2 arguments")
        DotProductFloat(children.head, children(1))
      }))
  }
}
