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

    // Spark ships a distributed bloom-filter aggregate and its probe
    // (the machinery behind its own runtime shuffle filters) but does
    // not register them in the public function registry. Exposing them
    // here gives [[graft.ops.RuntimeFilter]] the semi-join-reduction
    // primitive without re-implementing a sketch the engine already
    // codegens: `bloom_filter_agg(xxhash64(k), items, bits)` builds
    // the sketch distributed-partial-merge style, `might_contain(bf,
    // xxhash64(k))` probes it.
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children.size match {
          case 1 => new BloomFilterAggregate(children.head)
          case 2 => new BloomFilterAggregate(children.head, children(1))
          case 3 => new BloomFilterAggregate(children.head, children(1), children(2))
          case n => throw new IllegalArgumentException(
            s"bloom_filter_agg expects 1-3 arguments, got $n")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "might_contain expects 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
