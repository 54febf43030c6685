package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is correct but sits
  * outside whole-stage codegen: each pair comparison allocates a
  * zipped array and evaluates two lambdas per element. Candidate
  * scoring in the similarity family is exactly N·M such comparisons —
  * the one place in this engine where a custom `Expression` with
  * `doGenCode` is justified (SURVEY.md §7.5: scalar compute that
  * built-ins cannot express efficiently, never a new operator).
  *
  * Semantics are IDENTICAL to the HOF form the DuckDB oracles mirror:
  * a strict left-to-right double-precision fold, so scores stay
  * bit-for-bit equal. Null handling: null input array → null; element
  * nulls are not expected (embedding contract) and read as 0.
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (AbstractDataType itself is
  // private[sql]); covariance lets the override narrow the result type.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  // Mismatched lengths → null, matching the HOF form (zip_with pads
  // with null, the fold null-propagates) and the oracle's list_zip
  // fold — a truncated embedding must not silently score.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  val Name = "dot_product_float"
}

object VectorExpressions {
  /** Column wrapper: codegen'd float-array dot product (double fold).
    * Resolved through the function registry, so the session must carry
    * [[graft.GraftExtensions]] (`spark.sql.extensions`). */
  def dotF(a: Column, b: Column): Column =
    call_function(DotProductFloat.Name, a, b)

  /** L2 norm via the same native kernel (`sqrt(a·a)` — the identical
    * fold the HOF form computes). Float arrays only. */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))
}
