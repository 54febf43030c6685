package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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

/** Codegen'd nearest-centroid argmax: given a row's embedding and its
  * precomputed norm, scan the (bounded, plan-embedded) centroid matrix
  * and return the 0-based index of the centroid with the highest
  * 6-decimal-rounded cosine; ties keep the LOWEST index (callers order
  * the codebook by centroid id, reproducing ORDER BY cos DESC, cid).
  *
  * This is the kernel under the shuffle-free IVF assignment
  * ([[graft.ops.Similarity.assignCells]]): the HOF-fold formulation is
  * semantically identical but evaluates interpreted (lambda binding +
  * per-element struct allocation per centroid per row); this loop is
  * whole-stage-codegen'd flat float math, like [[DotProductFloat]].
  * Rounding is the DuckDB-identical `round(x·10^6)/10^6` half-away
  * fold ([[graft.functions.Functions.roundFrac]]), so assignment
  * agrees with the oracle by construction.
  *
  * Returns null for an empty codebook or when no centroid yields a
  * comparable cosine (dimension mismatch on every centroid). */
case class NearestCentroidIndex(child: Expression, norm: Expression,
                                cvecs: Array[Array[Float]],
                                cnorms: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = child
  override def right: Expression = norm
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), DoubleType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid_index"

  @transient private lazy val k = cvecs.length

  /** The shared scan: strictly-greater rounded cosine replaces; first
    * (lowest-index) max wins ties. Two parity subtleties, both pinned
    * by the oracle's ORDER BY semantics:
    *   - a NaN cosine (zero-norm vector or centroid) sorts FIRST
    *     under DESC on both engines (NaN > everything), so it maps to
    *     +∞ here — `NaN > x` is false in plain Java and would
    *     otherwise silently drop the row;
    *   - the rounding applies [[graft.functions.Functions.roundToLong]]'s
    *     |x| < 0.5 guard (the one boundary where floor(x+0.5)
    *     misrounds), keeping the kernel bit-identical to roundFrac on
    *     the probe side and in the oracle. */
  private def scan(vec: ArrayData, vnorm: Double): Any = {
    val n = vec.numElements()
    var best = -1
    var bestCos = -2.0
    var i = 0
    while (i < k) {
      val cv = cvecs(i)
      if (cv.length == n) {
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += vec.getFloat(j).toDouble * cv(j).toDouble
          j += 1
        }
        val raw = dot / (vnorm * cnorms(i)) * 1e6
        val cos =
          if (raw.isNaN) Double.PositiveInfinity
          else if (math.abs(raw) < 0.5) 0.0
          else (if (raw >= 0) math.floor(raw + 0.5d)
                else -math.floor(-raw + 0.5d)) / 1e6
        if (cos > bestCos) { bestCos = cos; best = i }
      }
      i += 1
    }
    if (best < 0) null else best
  }

  override def nullSafeEval(v: Any, nrm: Any): Any =
    scan(v.asInstanceOf[ArrayData], nrm.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.nullSafeEval($v, $nrm);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $res).intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidIndex =
    copy(child = newLeft, norm = newRight)
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

  /** Nearest-centroid index over a bounded codebook (see
    * [[NearestCentroidIndex]]); `cvecs`/`cnorms` must be ordered by
    * centroid id for the documented tie-break. */
  def nearestCentroid(vec: Column, norm: Column,
                      cvecs: Array[Array[Float]],
                      cnorms: Array[Double]): Column = {
    val eu = org.apache.spark.sql.GraftExpressionBridge
    eu.column(NearestCentroidIndex(
      eu.expression(vec), eu.expression(norm), cvecs, cnorms))
  }
}
