package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.VectorExpressions.{dotF, normF}

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, 0.2f), Array(0.3f, 0.4f)),
    (3L, Array.empty[Float], Array.empty[Float]))
    .toDF("id", "a", "b")

  test("dot product values and null propagation") {
    val out = vecs.select(dotF(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out(0) === 32.0)
    assert(out(2) === 0.0)
    val nulls = Seq((1L, null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("id", "a", "b")
      .select(dotF(col("a"), col("b"))).collect()
    assert(nulls.head.isNullAt(0))
    // Mismatched lengths (a truncated embedding) must yield null like
    // the HOF form — never a silently-wrong finite score.
    val mismatch = Seq((1L, Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("id", "a", "b")
      .select(dotF(col("a"), col("b"))).collect()
    assert(mismatch.head.isNullAt(0))
  }

  test("bit-for-bit parity with the higher-order-function fold") {
    // The oracle contract rests on this: the native kernel must produce
    // the exact double the aggregate(zip_with(...)) fold produces.
    val both = vecs.filter(size(col("a")) > 0).select(
      dotF(col("a"), col("b")).as("native"),
      Functions.dotProduct(col("a"), col("b")).as("hof"),
      normF(col("a")).as("native_norm"),
      Functions.l2Norm(col("a")).as("hof_norm"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("callable from SQL through the session extension") {
    vecs.createOrReplaceTempView("vx")
    val out = spark.sql(
      s"SELECT ${DotProductFloat.Name}(a, b) FROM vx WHERE id = 1")
      .collect().head.getDouble(0)
    assert(out === 32.0)
  }

  test("nearestCentroid: argmax by rounded cosine, ties keep the lowest index") {
    import graft.functions.VectorExpressions.{nearestCentroid, normF}
    // c0 and c1 are the same direction (cosine ties exactly at 1.0);
    // c2 is orthogonal. The row vector aligns with c0/c1 → index 0.
    val cvecs = Array(
      Array(1f, 0f), Array(2f, 0f), Array(0f, 1f))
    val cnorms = cvecs.map(v =>
      math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)))
    val rows = Seq((1L, Seq(3f, 0f)), (2L, Seq(0f, 5f)), (3L, Seq(1f, 1f)))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .withColumn("n", normF(col("v")))
      .withColumn("ci", nearestCentroid(col("v"), col("n"), cvecs, cnorms))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(rows === Map(1L -> 0, 2L -> 2, 3L -> 0)) // diagonal ties → lowest index
  }

  test("nearestCentroid: dimension-mismatched codebook entries are skipped") {
    import graft.functions.VectorExpressions.{nearestCentroid, normF}
    val cvecs = Array(Array(1f, 0f, 0f), Array(0f, 1f)) // first is 3-dim
    val cnorms = Array(1.0, 1.0)
    val got = Seq((1L, Seq(0f, 2f))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .withColumn("n", normF(col("v")))
      .withColumn("ci", nearestCentroid(col("v"), col("n"), cvecs, cnorms))
      .collect().head.getInt(3)
    assert(got === 1)
  }

  test("nearestCentroid: NaN cosine (zero norms) sorts first like the oracle") {
    import graft.functions.VectorExpressions.{nearestCentroid, normF}
    // ORDER BY cos DESC puts NaN first on both engines, tie → lowest
    // cid: a zero-norm vector must assign to centroid 0, not vanish.
    val cvecs = Array(Array(1f, 0f), Array(0f, 1f))
    val cnorms = Array(1.0, 1.0)
    val zeroVec = Seq((1L, Seq(0f, 0f))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .withColumn("n", normF(col("v")))
      .withColumn("ci", nearestCentroid(col("v"), col("n"), cvecs, cnorms))
      .collect().head.getInt(3)
    assert(zeroVec === 0)
    // A zero-norm CENTROID likewise produces NaN against every vector
    // and wins (the oracle's ordering, odd as it reads).
    val zeroCent = Seq((1L, Seq(0f, 3f))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .withColumn("n", normF(col("v")))
      .withColumn("ci", nearestCentroid(col("v"), col("n"),
        Array(Array(0f, 0f), Array(0f, 1f)), Array(0.0, 1.0)))
      .collect().head.getInt(3)
    assert(zeroCent === 0)
  }

  test("participates in whole-stage codegen (no fallback)") {
    // A local relation pre-evaluates to LocalTableScan, so drive the
    // expression through a real parquet scan.
    val e = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val df = e.select(dotF(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen
    // stage; the project and filter carrying the expression must be in.
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project [dot_product_float")), plan.take(800))
    assert(df.count() > 0)
  }
}
