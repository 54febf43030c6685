package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Deterministic scaled-integer k-means ([[Similarity.kmeansFit]]):
  * clustering quality on crafted well-separated clusters, bit-exact
  * determinism, and the empty-cell-keeps-centroid rule. Cross-engine
  * exactness is pinned by the q68 oracle. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("separates three crafted clusters; members share a cell with their own kind") {
    // Three tight clusters far apart in 4-d. Init = 3 smallest ids,
    // one per cluster by construction (ids interleaved would also
    // converge, but this keeps the expected labeling readable).
    val a = (0L to 4L).map(i => (i, Seq(0.1f + i * 0.001f, 0.1f, 0f, 0f)))
    val b = (10L to 14L).map(i => (i, Seq(-0.4f, 0.3f + i * 0.0001f, 0.2f, 0f)))
    val c = (20L to 24L).map(i => (i, Seq(0.4f, -0.4f, -0.3f, 0.2f + i * 0.0001f)))
    // ids 0, 1, 2 are all in cluster a — k-means must still pull the
    // three centroids apart within a few update rounds.
    val df = vecs((a ++ b ++ c): _*)
    val got = Similarity.kmeansFit(df, k = 3, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cells(ids: Seq[Long]) = ids.map(got).toSet
    // Each crafted cluster ends up wholly in ONE cell...
    assert(cells(a.map(_._1)).size === 1)
    assert(cells(b.map(_._1)).size === 1)
    assert(cells(c.map(_._1)).size === 1)
    // ...and the far-apart clusters never share a cell with another.
    assert(cells(b.map(_._1)) !== cells(c.map(_._1)))
    assert(got.size === 15)
  }

  test("bit-exact determinism: repeated fits agree, including distances") {
    val df = vecs((1L to 30L).map(i =>
      (i, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        (i % 7) / 10f, -(i % 5) / 10f))): _*)
    val r1 = Similarity.kmeansFit(df, k = 4, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val r2 = Similarity.kmeansFit(df.repartition(5), k = 4, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 === r2) // partitioning must not leak into the result
  }

  test("an empty cell keeps its previous centroid instead of collapsing") {
    // Two identical points: both assign to cid 0 (smallest-cid tie
    // break), cell 1 goes empty every round — the fit must neither
    // crash nor emit NaN-ish centroids, and everything stays in cell 0.
    val df = vecs((1L, Seq(0.5f, 0.5f)), (2L, Seq(0.5f, 0.5f)))
    val got = Similarity.kmeansFit(df, k = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 0L), (2L, 0L, 0L)))
    val cents = Similarity.kmeansCentroids(df, k = 2, iters = 4)
    assert(cents.length === 2)
    // cid 1 still holds its init vector (id 2's scaled embedding).
    assert(cents(1).toSeq === cents(0).toSeq)
  }

  test("bounds fail loudly") {
    val df = vecs((1L, Seq(0.1f)))
    intercept[IllegalArgumentException] { Similarity.kmeansFit(df, k = 0, iters = 2) }
    intercept[IllegalArgumentException] { Similarity.kmeansFit(df, k = 2, iters = 0) }
  }
}
