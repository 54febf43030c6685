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

  // ── auto-k + two-level residual codebook ──────────────────────────

  test("autoCodebookK: integer-exact occupancy-64 sizing, clamped") {
    // The 500-vector oracle scale yields exactly the historical k=8
    // gate config — the autoPlanes discipline.
    assert(Similarity.autoCodebookK(500) === 8)
    assert(Similarity.autoCodebookK(1) === 8)
    assert(Similarity.autoCodebookK(512) === 8)
    assert(Similarity.autoCodebookK(513) === 9)
    assert(Similarity.autoCodebookK(2000) === 32)
    assert(Similarity.autoCodebookK(200000) === 3125)
    assert(Similarity.autoCodebookK(64L * 8192) === 8192)
    assert(Similarity.autoCodebookK(Long.MaxValue / 2) === 8192) // clamp
  }

  test("sqrtCeil: exact at and around perfect squares") {
    assert(Similarity.sqrtCeil(1) === 1)
    assert(Similarity.sqrtCeil(8) === 3)
    assert(Similarity.sqrtCeil(9) === 3)
    assert(Similarity.sqrtCeil(10) === 4)
    assert(Similarity.sqrtCeil(3125) === 56)
    assert(Similarity.sqrtCeil(8192) === 91)
    intercept[IllegalArgumentException] { Similarity.sqrtCeil(0) }
  }

  test("residual trainer with a 1-cell fine level equals the flat coarse fit") {
    // kFine = 1 makes the fine level a no-op for the cid (everything
    // lands in fine cell 0), so cid = coarseCid·1 + 0 must MATCH the
    // flat trainer exactly — pins that the two-level path's coarse
    // leg is the same Lloyd chain, not a reimplementation.
    val df = vecs((1L to 40L).map(i =>
      (i, Seq(math.sin(i * 2.3).toFloat, math.cos(i * 1.1).toFloat,
        (i % 9) / 10f, -(i % 4) / 10f))): _*)
    val flat = Similarity.kmeansFit(df, k = 5, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val resid = Similarity.kmeansFitResidual(df, kCoarse = 5, kFine = 1, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resid === flat)
  }

  test("two-level residual fit: cid space, determinism, finer-than-coarse blocking") {
    val df = vecs((1L to 60L).map(i =>
      (i, Seq(math.sin(i * 1.3).toFloat, math.cos(i * 0.7).toFloat,
        math.sin(i * 0.31).toFloat, (i % 11) / 12f))): _*)
    val r1 = Similarity.kmeansFitResidual(df, kCoarse = 4, kFine = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cid = coarse·kFine + fine ∈ [0, 12); distances are exact bigints ≥ 0.
    assert(r1.forall { case (_, cid, dist) => cid >= 0 && cid < 12 && dist >= 0 })
    assert(r1.map(_._1).size === 60)
    // Same coarse cell ⇒ same cid/kFine; the fine level only splits
    // WITHIN coarse cells (cid // kFine recovers the coarse cid).
    val coarse = Similarity.kmeansFit(df, k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.forall { case (id, cid, _) => cid / 3 === coarse(id) })
    // Bit-exact under repartitioning, like the flat trainer.
    val r2 = Similarity.kmeansFitResidual(df.repartition(7), kCoarse = 4, kFine = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 === r2)
  }
}
