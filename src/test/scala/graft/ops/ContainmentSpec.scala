package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins [[Dedup.containmentPairsFromHashes]] against a naive
  * driver-side all-pairs containment over the same shingle sets —
  * including the fragment-replicate cap's pair-set invariance and the
  * asymmetry Jaccard misses (a short quote inside a long doc). */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Docs engineered for asymmetry: 2 is a strict sub-document of 1
    * (full containment, low Jaccard), 3 shares half of 2, 4 is
    * disjoint, 5 duplicates 1. */
  private val texts = Seq(
    (1L, "a b c d e f g h i j k l m n o p"),
    (2L, "a b c d e f"),
    (3L, "d e f x y z"),
    (4L, "q r s t u v w"),
    (5L, "a b c d e f g h i j k l m n o p"))

  private def hashFrame = Dedup.shingleFrame(
    texts.toDF("doc_id", "text"), "doc_id", "text")

  private def naive(thresholdPct: Int): Set[(Long, Long, Long, Long, Long)] = {
    def shingleSet(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(3).map(_.toSeq).toSet
    (for {
      (i1, t1) <- texts; (i2, t2) <- texts if i1 < i2
      s1 = shingleSet(t1); s2 = shingleSet(t2)
      inter = (s1 & s2).size.toLong
      if inter * 100 >= thresholdPct * s1.size || inter * 100 >= thresholdPct * s2.size
    } yield (i1, i2, inter, s1.size.toLong, s2.size.toLong)).toSet
  }

  private def run(thresholdPct: Int, cap: Int): Set[(Long, Long, Long, Long, Long)] =
    Dedup.containmentPairsFromHashes(hashFrame, "doc_id", thresholdPct, cap)
      .select("d1", "d2", "inter_cnt", "n1", "n2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("pair set equals naive all-pairs containment") {
    assert(run(80, 1000) === naive(80))
    assert(run(50, 1000) === naive(50))
  }

  test("the hot-shingle cap never changes the pair set") {
    assert(run(80, 1) === naive(80)) // every shared shingle bucket splits
  }

  test("asymmetry: the quote is contained, Jaccard would miss it") {
    val pairs = Dedup.containmentPairsFromHashes(hashFrame, "doc_id", 80)
      .filter(col("d1") === 1L && col("d2") === 2L).collect()
    assert(pairs.length === 1)
    val r = pairs(0)
    assert(r.getAs[Int]("d2_in_d1") === 1) // 2 fully inside 1
    assert(r.getAs[Int]("d1_in_d2") === 0)
    // Jaccard inter/union = 4/14 — far below any dedup threshold.
    assert(r.getAs[Long]("inter_cnt") * 100 <
      40 * (r.getAs[Long]("n1") + r.getAs[Long]("n2") - r.getAs[Long]("inter_cnt")))
  }
}
