package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8 vectors, dim 4 → m=2 subspaces of 2 dims. Two obvious groups per
  // subspace so 2-entry codebooks have structure to find.
  private val vecs: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(0.1f, 0.2f, 0.9f, 0.8f),
    1L -> Array(0.9f, 0.8f, 0.1f, 0.2f),
    2L -> Array(0.15f, 0.25f, 0.85f, 0.75f),
    3L -> Array(0.85f, 0.75f, 0.15f, 0.25f),
    4L -> Array(0.12f, 0.22f, 0.88f, 0.78f),
    5L -> Array(0.88f, 0.78f, 0.12f, 0.22f),
    6L -> Array(0.5f, 0.5f, 0.5f, 0.5f),
    7L -> Array(0.05f, 0.3f, 0.95f, 0.7f))
  private lazy val df = vecs.toDF("vec_id", "embedding")

  /** The operator's scaling, reimplemented independently. */
  private def scaled(v: Array[Float]): Array[Long] =
    v.map(x => math.round((x.toDouble + 4.0) * 1000000.0))
  private def sqdist(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private lazy val cbs = Similarity.pqTrainCodebooks(df, dim = 4, m = 2,
    kPerSub = 2, iters = 2)
  private lazy val codes: Map[Long, Seq[Long]] =
    Similarity.pqEncode(df, cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  test("codebook shapes: m subspaces × kPerSub entries × dim/m components") {
    assert(cbs.length === 2)
    assert(cbs.forall(_.length === 2))
    assert(cbs.forall(_.forall(_.length === 2)))
  }

  test("codes are the per-subspace argmin over the codebook (independent recompute)") {
    assert(codes.keySet === vecs.map(_._1).toSet)
    for ((id, v) <- vecs; j <- 0 until 2) {
      val sv = scaled(v).slice(j * 2, (j + 1) * 2)
      val dists = cbs(j).map(c => sqdist(sv, c))
      val want = dists.indexOf(dists.min) // ties → smaller cid, like the fold
      assert(codes(id)(j) === want.toLong, s"vec $id subspace $j")
    }
  }

  test("pqTopK ranks by the independently recomputed asymmetric distance") {
    val got = Similarity.pqTopK(Similarity.pqEncode(df, cbs), cbs,
        df.filter(col("vec_id") <= 1), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))
    val want = for {
      (qid, qv) <- vecs.take(2)
      qs = scaled(qv)
      ranked = vecs.filter(_._1 != qid).map { case (id, _) =>
        val adist = (0 until 2).map { j =>
          sqdist(qs.slice(j * 2, (j + 1) * 2), cbs(j)(codes(id)(j).toInt))
        }.sum
        (id, adist)
      }.sortBy { case (id, d) => (d, id) }.take(3)
      ((id, d), i) <- ranked.zipWithIndex
    } yield (qid, id, i + 1, d)
    assert(got.toSeq === want.toSeq)
  }

  test("training, encoding, and ranking are deterministic across runs") {
    val cbs2 = Similarity.pqTrainCodebooks(df, dim = 4, m = 2,
      kPerSub = 2, iters = 2)
    assert(cbs2.map(_.map(_.toSeq)) === cbs.map(_.map(_.toSeq)))
    val codes2 = Similarity.pqEncode(df, cbs2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(codes2 === codes)
  }

  test("m must divide dim; empty codebooks rejected") {
    intercept[IllegalArgumentException] {
      Similarity.pqTrainCodebooks(df, dim = 4, m = 3, kPerSub = 2, iters = 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(Similarity.pqEncode(df, cbs), Seq.empty,
        df.filter(col("vec_id") <= 1), k = 3)
    }
  }

  test("pqEncode plans shuffle-free (the argmin folds ride the scan stage)") {
    val plan = Similarity.pqEncode(df, cbs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode shuffled:\n$plan")
  }
}
