package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins [[Similarity.mmrSelect]] against a naive driver-side greedy
  * MMR replaying the identical rounded-double arithmetic, and the
  * diversity property itself (a near-copy of the best hit is deferred
  * behind a less-relevant but diverse vector). */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Query 0 = e1. 1 and 2 are near-copies along e1 (2 a hair closer),
    * 3 is diverse (e2-heavy, still relevant), 4 orthogonal, 5 anti. */
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0.99f, 0.1f, 0f, 0f),
    2L -> Seq(0.995f, 0.05f, 0f, 0f),
    3L -> Seq(0.6f, 0.8f, 0f, 0f),
    4L -> Seq(0f, 0f, 1f, 0f),
    5L -> Seq(-1f, 0f, 0f, 0f))

  private def round6(x: Double): Double =
    math.round(x * 1e6) / 1e6 // roundFrac's half-away-from-zero on positives

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
  }

  private def naive(k: Int, lambdaPct: Int): Seq[(Long, Long)] = {
    val q = vecs.find(_._1 == 0L).get._2
    val lam = lambdaPct / 100.0; val pen = (100 - lambdaPct) / 100.0
    var rem = vecs.filter(_._1 != 0L).map { case (id, v) => (id, v, cos(q, v)) }
    var ms = Map.empty[Long, Double]
    (1 to k).map { i =>
      val pick =
        if (i == 1) rem.minBy { case (id, _, rel) => (-rel, id) }
        else rem.minBy { case (id, _, rel) => (-(lam * rel - pen * ms(id)), id) }
      rem = rem.filterNot(_._1 == pick._1)
      ms = rem.map { case (id, v, _) =>
        val s = cos(v, pick._2)
        id -> (if (i == 1) s else math.max(ms(id), s))
      }.toMap
      (i.toLong, pick._1)
    }
  }

  private def run(k: Int, lambdaPct: Int): Seq[(Long, Long)] =
    Similarity.mmrSelect(vecs.toDF("vec_id", "embedding"), 0L, k, lambdaPct)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("distributed greedy equals the sequential reference pick-for-pick") {
    for (lp <- Seq(70, 50)) assert(run(5, lp) === naive(5, lp), s"lambdaPct=$lp")
  }

  test("relevance prune + checkpointed rounds preserve picks on a random corpus") {
    // 120 seeded vectors with a wide rel spread (so the exact
    // λ·rel + (1−λ) prune actually removes candidates) and k past the
    // 8-round re-checkpoint boundary; the distributed greedy must
    // still equal the sequential reference pick-for-pick.
    val rnd = new scala.util.Random(421L)
    val many: Seq[(Long, Seq[Float])] = (0L until 120L).map { i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f)
    }
    def naiveMany(k: Int, lambdaPct: Int): Seq[(Long, Long)] = {
      val q = many.find(_._1 == 0L).get._2
      val lam = lambdaPct / 100.0; val pen = (100 - lambdaPct) / 100.0
      var rem = many.filter(_._1 != 0L).map { case (id, v) => (id, v, cos(q, v)) }
      var ms = Map.empty[Long, Double]
      (1 to k).map { i =>
        val pick =
          if (i == 1) rem.minBy { case (id, _, rel) => (-rel, id) }
          else rem.minBy { case (id, _, rel) => (-(lam * rel - pen * ms(id)), id) }
        rem = rem.filterNot(_._1 == pick._1)
        ms = rem.map { case (id, v, _) =>
          val s = cos(v, pick._2)
          id -> (if (i == 1) s else math.max(ms(id), s))
        }.toMap
        (i.toLong, pick._1)
      }
    }
    def runMany(k: Int, lambdaPct: Int): Seq[(Long, Long)] =
      Similarity.mmrSelect(many.toDF("vec_id", "embedding"), 0L, k, lambdaPct)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    for (lp <- Seq(100, 70, 30, 0))
      assert(runMany(12, lp) === naiveMany(12, lp), s"lambdaPct=$lp")
  }

  test("diversity: the near-copy of the top hit is deferred") {
    // At a diversity-heavy mix (λ = 0.3) the near-copy's ~0.999
    // similarity to the first pick must fall BEHIND every genuinely
    // diverse vector — under pure top-k it would be second (rel
    // ordering 2, 1, 3, 4, 5).
    val order = run(5, 30).map(_._2)
    assert(order.head === 2L)
    assert(order.last === 1L, s"expected the near-copy deferred to last, got $order")
    assert(order.indexOf(1L) > order.indexOf(3L))
  }
}
