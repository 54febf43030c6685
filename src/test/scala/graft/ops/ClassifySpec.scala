package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[Classify.thresholdFit]] — the two-phase bucketed threshold
  * scan must equal a naive driver-side scan over every candidate cut
  * (the rankNormalize/q143 decomposition discipline, over a SIGNED
  * projection), with the balanced-accuracy objective and the
  * smallest-τ tie break. */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = Classify.NumBuckets

  /** Synthetic feature rows: label mostly follows f0 (plus noise rows
    * that make the classes overlap, so the optimal cut is
    * non-trivial), negative projections included. */
  private def synth(n: Int, seed: Int): Seq[(Seq[Long], Int)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val label = rnd.nextInt(2)
      val f0 = (if (label == 1) 30 else 10) + rnd.nextInt(25)
      val rest = Seq.fill(B - 1)(rnd.nextInt(12).toLong)
      (f0.toLong +: rest, label)
    }
  }

  private def toDf(rows: Seq[(Seq[Long], Int)]) =
    rows.zipWithIndex.map { case ((fs, y), i) => (i.toLong, fs, y) }
      .toDF("id", "fs", "label")
      .select(col("id") +: col("label") +:
        (0 until B).map(b => col("fs")(b).as(s"f$b")): _*)

  /** Naive reference: exact centroid arithmetic, projection, and an
    * all-candidates balanced-accuracy scan with smallest-τ ties. */
  private def naiveFit(rows: Seq[(Seq[Long], Int)]): (Seq[Long], Long) = {
    val S = Classify.Scale
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val w = (0 until B).map { b =>
      pos.map(_(b)).sum * S / pos.size - neg.map(_(b)).sum * S / neg.size
    }
    val proj = rows.map { case (fs, y) =>
      ((0 until B).map(b => fs(b) * w(b)).sum, y)
    }
    val best = proj.map(_._1).distinct.sorted.map { tau =>
      val tp = proj.count { case (p, y) => p >= tau && y == 1 }
      val tn = proj.count { case (p, y) => p < tau && y == 0 }
      (tp * S / pos.size + tn * S / neg.size, tau)
    }.maxBy { case (bal, tau) => (bal, -tau) } // max bal, then SMALLEST tau
    (w, best._2)
  }

  test("thresholdFit equals the naive all-candidates scan (direction and τ)") {
    for (seed <- Seq(51, 52, 53)) {
      val rows = synth(200, seed)
      val (w, tau) = Classify.thresholdFit(toDf(rows), "label")
      val (wn, taun) = naiveFit(rows)
      assert(w.toSeq === wn, s"direction mismatch at seed=$seed")
      assert(tau === taun, s"τ mismatch at seed=$seed")
    }
  }

  test("the fitted cut separates a separable set perfectly, ties to keep") {
    val rows = synth(150, 54).map { case (fs, _) =>
      (fs, if (fs.head >= 25) 1 else 0) // label IS a threshold on f0
    }
    val df = toDf(rows)
    val (w, tau) = Classify.thresholdFit(df, "label")
    val pred = Classify.thresholdPredict(df, w, tau)
      .select("label", "label_model").collect()
    assert(pred.forall(r => r.getInt(0) == r.getInt(1)),
      "separable data must classify exactly")
  }

  test("one-class training fails loudly") {
    val rows = synth(30, 55).map { case (fs, _) => (fs, 1) }
    val ex = intercept[IllegalArgumentException] {
      Classify.thresholdFit(toDf(rows), "label")
    }
    assert(ex.getMessage.contains("both classes"))
  }

  test("insensitive to input partitioning (two-phase scan determinism)") {
    val rows = synth(300, 56)
    val (w1, t1) = Classify.thresholdFit(toDf(rows), "label")
    val (w2, t2) = Classify.thresholdFit(toDf(rows).repartition(13), "label")
    assert(w1.toSeq === w2.toSeq && t1 === t2)
  }
}
