package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Gates the FLOAT leg of the perplexity path (the part the DuckDB
  * oracle cannot hash): [[LmScore.bigramNll]] against a naive Scala
  * fold over raw strings, the provable |nll − skel| < n bound, and
  * the declared q159 flag on the harness corpus. */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def log2(x: Long): Double = math.log(x.toDouble) / math.log(2.0)
  private def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Naive reference: per-doc (n, nll, skel) from raw texts, exactly
    * the operator's documented formula (conditional bigram MLE over
    * the corpus's own counts, split-on-single-space tokens matching
    * Dedup.tokens / the oracle's string_split). */
  private def naive(corpus: Seq[(Long, String)])
      : Map[Long, (Long, Double, Long)] = {
    def bigrams(text: String): Seq[String] = {
      val ws = text.split(" ", -1)
      (0 until ws.length - 1).map(i => ws(i) + " " + ws(i + 1))
    }
    val perDoc = corpus.map { case (id, t) =>
      id -> bigrams(t).groupBy(identity).map { case (bg, o) => bg -> o.size.toLong }
    }
    val c = perDoc.flatMap(_._2).groupBy(_._1)
      .map { case (bg, xs) => bg -> xs.map(_._2).sum }
    val cp = c.groupBy(_._1.split(" ", -1)(0))
      .map { case (w1, xs) => w1 -> xs.values.sum }
    perDoc.filter(_._2.nonEmpty).map { case (id, bfs) =>
      val n = bfs.values.sum
      val nll = bfs.map { case (bg, tf) =>
        tf * (log2(cp(bg.split(" ", -1)(0))) - log2(c(bg)))
      }.sum
      val skel = bfs.map { case (bg, tf) =>
        tf * (bits(cp(bg.split(" ", -1)(0))) - bits(c(bg)))
      }.sum
      id -> ((n, nll, skel))
    }.toMap
  }

  private def bfOf(corpus: Seq[(Long, String)]) = {
    val ws = Dedup.tokens(col("text"))
    val pairs = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat_ws(" ", a, b))
    corpus.toDF("doc_id", "text")
      .select(col("doc_id"), explode(pairs).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
  }

  test("bigramNll == naive fold on seeded corpora (float and skeleton legs)") {
    for (seed <- Seq(3, 77)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq("the", "cat", "sat", "on", "a", "mat", "xyzzy", "q")
      val corpus = (1L to 50L).map { id =>
        id -> Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      }
      val got = LmScore.bigramNll(bfOf(corpus))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
      val want = naive(corpus)
      assert(got.keySet === want.keySet, s"doc set, seed $seed")
      got.foreach { case (id, (n, nll, skel)) =>
        val (wn, wnll, wskel) = want(id)
        assert(n === wn, s"n_bigrams doc $id seed $seed")
        assert(skel === wskel, s"skel_bits doc $id seed $seed")
        assert(math.abs(nll - wnll) <= 1e-9 * math.max(1.0, math.abs(wnll)),
          s"nll_bits doc $id seed $seed: got $nll want $wnll")
        // The provable bound the declared flag rides on.
        assert(math.abs(nll - skel) < n.toDouble, s"bound doc $id seed $seed")
      }
    }
  }

  test("q159's flag is 1 for every harness document (the declared gate)") {
    val q = graft.SparkEntry.queries("q159_float_perplexity")
    val rows = q(spark, "/root/testdata/sf0.001")
      .select("ppx_ok").distinct().as[Int].collect().toSet
    assert(rows === Set(1))
  }
}
