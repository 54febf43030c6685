package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(in).toDF("t").select(f(col("t"))).collect().head.getString(0)

  test("normalize: lowercase, strip punctuation, collapse whitespace, trim") {
    assert(one("  Hello,   WORLD!! 42 ", TextAnalysis.normalize) === "hello world 42")
    assert(one("a--b__c", TextAnalysis.normalize) === "a b c")
    assert(one("!!!", TextAnalysis.normalize) === "")
  }

  test("scrubPii: emails, cards, phones redacted; card wins over phone pattern") {
    val in = "mail a.b+x@ex.co or +7 (900) 123-45-67 card 4111111111111111 ok"
    assert(one(in, TextAnalysis.scrubPii) ===
      "mail <EMAIL> or <PHONE> card <CARD> ok")
    // A bare 16-digit run must become <CARD>, not <PHONE> — ordering
    // matters because the run also satisfies the looser phone pattern.
    assert(one("n 1234567890123456 n", TextAnalysis.scrubPii) === "n <CARD> n")
    assert(one("clean text stays", TextAnalysis.scrubPii) === "clean text stays")
  }

  test("chunkStarts/chunkAt: clamped sliding windows with overlap") {
    def chunks(text: String, stride: Int, size: Int): Seq[Seq[String]] = {
      val ws = Dedup.tokens(col("t"))
      Seq(text).toDF("t")
        .select(explode(TextAnalysis.chunkStarts(ws, stride)).as("s"), ws.as("ws"))
        .select(TextAnalysis.chunkAt(col("ws"), col("s"), size))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
    }
    // 5 tokens, window 3, stride 2 → starts 0,2,4; tail clamps.
    assert(chunks("a b c d e", 2, 3) ===
      Seq(Seq("a", "b", "c"), Seq("c", "d", "e"), Seq("e")))
    // Shorter than one window → a single clamped chunk.
    assert(chunks("a b", 4, 8) === Seq(Seq("a", "b")))
    // Exact multiple of the stride → no empty trailing chunk.
    assert(chunks("a b c d", 2, 2) === Seq(Seq("a", "b"), Seq("c", "d")))
  }

  test("spanGrams: sliding n-token spans; short documents yield none") {
    def spans(text: String, n: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(explode(TextAnalysis.spanGrams(split(col("t"), " "), n)))
        .collect().map(_.getString(0)).toSeq
    assert(spans("a b c d", 3) === Seq("a b c", "b c d"))
    assert(spans("a b c", 3) === Seq("a b c")) // exactly n tokens: one span
    assert(spans("a b", 3) === Seq.empty)      // shorter than n: no spans
    assert(spans("a a a a", 2) === Seq("a a", "a a", "a a")) // repeats kept
    intercept[IllegalArgumentException] {
      TextAnalysis.spanGrams(split(col("t"), " "), 0)
    }
  }

  test("langPredict ties break alphabetically on profile order") {
    val scores = Seq(lit(2L), lit(2L), lit(1L), lit(0L), lit(0L))
    val got = Seq("x").toDF("t")
      .select(TextAnalysis.langPredict(scores)).collect().head.getString(0)
    assert(got === "de") // de and en tie at 2; alphabetical first wins
  }
}
