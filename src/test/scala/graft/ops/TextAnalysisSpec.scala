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

  test("pageText: scripts/styles/comments removed, tags stripped, ws collapsed") {
    val in = "<html><head><style>p{x:1}</style><script>var a = 1 < 2;</script>" +
      "</head><body><!-- note --><p>Hello <b>world</b></p></body></html>"
    assert(one(in, TextAnalysis.pageText) === "Hello world")
    // Script content with angle brackets must not leak as text.
    assert(!one(in, TextAnalysis.pageText).contains("var"))
    // Tag-free input passes through (collapsed).
    assert(one("plain   text", TextAnalysis.pageText) === "plain text")
  }

  test("mainBlockStruct: density argmax picks the text-dense long block") {
    def best(html: String): (Long, String) = {
      val r = Seq(html).toDF("h")
        .select(TextAnalysis.mainBlockStruct(col("h")).as("b"))
        .select(col("b").getField("s"), col("b").getField("t"))
        .collect().head
      (r.getLong(0), r.getString(1))
    }
    val nav = "<nav><a href=\"/x\">home</a> <a href=\"/y\">about</a></nav>"
    val main = "<div>the quick brown fox jumps over the lazy dog again and again</div>"
    val promo = "<div>subscribe now</div>"
    val (s, t) = best(s"<body>$nav$main$promo</body>")
    assert(t === "the quick brown fox jumps over the lazy dog again and again")
    // Exact integer density of the winning block: len(txt)²·1000/(len(raw)+1)
    // — raw = txt here (no inline tags).
    val n = "the quick brown fox jumps over the lazy dog again and again".length.toLong
    assert(s === n * n * 1000 / (n + 1))
    // The link-farm nav loses even against a same-text-length div: its
    // markup inflates len(raw).
    val navTxt = "<nav><a href=\"/first\">alpha beta</a> <a href=\"/second\">gamma</a></nav>"
    val plain = "<div>alpha beta gamma</div>"
    assert(best(s"$navTxt$plain")._2 === "alpha beta gamma")
    // Tie on score → first block wins (the −index field).
    assert(best("<div>same text</div><div>same text</div>")._2 === "same text")
    // No block containers at all → null struct.
    val none = Seq("<html><body>loose text</body></html>").toDF("h")
      .select(TextAnalysis.mainBlockStruct(col("h"))).collect().head
    assert(none.isNullAt(0))
  }

  test("blockContents: flat block model, script/style removed first") {
    def blocks(html: String): Seq[String] =
      Seq(html).toDF("h")
        .select(TextAnalysis.blockContents(col("h"))).collect()
        .head.getSeq[String](0).toSeq
    assert(blocks("<div>a</div><p>b</p><footer>c</footer>") === Seq("a", "b", "c"))
    // A style block containing 'p{...}' must never yield a phantom block.
    assert(blocks("<style>div{x:1}</style><div>real</div>") === Seq("real"))
    // Nested markup: innermost-first fragment (deterministic on both
    // engines) — the outer open pairs with the INNER close.
    assert(blocks("<div>a<div>b</div>c</div>") === Seq("a<div>b"))
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
