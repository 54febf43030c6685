package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class UnicodeExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(in).toDF("t").select(f(col("t"))).collect().head.getString(0)

  test("nfc composes decomposed sequences; leaves compatibility chars alone") {
    assert(one("cafe\u0301", UnicodeExpressions.nfc) === "caf\u00E9")
    assert(one("a\u0300b", UnicodeExpressions.nfc) === "\u00E0b")
    // The fi ligature is COMPATIBILITY-equivalent only: NFC keeps it.
    assert(one("\uFB01lter", UnicodeExpressions.nfc) === "\uFB01lter")
  }

  test("nfkc folds compatibility characters (ligature, fullwidth)") {
    assert(one("\uFB01lter", UnicodeExpressions.nfkc) === "filter")
    // Fullwidth digit U+FF11 → '1'.
    assert(one("\uFF11\uFF12", UnicodeExpressions.nfkc) === "12")
    assert(one("cafe\u0301", UnicodeExpressions.nfkc) === "caf\u00E9")
  }

  test("ASCII fast path returns the input unchanged, null propagates") {
    assert(one("plain ascii 42!", UnicodeExpressions.nfc) === "plain ascii 42!")
    // Interpreted path: the fast path must return the SAME UTF8String
    // reference (no allocation on the 100 TB-dominant case).
    val expr = UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFC")
    val u = UTF8String.fromString("ascii only")
    assert(expr.nullSafeEval(u).asInstanceOf[AnyRef] eq u)
    // Already-normalized non-ASCII also comes back as the same ref.
    val v = UTF8String.fromString("caf\u00E9")
    assert(expr.nullSafeEval(v).asInstanceOf[AnyRef] eq v)
    val n = Seq[(String, Option[String])](("a", None)).toDF("a", "t")
      .select(UnicodeExpressions.nfc(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("unknown form rejected; dedup collapse works end-to-end") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
    // Two codepoint-equivalent spellings group as ONE key after nfc.
    val df = Seq("caf\u00E9", "cafe\u0301").toDF("t")
    assert(df.select(countDistinct(col("t"))).head.getLong(0) === 2L)
    assert(df.select(countDistinct(UnicodeExpressions.nfc(col("t"))))
      .head.getLong(0) === 1L)
  }
}
