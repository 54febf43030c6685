package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins for [[TextHygiene]]: repair results, chain-order counting,
  * idempotence of the mojibake map, and the documented single-pass
  * limit of the special-token scrub (adversarial nesting). */
class TextHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(c: org.apache.spark.sql.Column, s: String): String =
    Seq(s).toDF("t").select(c.cast("string")).head().getString(0)

  private val eAcuteMoji = TextHygiene.MojibakeMap(3)._1 // Ã©
  private val quoteMoji = TextHygiene.MojibakeMap(0)._1 // â€™

  test("mojibake repair: cafe-acute and curly quote fixed, count matches") {
    val dirty = s"caf$eAcuteMoji and don${quoteMoji}t"
    assert(run(TextHygiene.fixMojibake(col("t")), dirty) ===
      "café and don't")
    assert(run(TextHygiene.mojibakeCount(col("t")), dirty) === "2")
  }

  test("mojibake repair is idempotent (repaired outputs never re-match)") {
    val dirty = s"x$eAcuteMoji $quoteMoji y"
    val once = run(TextHygiene.fixMojibake(col("t")), dirty)
    assert(run(TextHygiene.fixMojibake(col("t")), once) === once)
    assert(run(TextHygiene.mojibakeCount(col("t")), once) === "0")
  }

  test("special tokens counted and removed; clean text untouched") {
    val dirty = "a <|endoftext|> b <s>c</s> [INST]"
    assert(run(TextHygiene.specialTokenCount(col("t")), dirty) === "4")
    assert(run(TextHygiene.scrubSpecialTokens(col("t")), dirty) === "a  b c ")
    assert(run(TextHygiene.specialTokenCount(col("t")), "plain text") === "0")
  }

  test("single-pass limit: adversarial nesting can survive the scrub") {
    // Removing "<s>" from "<<s>s>" RECONSTRUCTS "<s>" — the classic
    // sanitizer bypass. The scrub is single-pass by design; the
    // release gate must quarantine on n_special > 0, not trust the
    // cleaned text of a flagged doc. This pin documents the contract.
    val nested = "<<s>s>"
    assert(run(TextHygiene.specialTokenCount(col("t")), nested) === "1")
    assert(run(TextHygiene.scrubSpecialTokens(col("t")), nested) === "<s>")
  }
}
