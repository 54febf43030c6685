package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-level text hygiene for crawled corpora: mojibake repair (the
  * ftfy problem — UTF-8 bytes once decoded as Latin-1/cp1252 leave
  * artifacts like "Ã©" where "é" was meant) and special-token
  * scrubbing (raw text carrying a tokenizer's control strings —
  * "<|endoftext|>" in a crawled page — would let a document fake a
  * document boundary or a chat role at training time: the classic
  * prompt-injection-via-pretraining vector, so release pipelines
  * strip them and LOG the count as a poisoning signal).
  *
  * Both are chains of LITERAL global replacements — one codegen'd map
  * pass, no regex backtracking (the patterns carry regex metachars
  * like `|`, so literal `replace` is also the correctness-simple
  * form), identical semantics on any engine. Counts come from the
  * length-delta trick (chars removed / pattern length), exact in
  * integers on both engines since `length` counts codepoints in
  * Spark and DuckDB alike.
  */
object TextHygiene {

  /** Common cp1252-mojibake artifacts → intended character. Applied
    * in chain ORDER; no pattern is a prefix of another (the 3-char
    * artifacts share "\u00e2\u20ac" but differ in the third char), so
    * the chain is order-independent -- kept fixed anyway for the
    * count/replace agreement. Unicode escapes, not raw glyphs:
    * invisible codepoints in source literals are exactly the bug
    * class this operator exists to fix. */
  val MojibakeMap: Seq[(String, String)] = Seq(
    "\u00e2\u20ac\u2122" -> "'", // E2 80 99 (U+2019 ') via cp1252
    "\u00e2\u20ac\u0153" -> "\u201c", // E2 80 9C (U+201C) via cp1252
    "\u00e2\u20ac\u201d" -> "\u2014", // E2 80 94 (U+2014 em dash) via cp1252
    "\u00c3\u00a9" -> "\u00e9", // C3 A9 (e-acute) via Latin-1
    "\u00c3\u00a8" -> "\u00e8", // C3 A8 (e-grave)
    "\u00c3\u00bc" -> "\u00fc", // C3 BC (u-umlaut)
    "\u00c3\u00b1" -> "\u00f1") // C3 B1 (n-tilde)

  /** Tokenizer control strings that must never appear in raw text. */
  val SpecialTokens: Seq[String] = Seq(
    "<|endoftext|>", "<|user|>", "<|assistant|>", "<s>", "</s>", "[INST]")

  /** Literal global replace chain. */
  private def replaceChain(c: Column, pairs: Seq[(String, String)]): Column =
    pairs.foldLeft(c) { case (acc, (from, to)) =>
      call_function("replace", acc, lit(from), lit(to))
    }

  /** Occurrences of `pat` in `c` (length delta / pattern length —
    * counts non-overlapping occurrences exactly like the replace that
    * follows removes them). Integral `div`, not float `/`: the delta
    * is an exact multiple of the pattern length, and an integer-typed
    * chain keeps the count exact at any magnitude (a DoubleType count
    * is only exact below 2^53 and leaks a double into callers). */
  def countOccurrences(c: Column, pat: String): Column =
    call_function("div",
      (length(c) - length(call_function("replace", c, lit(pat), lit(""))))
        .cast("long"),
      lit(pat.length.toLong))

  /** Repaired text. */
  def fixMojibake(c: Column): Column = replaceChain(c, MojibakeMap)

  /** Mojibake artifact count BEFORE repair (the corpus-health metric
    * a release datasheet reports next to the repair). Counted on the
    * same in-order chain semantics as [[fixMojibake]]: each artifact
    * is counted on the text with the PRECEDING rules already applied. */
  def mojibakeCount(c: Column): Column =
    MojibakeMap.indices.foldLeft(lit(0L)) { (acc, i) =>
      val applied = replaceChain(c, MojibakeMap.take(i))
      acc + countOccurrences(applied, MojibakeMap(i)._1).cast("long")
    }

  /** Scrubbed text (control strings removed outright — a replacement
    * placeholder would itself be a special string). */
  def scrubSpecialTokens(c: Column): Column =
    replaceChain(c, SpecialTokens.map(_ -> ""))

  /** Count of special-token occurrences (poisoning signal). Token
    * list is prefix-free in practice; counted in chain order like
    * [[mojibakeCount]]. */
  def specialTokenCount(c: Column): Column =
    SpecialTokens.indices.foldLeft(lit(0L)) { (acc, i) =>
      val applied = replaceChain(c, SpecialTokens.take(i).map(_ -> ""))
      acc + countOccurrences(applied, SpecialTokens(i)).cast("long")
    }
}
