package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the unigram-LM tokenizer's two DP implementations against
  * each other and the trainer's invariants: [[Unigram.segmentFn]]
  * (the memoized apply path) must equal [[Unigram.viterbiCell]] (the
  * expression-space trainer path) segmentation-for-segmentation —
  * same candidate order, same strict-> first-win tie-break, same
  * fixed-order IEEE products — plus hand cases for the lattice
  * semantics and the coverage guarantee. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab: Seq[(String, Long)] = Seq(
    "a" -> 10L, "b" -> 8L, "c" -> 5L, "d" -> 1L,
    "ab" -> 12L, "bc" -> 6L, "abc" -> 4L, "cd" -> 2L)

  test("segmentFn ≡ viterbiCell on hand cases and seeded random words") {
    val rnd = new scala.util.Random(11)
    val words = Seq("a", "ab", "abc", "abcd", "dcba", "abab", "cdcd",
      "aabbccdd", "abcabcabc") ++
      (0 until 300).map(_ => Seq.fill(1 + rnd.nextInt(12))(
        "abcd" (rnd.nextInt(4))).mkString)
    val fn = Unigram.segmentFn(vocab)
    val viaExpr = words.distinct.toDF("w")
      .select(col("w"),
        Unigram.viterbiCell(col("w"), Unigram.probsLit(vocab))("seg").as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.distinct.foreach { w =>
      assert(fn(w)._1 === viaExpr(w), s"word '$w'")
      val np = viaExpr(w).split("\\|").count(_.nonEmpty).toLong
      assert(fn(w)._2 === np, s"piece count of '$w'")
    }
  }

  test("lattice semantics: multi-char pieces win when likelier") {
    val fn = Unigram.segmentFn(vocab)
    // p(ab) = 12/48 = 0.25 > p(a)*p(b) = (10/48)*(8/48) ≈ 0.0347.
    assert(fn("ab")._1 === "|ab")
    // "abc" whole piece beats ab+c and a+bc.
    assert(fn("abc") === ("|abc", 1L))
    // Coverage: a word of rare chars still segments (singles).
    assert(fn("dddd") === ("|d|d|d|d", 4L))
  }

  test("ties break to the shortest piece on both paths") {
    // p(aa) == p(a): score(a+a) = p² < p(aa) = p … make them EQUAL:
    // a two-char word where the single-split product equals the
    // two-char piece prob: p(x)=1/4, p(xx)=1/16 → x+x = 1/16 = xx.
    val v = Seq("x" -> 4L, "xx" -> 1L, "y" -> 11L)
    val fn = Unigram.segmentFn(v)
    val expr = Seq("xx").toDF("w")
      .select(Unigram.viterbiCell(col("w"), Unigram.probsLit(v))("seg"))
      .head().getString(0)
    // 4/16 * 4/16 = 1/16 exactly (powers of two — exact doubles):
    // equal scores, the l=1 chain was seen first and must win.
    assert(fn("xx")._1 === "|x|x")
    assert(expr === "|x|x")
  }

  test("trainVocab: alphabet always survives; EM drops unused seeds") {
    val types = Seq(("abab", 50L), ("abc", 30L), ("dd", 5L))
      .toDF("w", "n")
    val trained = Unigram.trainVocab(types)
    val pieces = trained.map(_._1).toSet
    Seq("a", "b", "c", "d").foreach(ch =>
      assert(pieces.contains(ch), s"alphabet char '$ch' pruned"))
    assert(trained.forall(_._2 >= 1L), "zero-count piece survived")
    // The dominant whole-word pieces win their words' lattices (a
    // 4-char piece at one lattice step beats any product of shorter
    // pieces' sub-1 probabilities) — EM must keep them and drop the
    // seed's unused fragments (no 'ba', 'bab', … in the final table).
    assert(pieces.contains("abab") && pieces.contains("abc")
      && pieces.contains("dd"))
    assert(!pieces.contains("ba") && !pieces.contains("bab"))
  }

  test("segmentFn fails fast on an uncovered character, not an index crash") {
    val fn = Unigram.segmentFn(vocab) // alphabet {a,b,c,d}
    // 'z' has no vocab piece: the DP cell at that position resolves
    // no candidate (bl = 0) — must surface as the named contract
    // error, never an ArrayIndexOutOfBoundsException from the
    // backtrack or a silent garbage segmentation.
    val e = intercept[IllegalStateException](fn("abz"))
    assert(e.getMessage.contains("coverage") && e.getMessage.contains("abz"))
    // Uncovered PREFIX too (the silent-negative-score path).
    intercept[IllegalStateException](fn("zab")): Unit
  }

  test("withSegmentedWords: per-doc counts and text, word-free doc = 0/''") {
    val df = Seq(
      (1L, Seq("ab", "abc")),
      (2L, Seq.empty[String])).toDF("doc_id", "ws")
    val out = Unigram.withSegmentedWords(df, "ws", vocab, "n_tok", "txt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) === ((2L, "ab abc")))
    assert(out(2L) === ((0L, "")))
  }

  test("incremental vocab maintenance: training from the fold ==" +
      " training from scratch (q211)") {
    // Word-type counts are additive, so the persisted type table plus
    // a batch's counts folds with one sum; trainVocab consumes a type
    // table by construction, so fold-trained must equal from-scratch
    // piece-for-piece, count-for-count (the q210 discipline on the
    // unigram family).
    val rnd = new scala.util.Random(29)
    val docs = (1 to 80).map(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(8))("abcde" (rnd.nextInt(5))).mkString)
        .mkString(" "))).toDF("doc_id", "text")
    def typesOf(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(Bpe.wordArray(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
    val cut = 64L
    val folded = typesOf(docs.filter(col("doc_id") < cut))
      .unionByName(typesOf(docs.filter(col("doc_id") >= cut)))
      .groupBy("w").agg(sum(col("n")).as("n"))
    assert(Unigram.trainVocab(folded) === Unigram.trainVocab(typesOf(docs)))
  }
}
