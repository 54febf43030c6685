package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-pinned and brute-force-checked cases for [[QualityFilters]]:
  * the run-length repetition signals (duplicate-line fractions, top
  * 2-gram share, tie-breaks) and each C4 line/page rule including the
  * line-passes/page-fails distinction. */
class QualityFiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gopher(docId: Long, text: String, lines: Seq[String]) = {
    val df = Seq((docId, text, lines)).toDF("doc_id", "text", "lines")
    QualityFilters.gopherSignals(df).head()
  }

  test("duplicate lines: [a,a,b] → 1/3 dup lines, dup chars over all copies") {
    val r = gopher(1L, "w x y z mmmm", Seq("aaaa", "aaaa", "bb"))
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[Long]("dup_line_milli") === 333L) // (3-2)*1000 div 3
    // dup chars = 2 copies * 4 chars = 8 of 10 total line chars
    assert(r.getAs[Long]("dup_char_milli") === 800L)
  }

  test("top 2-gram: count, identity, and char share") {
    // grams: "x y","y x","x y","y x","x y" → "x y"×3 wins
    val r = gopher(1L, "x y x y x y", Seq("l"))
    assert(r.getAs[Long]("top2_cnt") === 3L)
    assert(r.getAs[String]("top2_gram") === "x y")
    // 3 * len("x y")=3 * 1000 div len(text)=11
    assert(r.getAs[Long]("top2_char_milli") === 818L)
    assert(r.getAs[Long]("mean_wlen_milli") === 1000L)
  }

  test("top 2-gram tie breaks to the lexicographically smallest") {
    // grams: "a b","b c","c a","a b","b c" → "a b"=2, "b c"=2, "c a"=1
    val r = gopher(1L, "a b c a b c", Seq("l"))
    assert(r.getAs[Long]("top2_cnt") === 2L)
    assert(r.getAs[String]("top2_gram") === "a b")
  }

  test("run-length signals match a brute-force count on seeded random docs") {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 60).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(40))(
        "w" + rnd.nextInt(8)).mkString(" ")
      val lines = Seq.fill(1 + rnd.nextInt(6))("L" + rnd.nextInt(4))
      (i.toLong, words, lines)
    }
    val got = QualityFilters.gopherSignals(
      docs.toDF("doc_id", "text", "lines"))
      .select("doc_id", "dup_line_milli", "dup_char_milli", "top2_cnt",
        "top2_gram")
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text, lines) =>
      val counts = lines.groupBy(identity).view.mapValues(_.size)
      val dupLines = lines.size - counts.size
      val dupChars = counts.collect { case (l, c) if c > 1 => c * l.length }.sum
      val totChars = lines.map(_.length).sum
      val ws = text.split(" ")
      val grams = ws.sliding(2).map(_.mkString(" ")).toSeq
      val gc = grams.groupBy(identity).view.mapValues(_.size)
      val maxCnt = gc.values.max
      val top = gc.collect { case (g, c) if c == maxCnt => g }.min
      val r = got(id)
      assert(r.getAs[Long]("dup_line_milli") === dupLines * 1000L / lines.size)
      assert(r.getAs[Long]("dup_char_milli") === dupChars * 1000L / totChars)
      assert(r.getAs[Long]("top2_cnt") === maxCnt.toLong, s"doc $id")
      assert(r.getAs[String]("top2_gram") === top, s"doc $id")
    }
  }

  test("single-word doc: no 2-grams, NULL top2 signals, keep_gopher=0") {
    // sequence(1, size-1) on a 1-word doc is Spark's DESCENDING
    // [1, 0] whose element_at(ws, 0) throws — the guard must yield
    // the oracle's empty gram list (DuckDB range(1,1)=[]) instead.
    val r = gopher(1L, "solo", Seq("solo"))
    assert(r.isNullAt(r.fieldIndex("top2_cnt")))
    assert(r.isNullAt(r.fieldIndex("top2_gram")))
    assert(r.isNullAt(r.fieldIndex("top2_char_milli")))
    // NULL gate condition lands on 0 like the oracle's CASE ELSE 0,
    // never a NULL keep flag.
    assert(r.getAs[Int]("keep_gopher") === 0)
    assert(r.getAs[Long]("mean_wlen_milli") === 4000L) // 4 chars / 1 word
  }

  test("empty line array: empty runs, zero dup signals, no crash") {
    val df = Seq((1L, "a b", Seq.empty[String])).toDF("doc_id", "text", "lines")
    val r = QualityFilters.gopherSignals(df).head()
    assert(r.getAs[Long]("n_lines") === 0L)
    // 0-line docs divide by n_lines=0: integer `div` yields NULL on
    // both engines (not a crash), and the keep flag stays 0.
    assert(r.isNullAt(r.fieldIndex("dup_line_milli")))
    assert(r.getAs[Int]("keep_gopher") === 0)
  }

  private def c4(lines: Seq[String]) = {
    val df = Seq((1L, lines)).toDF("doc_id", "lines")
    QualityFilters.c4Clean(df).head()
  }

  test("C4 line rules: period, ≥5 words, javascript, cookies") {
    val r = c4(Seq(
      "one two three four five.", // kept
      "one two three four five", // no terminal period
      "too short line.", // < 5 words
      "please enable javascript to view this.", // code marker
      "we use cookies on this site okay.")) // policy marker
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[String]("text_c4") === "one two three four five.")
  }

  test("C4 page rules: brace and lorem kill the page; line count gates") {
    val three = Seq("a b c d e.", "f g h i j.", "k l m n o.")
    assert(c4(three).getAs[Int]("page_keep") === 1)
    // lorem line PASSES the line filter but kills the page
    val lorem = c4(three :+ "lorem ipsum dolor sit amet.")
    assert(lorem.getAs[Long]("n_kept") === 4L)
    assert(lorem.getAs[Int]("page_keep") === 0)
    assert(c4(three :+ "function() { return 0; }")
      .getAs[Int]("page_keep") === 0)
    // 2 surviving lines < C4MinLines
    assert(c4(three.take(2)).getAs[Int]("page_keep") === 0)
  }
}
