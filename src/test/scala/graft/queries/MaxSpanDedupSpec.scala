package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-corpus pins for the maximal-span substring dedup family
  * (q208/q209) — the semantics the sf0.01 oracle can't isolate:
  * run chaining (consecutive duplicated 8-token positions merge into
  * ONE maximal span), chaining ACROSS DIFFERENT PARTNERS (left half
  * duplicates one doc, right half another — still one run), within-
  * doc repeats, and the rewrite's first-occurrence survivor rule
  * (smallest (doc_id, pos) keeps its tokens everywhere). */
class MaxSpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // doc1/doc2 share the 12-token passage P (doc1 first → survives);
  // doc3 repeats an 8-token block internally; doc4 is all-unique;
  // doc5's first 10 tokens duplicate doc6 and its last 10 duplicate
  // doc7 — no single partner holds all 12, but positions 1..5 are all
  // duplicated so q208 must chain them into one run.
  private val P = (1 to 12).map(i => s"p$i")
  private val Qb = (1 to 8).map(i => s"q$i")
  private val C = (1 to 12).map(i => s"c$i")
  private val docs = Seq(
    1L -> (Seq("n1a", "n1b", "n1c") ++ P ++ Seq("n1d", "n1e")),
    2L -> (Seq("m1", "m2") ++ P ++ Seq("m3")),
    3L -> (Seq("k1", "k2") ++ Qb ++ Seq("k3", "k4", "k5") ++ Qb ++ Seq("k6")),
    4L -> (1 to 10).map(i => s"u$i"),
    5L -> C,
    6L -> (C.take(10) ++ Seq("z1", "z2")),
    7L -> (Seq("y1", "y2") ++ C.drop(2)))

  private def withCorpus[A](body: String => A): A = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("maxspan").toString
    try {
      docs.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      body(dir)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q208: maximal runs chain, including across different partners") {
    withCorpus { dir =>
      val rows = graft.SparkEntry.queries("q208_maxspan_dedup")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val byKey = rows.map(t => (t._1, t._2, t._3)).toSet
      assert(byKey === Set(
        (1L, 4L, 12L), (2L, 3L, 12L),          // shared P, one run each
        (3L, 3L, 8L), (3L, 14L, 8L),            // within-doc repeat: two runs
        (5L, 1L, 12L),                          // cross-partner chain: ONE run
        (6L, 1L, 10L), (7L, 3L, 10L)))
      // The reported text is the maximal span itself.
      val texts = rows.map(t => (t._1, t._2) -> t._4).toMap
      assert(texts((1L, 4L)) === P.mkString(" "))
      assert(texts((5L, 1L)) === C.mkString(" "))
      assert(texts((3L, 14L)) === Qb.mkString(" "))
    }
  }

  test("q209: first occurrence survives everywhere, others' tokens drop") {
    withCorpus { dir =>
      val out = graft.SparkEntry.queries("q209_maxspan_dedup_rewrite")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val full = docs.toMap
      assert(out(1L) === ((17L, 0L, full(1L).mkString(" "))))   // P's first home
      assert(out(2L) === ((15L, 12L, "m1 m2 m3")))
      assert(out(3L) === ((22L, 8L,
        (Seq("k1", "k2") ++ Qb ++ Seq("k3", "k4", "k5", "k6")).mkString(" "))))
      assert(out(4L) === ((10L, 0L, full(4L).mkString(" "))))   // untouched
      assert(out(5L) === ((12L, 0L, C.mkString(" "))))          // firsts survive
      assert(out(6L) === ((12L, 10L, "z1 z2")))
      assert(out(7L) === ((12L, 10L, "y1 y2")))
    }
  }
}
