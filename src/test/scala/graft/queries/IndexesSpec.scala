package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.{Dedup, Similarity}

/** The per-process index registry must be a pure MATERIALIZATION: every
  * persisted artifact value-identical to the inline pipeline it
  * replaces (the declared-query oracles pin the same property at
  * sf0.01 — q57 for labels, q64 for tf, q68 for cells; this is the
  * unit-level pin at sf0.001, including artifacts a query reads only
  * partially). */
class IndexesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val thr = 0.4

  private def docs = graft.io.Sources.table(spark, sf, "documents")

  test("neardup edges and labels match the inline signature pipeline") {
    val inlineEdges = Dedup.scoredCandidatePairs(
        Dedup.minhashSignatures(docs.select("doc_id", "text"), "doc_id", "text"),
        "doc_id", Dedup.DefaultMaxBandFreq)
      .filter(col("__inter").cast("double") / col("__union") >= thr)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromIndex = Indexes.neardupEdges(spark, sf, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex === inlineEdges)
    assert(fromIndex.nonEmpty, "fixture corpus must contain near-dups")
    val inlineLabels = Dedup.connectedComponents(
        Indexes.neardupEdges(spark, sf, thr))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val labelIndex = Indexes.neardupLabels(spark, sf, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelIndex === inlineLabels)
  }

  test("term frequencies match the inline tokenize aggregate") {
    val inline = docs
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val fromIndex = Indexes.termFrequencies(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(fromIndex === inline)
  }

  test("k-means cells match an inline fit (deterministic integer training)") {
    val inline = Similarity.kmeansFit(
        graft.io.Sources.table(spark, sf, "embeddings"), k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromIndex = Indexes.kmeansCells(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex === inline)
  }

  test("span occurrences match the inline normalize+explode aggregate") {
    import spark.implicits._
    val toks = split(graft.ops.TextAnalysis.normalize(col("text")), " ")
    val inline = docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(graft.ops.TextAnalysis.spanGrams(col("toks"), 8)).as("span"))
      .groupBy("doc_id", "span").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val fromIndex = Indexes.spanOccurrences(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fromIndex === inline)
  }

  test("a corpus recommit moves the registry to a new epoch and rebuilds") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vers_corpus").toString
    val st = new graft.io.TableStore(spark, root)
    st.commitVersioned("documents", Seq(
      (1L, "alpha beta alpha", "s0"), (2L, "alpha beta gamma", "s0"))
      .toDF("doc_id", "text", "source"))
    assert(Indexes.corpusEpoch(spark, root) === 1L)
    val words1 = Indexes.termFrequencies(spark, root)
      .collect().map(_.getString(1)).toSet
    assert(words1 === Set("alpha", "beta", "gamma"))
    // Gen-1 top pair: alpha's chars dominate, tie-break lands (a, l).
    assert(Indexes.bpeMerges(spark, root, 1) === Seq(("a", "l")))
    // Recommit the corpus: generation 2 with disjoint vocabulary. The
    // registry must serve indexes of the LIVE generation, not the
    // cached build of the superseded one.
    st.commitVersioned("documents", Seq(
      (1L, "delta epsilon", "s0")).toDF("doc_id", "text", "source"))
    assert(Indexes.corpusEpoch(spark, root) === 2L)
    val words2 = Indexes.termFrequencies(spark, root)
      .collect().map(_.getString(1)).toSet
    assert(words2 === Set("delta", "epsilon"),
      "registry served a stale generation's index")
    // The driver-side merge-table cache is epoch-keyed too: the same
    // call now trains on the gen-2 vocabulary ((d, e) is its
    // lexicographic all-ties winner), not the memoized gen-1 table.
    assert(Indexes.bpeMerges(spark, root, 1) === Seq(("d", "e")))
    // A versioned corpus keeps its derived indexes CO-LOCATED with the
    // data — the registry survives with the corpus, not the process.
    assert(new java.io.File(s"$root/_indexes").isDirectory,
      "versioned corpus indexes must land under <corpus>/_indexes")
  }

  test("registry persists across independent consumers without a rebuild") {
    import spark.implicits._
    val reg = java.nio.file.Files.createTempDirectory("graft_reg").toString
    val corpus = java.nio.file.Files.createTempDirectory("graft_raw_corpus").toString
    Seq((1L, "alpha beta gamma delta", "s0"), (2L, "alpha beta gamma epsilon", "s0"),
        (3L, "alpha beta gamma delta", "s1"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$corpus/documents.parquet")
    val prev = sys.props.get("graft.index.root")
    try {
      sys.props("graft.index.root") = reg
      def listing: Seq[(String, Long)] = {
        def rec(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(rec)
          else Seq(f)
        rec(new java.io.File(reg)).map(f => f.getPath -> f.lastModified).sortBy(_._1)
      }
      val first = Indexes.signatures(spark, corpus)
        .collect().map(_.toString).sorted.toSeq
      val published = listing
      assert(published.nonEmpty, "build published nothing into the registry root")
      // A second consumer: the registry holds no in-process table
      // state, so this call resolves purely through the filesystem —
      // the exact path a fresh JVM (second process, restarted cluster)
      // takes. The published files must be byte-untouched: reuse, not
      // a silent rebuild.
      val again = Indexes.signatures(spark, corpus)
        .collect().map(_.toString).sorted.toSeq
      assert(listing === published,
        "second consumer rebuilt instead of reusing the published table")
      assert(again === first)
    } finally prev match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root": Unit
    }
  }

  test("a crashed partial publish (no _SUCCESS) is repaired, never nested into") {
    // The rename-race fix's observable contract: a dst directory
    // without `_SUCCESS` is a crashed process's garbage — the next
    // builder must REMOVE it and publish fresh (renaming onto an
    // existing directory would nest the new table inside the partial,
    // doubling rows under recursive listing), and junk part files
    // must not survive into the published table.
    import spark.implicits._
    val reg = java.nio.file.Files.createTempDirectory("graft_reg_race").toString
    val corpus = java.nio.file.Files.createTempDirectory("graft_raw_race").toString
    Seq((1L, "alpha beta gamma delta", "s0"), (2L, "alpha beta gamma epsilon", "s0"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$corpus/documents.parquet")
    val prev = sys.props.get("graft.index.root")
    try {
      sys.props("graft.index.root") = reg
      val first = Indexes.signatures(spark, corpus)
        .collect().map(_.toString).sorted.toSeq
      def rec(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(rec) :+ f
        else Seq(f)
      val dst = rec(new java.io.File(reg))
        .find(f => f.isDirectory && f.getName == "minhash_sigs")
        .getOrElse(fail("published minhash_sigs not found in registry root"))
      // Simulate the crash: success marker gone, a junk part file left.
      assert(new java.io.File(dst, "_SUCCESS").delete())
      java.nio.file.Files.writeString(
        new java.io.File(dst, "part-99999-garbage.parquet").toPath, "not parquet")
      val again = Indexes.signatures(spark, corpus)
        .collect().map(_.toString).sorted.toSeq
      assert(again === first, "repair must rebuild the identical table")
      assert(new java.io.File(dst, "_SUCCESS").exists, "repair must republish complete")
      assert(!new java.io.File(dst, "part-99999-garbage.parquet").exists,
        "crashed partial's junk part file survived the repair")
      assert(!new java.io.File(dst, "minhash_sigs").exists,
        "repair nested the new table inside the partial")
    } finally prev match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root": Unit
    }
  }

  test("PQ codes round-trip the inline train+encode bit-exactly") {
    val e = graft.io.Sources.table(spark, sf, "embeddings")
    val inlineCbs = Similarity.pqTrainCodebooks(e, dim = 64, m = 4,
      kPerSub = 4, iters = 2)
    assert(Indexes.pqCodebooks(spark, sf).map(_.map(_.toSeq)) ===
      inlineCbs.map(_.map(_.toSeq)))
    val inlineCodes = Similarity.pqEncode(e, inlineCbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val fromIndex = Indexes.pqCodes(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fromIndex === inlineCodes)
  }
}
