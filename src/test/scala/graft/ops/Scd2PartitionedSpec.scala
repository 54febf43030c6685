package graft.ops

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.TableStore

/** Partition-scoped SCD2 (SURVEY.md §4.3's production variant of K4):
  * the bucketed merge must produce EXACTLY the snapshot the full
  * [[Scd2.merge]] produces, while physically rewriting only the
  * buckets whose keys changed — untouched leaves stay byte-identical
  * and the scoped dim scan is partition-pruned. */
class Scd2PartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val INF = Timestamp.valueOf("9999-12-31 00:00:00")
  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-02-01 00:00:00")
  private val N = 8

  private def newStore() =
    new TableStore(spark, Files.createTempDirectory("graft_scd2p").toString)

  /** 40 keys spread over the buckets, all open 'N' versions at t0. */
  private def day1: DataFrame =
    (1 to 40).map(i => (s"k$i", s"v$i")).toDF("k", "a")

  private def snapshot(df: DataFrame): Set[(String, String, Timestamp, Timestamp, String)] =
    df.select("k", "a", "effective_from", "effective_to", "deleted_flg")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getString(4))).toSet

  private def leafFiles(store: TableStore, table: String): Map[String, Vector[Byte]] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(store.path(table))
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString ->
        java.nio.file.Files.readAllBytes(p).toVector)
      .toMap
  }

  test("bucketed merge == full merge; untouched buckets byte-identical") {
    val store = newStore()
    val booted = Scd2.mergePartitioned(store, "dim", day1,
      Seq("k"), Seq("a"), lit(t0), nBuckets = N,
      deleteKeys = Some(day1.select("k")))
    assert(booted.nonEmpty)

    // Day 2: one changed key, one new key, one deleted key — plus 37
    // unchanged keys that must NOT trigger any rewrite of their
    // buckets (unless they share a bucket with a dirty key).
    val batch2 = day1.filter($"k" =!= "k7")
      .withColumn("a", when($"k" === "k3", lit("CHANGED")).otherwise($"a"))
      .union(Seq(("k99", "new")).toDF("k", "a"))
    val snap2 = batch2.select("k")

    val filesBefore = leafFiles(store, "dim")
    val rewritten = Scd2.mergePartitioned(store, "dim", batch2,
      Seq("k"), Seq("a"), lit(t1), nBuckets = N,
      deleteKeys = Some(snap2), deleteTs = Some(lit(t1)))

    // Only the buckets of the three dirty keys get rewritten.
    val dirtyBuckets = Seq("k3", "k7", "k99").toDF("k")
      .select(Scd2.bucketCol(Seq("k"), N).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(rewritten === dirtyBuckets)

    // Untouched leaves: same files, same bytes.
    val filesAfter = leafFiles(store, "dim")
    val keep = (0 until N).filterNot(dirtyBuckets.contains)
    keep.foreach { b =>
      val pre = filesBefore.filter(_._1.startsWith(s"kb=$b/"))
      val post = filesAfter.filter(_._1.startsWith(s"kb=$b/"))
      assert(pre.nonEmpty && pre === post, s"bucket $b was rewritten")
    }

    // Logical parity with the one-shot full merge of the same batch.
    val dim1 = day1.select($"k", $"a",
      lit(t0).as("effective_from"), lit(INF).as("effective_to"),
      lit("N").as("deleted_flg"))
    val expected = snapshot(Scd2.merge(dim1, batch2, Seq("k"), Seq("a"),
      lit(t1), deleteKeys = Some(snap2), deleteTs = Some(lit(t1))))
    assert(snapshot(store.read("dim")) === expected)
  }

  test("clean replay is a physical no-op: zero buckets rewritten") {
    val store = newStore()
    Scd2.mergePartitioned(store, "dim", day1, Seq("k"), Seq("a"), lit(t0),
      nBuckets = N, deleteKeys = Some(day1.select("k")))
    val before = leafFiles(store, "dim")
    val rewritten = Scd2.mergePartitioned(store, "dim", day1,
      Seq("k"), Seq("a"), lit(t1), deleteKeys = Some(day1.select("k")),
      nBuckets = N)
    assert(rewritten.isEmpty)
    assert(leafFiles(store, "dim") === before)
  }

  test("majority-dirty merge takes the full-rewrite path, keeps layout and content") {
    val store = newStore()
    Scd2.mergePartitioned(store, "dim", day1, Seq("k"), Seq("a"), lit(t0),
      nBuckets = N, deleteKeys = Some(day1.select("k")))
    // Change EVERY key: all buckets dirty → the scoped path would
    // rewrite every leaf anyway, so the implementation must fall back
    // to the whole-directory swap — same content, still kb-partitioned.
    val batch2 = day1.withColumn("a", concat(col("a"), lit("!")))
    val rewritten = Scd2.mergePartitioned(store, "dim", batch2,
      Seq("k"), Seq("a"), lit(t1), nBuckets = N,
      deleteKeys = Some(batch2.select("k")), deleteTs = Some(lit(t1)))
    assert(rewritten.nonEmpty && rewritten.size * 2 > N)
    val dim1 = day1.select($"k", $"a",
      lit(t0).as("effective_from"), lit(INF).as("effective_to"),
      lit("N").as("deleted_flg"))
    val expected = snapshot(Scd2.merge(dim1, batch2, Seq("k"), Seq("a"),
      lit(t1), deleteKeys = Some(batch2.select("k")), deleteTs = Some(lit(t1))))
    assert(snapshot(store.read("dim")) === expected)
    // Layout survives: kb= leaves on disk, no scratch dirs left behind.
    val leaves = new java.io.File(store.path("dim")).listFiles().map(_.getName)
    assert(leaves.exists(_.startsWith(Scd2.BucketColName + "=")))
    assert(!store.exists("dim.__tmp") && !store.exists("dim.__old"))
  }

  test("2^12 buckets, 1% dirty batch: pruned scan, rename set = dirty buckets, bounded In-list") {
    // The realistic operating point of the scaladoc's sizing rule
    // (2^10–2^14): 4096 buckets, 8192 keys, a batch touching 1% of
    // them. Everything the toy-scale tests pin must hold where the
    // partition count is real: the dirty set (and therefore the
    // isin partition-pruning literal AND the rename count) stays
    // ~batch-sized, and the scoped scan reads only affected leaves.
    val B = 4096
    val nKeys = 8192
    val store = newStore()
    val day = (1 to nKeys).map(i => (s"k$i", s"v$i")).toDF("k", "a")
    Scd2.mergePartitioned(store, "dim", day, Seq("k"), Seq("a"), lit(t0),
      nBuckets = B, deleteKeys = Some(day.select("k")))
    val totalFiles = store.read("dim").inputFiles.length

    val dirtyKeys = (1 to nKeys).filter(_ % 100 == 0).map(i => s"k$i")
    val batch2 = day.withColumn("a",
      when(col("k").isin(dirtyKeys: _*), lit("CHANGED")).otherwise(col("a")))
    val rewritten = Scd2.mergePartitioned(store, "dim", batch2,
      Seq("k"), Seq("a"), lit(t1), nBuckets = B,
      deleteKeys = Some(batch2.select("k")), deleteTs = Some(lit(t1)))

    // (c) The In-list the scoped scan carries is bounded by the dirty
    // KEY count — two orders of magnitude under nBuckets — never a
    // B-sized literal.
    val expectedDirty = dirtyKeys.toDF("k")
      .select(Scd2.bucketCol(Seq("k"), B).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(rewritten === expectedDirty)
    assert(rewritten.size <= dirtyKeys.size && rewritten.size * 20 < B,
      s"${rewritten.size} buckets dirty of $B")

    // (a) Partition pruning holds at this leaf count: the scoped scan
    // READS only the affected buckets' files. (`inputFiles` reports
    // the relation's full listing regardless of filters — the scan
    // node's numFiles metric is what pruning actually decides.)
    val pruned = store.read("dim")
      .filter(col(Scd2.BucketColName).isin(rewritten: _*))
    val qe = pruned.queryExecution
    qe.toRdd.count(): Unit
    val scannedFiles = qe.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(scannedFiles > 0 && scannedFiles <= rewritten.size.toLong * 3,
      s"$scannedFiles files scanned for ${rewritten.size} buckets")
    assert(totalFiles >= B / 2, s"boot wrote only $totalFiles files")
    assert(scannedFiles * 5 < totalFiles,
      s"pruning ineffective: $scannedFiles of $totalFiles files")

    // (b) Rename count = dirty buckets: untouched leaves carry their
    // original files (same path set — a rename-in would change leaf
    // contents); spot-check a sample rather than walking all 4096.
    val root = java.nio.file.Paths.get(store.path("dim"))
    val untouchedSample = (0 until B).filterNot(rewritten.contains).take(24)
    untouchedSample.foreach { b =>
      val leaf = root.resolve(s"${Scd2.BucketColName}=$b")
      if (java.nio.file.Files.exists(leaf)) {
        val names = java.nio.file.Files.list(leaf).iterator()
        var sawParquet = false
        while (names.hasNext) {
          val n = names.next().getFileName.toString
          assert(!n.startsWith(".__"), s"scratch residue in untouched leaf $b")
          sawParquet |= n.endsWith(".parquet")
        }
        assert(sawParquet, s"untouched leaf $b lost its data file")
      }
    }
    // Merged content spot-check: a dirty key gained its closed+opened
    // version pair; a clean neighbor did not.
    val k100 = store.read("dim").filter(col("k") === "k100")
    assert(k100.count() === 2L)
    val k101 = store.read("dim").filter(col("k") === "k101")
    assert(k101.count() === 1L)
  }

  test("the scoped dim scan is partition-pruned") {
    val store = newStore()
    Scd2.mergePartitioned(store, "dim", day1, Seq("k"), Seq("a"), lit(t0),
      nBuckets = N)
    val pruned = store.read("dim").filter(col(Scd2.BucketColName).isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no pruning in:\n${plan.take(1200)}")
    assert(plan.contains("kb"), s"kb not in partition filters:\n${plan.take(1200)}")
  }
}
