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
