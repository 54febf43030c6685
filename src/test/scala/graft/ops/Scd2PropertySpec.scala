package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ScalaCheck invariants for the SCD2 merge (SURVEY.md §5.2 item 4):
  * under random update sequences,
  *   (a) every key has exactly one open (effective_to = infinity) version;
  *   (b) version intervals per key are disjoint and ordered;
  *   (c) replaying the last batch is a no-op (idempotence);
  *   (d) delete then reappear yields a 'Y' marker then a fresh 'N' version.
  */
class Scd2PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val INF = Timestamp.valueOf("9999-12-31 00:00:00")
  private def dayTs(i: Int) = new Timestamp(
    Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 86400000L)

  private val keyUniverse = Vector("k0", "k1", "k2", "k3", "k4")
  private val values = Vector("a", "b", "c", null)

  /** One batch: a subset of keys with random values; the delete
    * snapshot is exactly the batch's key set, so omitted keys are
    * delete-detected. */
  private case class Batch(rows: Map[String, String])
  private val genBatch: Gen[Batch] = for {
    keys <- Gen.someOf(keyUniverse)
    vals <- Gen.listOfN(keys.size, Gen.oneOf(values))
  } yield Batch(keys.zip(vals).toMap)

  private val genSeq: Gen[List[Batch]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genBatch))

  private def emptyDim: DataFrame =
    Seq.empty[(String, String, Timestamp, Timestamp, String)]
      .toDF("k", "a", "effective_from", "effective_to", "deleted_flg")

  private def applyBatch(dim: DataFrame, b: Batch, i: Int): DataFrame =
    Scd2.merge(dim, b.rows.toSeq.toDF("k", "a"), Seq("k"), Seq("a"),
      lit(dayTs(i + 1)), deleteKeys = Some(b.rows.keys.toSeq.toDF("k")))

  private def rows(df: DataFrame): Seq[(String, String, Timestamp, Timestamp, String)] =
    df.collect().toSeq.map(r => (r.getString(0), r.getString(1),
      r.getTimestamp(2), r.getTimestamp(3), r.getString(4)))

  private def invariants(snap: Seq[(String, String, Timestamp, Timestamp, String)]): Prop = {
    val perKey = snap.groupBy(_._1)
    val oneOpen = Prop(perKey.values.forall(_.count(_._4 == INF) == 1)) :|
      s"one open version per key, got ${perKey.view.mapValues(_.count(_._4 == INF)).toMap}"
    val disjoint = Prop(perKey.values.forall { vs =>
      val sorted = vs.sortBy(_._3.getTime)
      sorted.zip(sorted.tail).forall { case (prev, next) =>
        prev._4.getTime < next._3.getTime && prev._3.getTime <= prev._4.getTime
      }
    }) :| "intervals disjoint and ordered"
    oneOpen && disjoint
  }

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("invariants hold under random update sequences; replay is a no-op") {
    check(Prop.forAll(genSeq) { batches =>
      val finalDim = batches.zipWithIndex
        .foldLeft(emptyDim) { case (d, (b, i)) => applyBatch(d, b, i) }
      val snap = rows(finalDim)
      val replayed = rows(applyBatch(finalDim, batches.last, batches.size - 1))
      invariants(snap) &&
        (Prop(snap.groupBy(identity).view.mapValues(_.size).toMap ==
          replayed.groupBy(identity).view.mapValues(_.size).toMap) :| "replay no-op")
    })
  }

  test("fromChangeLog invariants: versions tile the timeline, one open per key") {
    val genLog: Gen[List[(String, String, Int)]] = for {
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf(keyUniverse)
        v <- Gen.oneOf(values.filter(_ != null))
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, v, i) }

    check(Prop.forAll(genLog) { log =>
      val df = log.map { case (k, v, i) => (k, v, dayTs(i), i.toLong) }
        .toDF("k", "v", "ts", "seq")
      val hist = Scd2.fromChangeLog(df, Seq("k"), Seq("v"), "ts", col("seq"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3)))
      val perKey = hist.groupBy(_._1)
      val oneOpen = Prop(perKey.values.forall(_.count(_._4 == INF) == 1)) :| "one open"
      val tiled = Prop(perKey.values.forall { vs =>
        val sorted = vs.sortBy(_._3.getTime)
        sorted.zip(sorted.tail).forall { case (prev, next) =>
          // closed exactly one second before the successor opens
          prev._4.getTime == next._3.getTime - 1000L
        }
      }) :| "versions tile with 1s closure"
      val collapsed = Prop(perKey.values.forall { vs =>
        val sorted = vs.sortBy(_._3.getTime)
        sorted.zip(sorted.tail).forall { case (prev, next) => prev._2 != next._2 }
      }) :| "no consecutive duplicate versions"
      oneOpen && tiled && collapsed
    })
  }

  test("cross-validation: folding merge over per-tick batches equals fromChangeLog") {
    // Two independent implementations of SCD2 version history — the
    // incremental full-outer merge and the windowed change-log builder
    // — must derive identical snapshots from the same observation
    // sequence (no deletes involved).
    val genLog: Gen[List[(String, String, Int)]] = for {
      n <- Gen.choose(1, 10)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf(keyUniverse.take(3))
        v <- Gen.oneOf(values.filter(_ != null))
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, v, i) }

    check(Prop.forAll(genLog) { log =>
      val folded = log.foldLeft(emptyDim) { case (dim, (k, v, i)) =>
        Scd2.merge(dim, Seq((k, v)).toDF("k", "a"), Seq("k"), Seq("a"),
          lit(dayTs(i)))
      }
      val viaMerge = rows(folded).map(t => (t._1, t._2, t._3, t._4)).toSet
      val viaLog = Scd2.fromChangeLog(
          log.map { case (k, v, i) => (k, v, dayTs(i), i.toLong) }
            .toDF("k", "a", "ts", "seq"),
          Seq("k"), Seq("a"), "ts", col("seq"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSet
      Prop(viaMerge == viaLog) :|
        s"merge-fold $viaMerge != change-log $viaLog"
    })
  }

  test("delete then reappear: 'Y' marker then fresh 'N' version") {
    val d0 = applyBatch(emptyDim, Batch(Map("k0" -> "v")), 0)
    val d1 = applyBatch(d0, Batch(Map.empty), 1) // k0 vanishes
    val d2 = applyBatch(d1, Batch(Map("k0" -> "v2")), 2) // and returns
    val hist = rows(d2).sortBy(_._3.getTime)
    assert(hist.map(t => (t._2, t._5)) ===
      Seq(("v", "N"), ("v", "Y"), ("v2", "N")))
    assert(hist.last._4 === INF)
    check(invariants(rows(d2)))
  }
}
