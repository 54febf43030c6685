package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packSequences lays documents head-to-tail with spill across sequences") {
    // Capacity 10; group g: docs of 4, 5, 3, 10, 2 tokens in id order.
    // Prefix starts: 0, 4, 9, 12, 22 → seqs 0,0,0,1,2; offsets 0,4,9,2,2.
    val df = Seq((1L, "g", 4L), (2L, "g", 5L), (3L, "g", 3L),
      (4L, "g", 10L), (5L, "g", 2L)).toDF("id", "grp", "n")
    val got = Packing.packSequences(df, "grp", "id", col("n"), capacity = 10)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 9L),
      (4L, 1L, 2L), (5L, 2L, 2L)))
  }

  test("packSequences packs each group independently") {
    val df = Seq((1L, "a", 6L), (2L, "a", 6L), (3L, "b", 6L)).toDF("id", "grp", "n")
    val got = Packing.packSequences(df, "grp", "id", col("n"), capacity = 8)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off"))).toSet
    // Group a: starts 0, 6 → seq 0 off 0, seq 0 off 6; group b restarts at 0.
    assert(got === Set((1L, 0L, 0L), (2L, 0L, 6L), (3L, 0L, 0L)))
  }

  test("packing invariants hold across random-ish corpora") {
    // Deterministic pseudo-random doc sizes; invariants: seq_off in
    // [0, cap); seq_id·cap + seq_off == the exact prefix sum; the
    // layout is gapless (next start = prev start + prev n_tok).
    val cap = 37
    val df = (1L to 500L).map(i => (i, s"g${i % 3}", (i * 7919 % 93) + 1))
      .toDF("id", "grp", "n")
    val got = Packing.packSequences(df, "grp", "id", col("n"), cap)
      .select("grp", "id", "n_tok", "seq_id", "seq_off")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.forall { case (_, _, _, _, off) => off >= 0 && off < cap })
    got.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var expectStart = 0L
      ordered.foreach { case (_, id, n, seqId, off) =>
        assert(seqId * cap + off === expectStart,
          s"doc $id: seq_id=$seqId off=$off expected start $expectStart")
        expectStart += n
      }
    }
  }

  test("packSequences rejects a non-positive capacity") {
    val df = Seq((1L, "g", 1L)).toDF("id", "grp", "n")
    intercept[IllegalArgumentException] {
      Packing.packSequences(df, "grp", "id", col("n"), capacity = 0)
    }
  }
}
