package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(rows: (Long, String)*): Seq[MediaRow] =
    rows.map { case (id, s) =>
      MediaRow(id, "image/fake", s.getBytes("UTF-8"), s.length.toLong)
    }

  test("FakeCodec: deterministic, dim-sized, normalized to [0,1]") {
    val c = new FakeCodec(8)
    val a = c.decode("some media bytes here".getBytes)
    val b = c.decode("some media bytes here".getBytes)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
    assert(a.forall(v => v >= 0f && v <= 1f))
    assert(c.decode(Array.emptyByteArray).toSeq === Seq.fill(8)(0f))
  }

  test("extractFeatures: schema, values, and per-row metadata") {
    val ds = media((1L, "hello world media blob"), (2L, "x")).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq === Seq(1L, 2L))
    assert(out.head.n_bytes === 22L)
    assert(out.head.codec === "fake-codec-4")
    assert(out.head.embedding.toSeq ===
      new FakeCodec(4).decode("hello world media blob".getBytes).toSeq)
  }

  test("extractFeatures initializes the codec once per partition, not per row") {
    // 8 rows in 2 partitions; count inits via an accumulator inside the
    // partition function (the per-partition shape is the contract).
    val acc = spark.sparkContext.longAccumulator("codecInits")
    val ds = media((1L to 8L).map(i => (i, s"blob $i")): _*).toDS().repartition(2)
    ds.mapPartitions { rows =>
      val codec = new FakeCodec(4).init()
      acc.add(codec.initCount)
      rows.map(m => codec.decode(m.content).length)
    }.collect()
    assert(acc.value === 2L)
  }

  test("sampleFrames: one row per tick, frames are bounded byte slices") {
    val df = Seq((1L, "video/fake", "abcdefghij".getBytes, 250L))
      .toDF("doc_id", "media_type", "content", "duration_ms")
    val out = Multimodal.sampleFrames(df, everyMs = 100L, frameBytes = 4)
      .orderBy("frame_ms").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 100L, 200L))
    // tick 0 → offset 0%10+1=1 → "abcd"; tick 100 → 100%10+1=1 → "abcd";
    // tick 200 → 200%10+1=1 → "abcd" (slices wrap deterministically)
    assert(out.forall(r => new String(r.getAs[Array[Byte]](3)) === "abcd"))
    val out2 = Multimodal.sampleFrames(
      Seq((2L, "video/fake", "abcdefghij".getBytes, 130L))
        .toDF("doc_id", "media_type", "content", "duration_ms"),
      everyMs = 33L, frameBytes = 4).orderBy("frame_ms").collect()
    // 33%10+1=4 → "defg"
    assert(new String(out2(1).getAs[Array[Byte]](3)) === "defg")
  }

  test("resizeMeta: downscale preserves aspect, never upscales") {
    val df = Seq((1L, 4000, 3000), (2L, 640, 480)).toDF("doc_id", "width", "height")
    val out = Multimodal.resizeMeta(df, maxW = 1024, maxH = 1024)
      .orderBy("doc_id")
      .select("out_width", "out_height", "resize_applied").collect()
    assert((out(0).getInt(0), out(0).getInt(1), out(0).getBoolean(2)) === ((1024, 768, true)))
    assert((out(1).getInt(0), out(1).getInt(1), out(1).getBoolean(2)) === ((640, 480, false)))
  }
}
