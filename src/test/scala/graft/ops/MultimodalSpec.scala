package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Multimodal.{BmpCodec, FakeCodec, MediaRow, WavPcmCodec}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(rows: (Long, String)*): Seq[MediaRow] =
    rows.map { case (id, s) =>
      MediaRow(id, "image/fake", s.getBytes("UTF-8"), s.length.toLong)
    }

  test("FakeCodec: deterministic, normalized to [0,1]; poolModulo fixes the dim") {
    val c = new FakeCodec
    val a = c.decode("some media bytes here".getBytes)
    val b = c.decode("some media bytes here".getBytes)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 21) // raw signal: one intensity per byte
    assert(a.forall(v => v >= 0f && v <= 1f))
    val pooled = Multimodal.poolModulo(a, 8)
    assert(pooled.length === 8)
    assert(Multimodal.poolModulo(Array.emptyFloatArray, 8).toSeq === Seq.fill(8)(0f))
  }

  /** Serialize known PCM samples into real WAV container bytes — an
    * independent writer path (java.nio, little-endian) so the decode
    * assertion is against the format spec, not the codec's own code. */
  private def wavBytes(samples: Array[Short], channels: Short = 1,
                       sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  test("WavPcmCodec decodes a real WAV fixture bit-exactly") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 1)
    val got = new WavPcmCodec().decode(wavBytes(samples))
    assert(got.toSeq === samples.map(_ / 32768f).toSeq)
    // Malformed input fails loudly, never embeds garbage.
    intercept[IllegalArgumentException] {
      new WavPcmCodec().decode("not a wav".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      new WavPcmCodec().decode(wavBytes(samples).dropRight(4))
    }
  }

  /** 24bpp BMP writer (bottom-up rows, 4-byte row padding): pixels are
    * (r, g, b) triples in top-down row-major order. */
  private def bmpBytes(width: Int, height: Int,
                       px: Seq[(Int, Int, Int)]): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * height)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (y <- height - 1 to 0 by -1) { // stored bottom-up
      for (x <- 0 until width) {
        val (r, g, b) = px(y * width + x)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- 0 until rowSize - 3 * width) buf.put(0.toByte)
    }
    buf.array()
  }

  test("BmpCodec decodes a real 24bpp fixture: padding, row order, exact grays") {
    // 2x2: white, black / pure red, mid-gray. Width 2 → 6 data bytes
    // per row + 2 pad bytes, so padding handling is exercised.
    val img = bmpBytes(2, 2, Seq((255, 255, 255), (0, 0, 0), (255, 0, 0), (100, 100, 100)))
    val got = new BmpCodec().decode(img)
    // Integer Rec.601 weights: gray = (299r + 587g + 114b) / 255000.
    assert(got.toSeq === Seq(1f, 0f, 299f * 255 / 255000f, 100 * 1000 / 255000f))
    intercept[IllegalArgumentException] {
      new BmpCodec().decode("BMnot really".getBytes)
    }
  }

  test("extractFeatures: schema, values, and per-row metadata") {
    val ds = media((1L, "hello world media blob"), (2L, "x")).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq === Seq(1L, 2L))
    assert(out.head.n_bytes === 22L)
    assert(out.head.codec === "fake-codec")
    assert(out.head.embedding.toSeq === Multimodal.poolModulo(
      new FakeCodec().decode("hello world media blob".getBytes), 4).toSeq)
  }

  test("extractFeatures runs REAL media bytes through the partition-batched path") {
    val samples = Array[Short](1000, -1000, 2000, -2000, 3000, -3000)
    val wav = wavBytes(samples)
    val rows = (1L to 4L).map(i => MediaRow(i, "audio/wav", wav, 100L))
    val out = Multimodal.extractFeatures(rows.toDS(), dim = 3,
      mkCodec = () => new WavPcmCodec).collect().sortBy(_.doc_id)
    assert(out.length === 4)
    assert(out.forall(_.codec === "wav-pcm"))
    assert(out.forall(_.n_bytes === wav.length.toLong))
    val expected = Multimodal.poolModulo(samples.map(_ / 32768f), 3).toSeq
    assert(out.forall(_.embedding.toSeq === expected))
  }

  test("extractFeatures initializes the codec once per partition, not per row") {
    // 8 rows in 2 partitions; count inits via an accumulator inside the
    // partition function (the per-partition shape is the contract).
    val acc = spark.sparkContext.longAccumulator("codecInits")
    val ds = media((1L to 8L).map(i => (i, s"blob $i")): _*).toDS().repartition(2)
    ds.mapPartitions { rows =>
      val codec = new FakeCodec().init()
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
