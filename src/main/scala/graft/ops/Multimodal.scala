package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media travels as an opaque `binary` column plus typed metadata
  * (width/height/sample_rate/duration), and the engine provides the
  * *plumbing* — schema, partition-wise batch decode, frame sampling,
  * metadata-aware resize — with the codec itself pluggable behind
  * [[MediaCodec]].
  *
  * Five REAL pure-JVM decoders ship with the engine — [[WavPcmCodec]]
  * (RIFF/WAVE PCM audio), [[BmpCodec]] (uncompressed 24-bit BMP
  * images), [[PngCodec]] (zlib-compressed PNG via the JDK's
  * `Inflater`, full row-filter reconstruction, CRC-validated),
  * [[GifCodec]] (GIF87a/89a with the LZW decompressor implemented
  * in-engine), and [[JpegCodec]] (lossy JPEG through the JDK's
  * bundled ImageIO reader) — raw-samples-behind-a-header, real
  * compressed, and real LOSSY formats all run through the codec
  * boundary. For formats the JDK ships no codec or primitives for
  * (MP3/H.264) the deterministic [[FakeCodec]] stands in (no media
  * library exists in this environment); swap in a real binding
  * through the same interface. Everything around the
  * codec is the part that matters at 100 TB:
  *   - [[extractFeatures]] uses `mapPartitions` so the codec is
  *     initialized ONCE per partition and amortized across its rows —
  *     the same execution shape as a Python `mapInPandas` batch UDF,
  *     and the only justified `mapPartitions` use in this engine
  *     (imperative per-batch resource management, SURVEY.md §2.11);
  *   - [[sampleFrames]] is pure Catalyst (`sequence` + `explode` +
  *     binary `substring`) — frame index generation never leaves
  *     codegen, and the exploded rows carry byte slices, not copies of
  *     the whole blob;
  *   - [[resizeMeta]] shows metadata-aware transforms staying columnar.
  *
  * Media frame contract: `doc_id` (long), `media_type` (string),
  * `content` (binary), `duration_ms` (long).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
                            content: Array[Byte], duration_ms: Long)
  final case class FeatureRow(doc_id: Long, embedding: Array[Float],
                              n_bytes: Long, codec: String)

  /** The pluggable byte→signal boundary. `decode` returns the RAW
    * decoded signal — audio samples in [-1, 1], pixel intensities in
    * [0, 1] — and the engine owns featurization ([[poolModulo]]):
    * codecs stay format-only, features stay codec-agnostic. `init()`
    * models resource acquisition (real codecs are expensive to
    * construct; [[extractFeatures]] calls it once per partition).
    * Malformed input fails loudly — a corrupt blob should surface,
    * not silently embed as garbage. */
  trait MediaCodec extends Serializable {
    def name: String
    def init(): MediaCodec
    def decode(content: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in for decoders of COMPRESSED formats
    * (REPLACE IN PRODUCTION with a real binding): "decodes" bytes to
    * normalized [0, 1] intensities, one per byte. Deliberately cheap,
    * pure, and platform-independent so tests pin the plumbing, not
    * the codec. */
  final class FakeCodec extends MediaCodec {
    val name: String = "fake-codec"
    var initCount = 0 // test hook: proves per-partition (not per-row) init
    def init(): FakeCodec = { initCount += 1; this }
    def decode(content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](content.length)
      var i = 0
      while (i < content.length) { out(i) = (content(i) & 0xff) / 255f; i += 1 }
      out
    }
  }

  /** Real audio decode, zero libraries: RIFF/WAVE container with a
    * PCM (`fmt ` audio format 1) chunk, 8-bit unsigned or 16-bit
    * signed little-endian samples, any channel count (interleaved as
    * stored). Output: samples normalized to [-1, 1]. */
  final class WavPcmCodec extends MediaCodec {
    val name: String = "wav-pcm"
    def init(): WavPcmCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      def ascii(off: Int) = new String(content, off, 4, "US-ASCII")
      require(content.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
        "wav-pcm: not a RIFF/WAVE stream")
      val buf = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var bits = -1
      var out: Array[Float] = null
      var pos = 12
      while (pos + 8 <= content.length && out == null) {
        val id = ascii(pos)
        val size = buf.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size <= content.length,
          s"wav-pcm: chunk '$id' overruns the stream")
        id match {
          case "fmt " =>
            // A PCM fmt chunk is >= 16 bytes; reading fields from a
            // shorter (corrupt/truncated) one would read bytes
            // belonging to the NEXT chunk instead of failing loudly.
            require(size >= 16, "wav-pcm: fmt chunk too small")
            require(buf.getShort(pos + 8) == 1,
              "wav-pcm: only PCM (format 1) is supported")
            bits = buf.getShort(pos + 22).toInt
            require(bits == 8 || bits == 16, s"wav-pcm: unsupported $bits-bit samples")
          case "data" =>
            require(bits > 0, "wav-pcm: 'data' chunk before 'fmt '")
            if (bits == 16) {
              val n = size / 2
              val samples = new Array[Float](n)
              var i = 0
              while (i < n) { samples(i) = buf.getShort(pos + 8 + 2 * i) / 32768f; i += 1 }
              out = samples
            } else {
              val samples = new Array[Float](size)
              var i = 0
              while (i < size) {
                samples(i) = ((content(pos + 8 + i) & 0xff) - 128) / 128f; i += 1
              }
              out = samples
            }
          case _ => // LIST/INFO/cue chunks: skip
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(out != null, "wav-pcm: no 'data' chunk")
      out
    }
  }

  /** IMA ADPCM quantizer step table (89 steps) — the public tables
    * from the IMA Digital Audio Pack / Microsoft WAVE format 0x11
    * spec (same tables as RFC 3551's DVI4 payload). Shared by the
    * encoder and decoder; both sides MUST reconstruct identically or
    * the prediction loops diverge. */
  private val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA ADPCM index-adjust table, indexed by the 4-bit code. */
  private val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One step of the shared IMA reconstruction: returns the new
    * predictor for code `delta` at step-table position `index`.
    * vpdiff = step/8 + (bit2)step + (bit1)step/2 + (bit0)step/4,
    * sign from bit3 — exact integer arithmetic per the public spec. */
  private def adpcmReconstruct(predictor: Int, index: Int, delta: Int): Int = {
    val step = AdpcmStepTable(index)
    var vpdiff = step >> 3
    if ((delta & 4) != 0) vpdiff += step
    if ((delta & 2) != 0) vpdiff += step >> 1
    if ((delta & 1) != 0) vpdiff += step >> 2
    val p = if ((delta & 8) != 0) predictor - vpdiff else predictor + vpdiff
    math.max(-32768, math.min(32767, p))
  }

  private def adpcmNextIndex(index: Int, delta: Int): Int =
    math.max(0, math.min(88, index + AdpcmIndexTable(delta & 15)))

  /** Real LOSSY audio decode, zero libraries: RIFF/WAVE containing
    * IMA ADPCM (`fmt ` audio format 0x11, mono, 4-bit) — the lossy
    * leg of the audio codec matrix (the JPEG analogue: 4:1
    * compression from adaptive delta quantization, so decoded
    * samples drift within the quantizer's error, never
    * bit-identically). Block layout per the public spec: a 4-byte
    * header (int16 first sample, uint8 step index, reserved byte)
    * then two 4-bit codes per byte, low nibble first. The `fact`
    * chunk's sample count truncates the final block (clips are not
    * block-multiples). Output: samples normalized to [-1, 1]. */
  final class AdpcmImaCodec extends MediaCodec {
    val name: String = "wav-adpcm-ima"
    def init(): AdpcmImaCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      def ascii(off: Int) = new String(content, off, 4, "US-ASCII")
      require(content.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
        "wav-adpcm-ima: not a RIFF/WAVE stream")
      val buf = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var blockAlign = -1
      var nSamples = -1
      var out: Array[Float] = null
      var pos = 12
      while (pos + 8 <= content.length && out == null) {
        val id = ascii(pos)
        val size = buf.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size <= content.length,
          s"wav-adpcm-ima: chunk '$id' overruns the stream")
        id match {
          case "fmt " =>
            require(size >= 16, "wav-adpcm-ima: fmt chunk too small")
            require(buf.getShort(pos + 8) == 0x11,
              "wav-adpcm-ima: only IMA ADPCM (format 0x11) is supported")
            require(buf.getShort(pos + 10) == 1,
              "wav-adpcm-ima: only mono is supported")
            require(buf.getShort(pos + 22) == 4,
              "wav-adpcm-ima: only 4-bit codes are supported")
            blockAlign = buf.getShort(pos + 20).toInt
            require(blockAlign > 4, s"wav-adpcm-ima: blockAlign=$blockAlign")
          case "fact" =>
            require(size >= 4, "wav-adpcm-ima: fact chunk too small")
            nSamples = buf.getInt(pos + 8)
          case "data" =>
            require(blockAlign > 0, "wav-adpcm-ima: 'data' before 'fmt '")
            require(nSamples >= 0, "wav-adpcm-ima: 'data' before 'fact'")
            val samples = new Array[Float](nSamples)
            var emitted = 0
            var blockOff = pos + 8
            while (emitted < nSamples) {
              require(blockOff + 4 <= pos + 8 + size,
                "wav-adpcm-ima: data chunk ends before the declared sample count")
              var predictor = buf.getShort(blockOff).toInt
              var index = content(blockOff + 2) & 0xff
              require(index <= 88, s"wav-adpcm-ima: step index $index")
              samples(emitted) = predictor / 32768f
              emitted += 1
              var i = 0
              val maxCodes = (math.min(blockAlign, pos + 8 + size - blockOff) - 4) * 2
              while (emitted < nSamples && i < maxCodes) {
                val byte = content(blockOff + 4 + i / 2) & 0xff
                val delta = if (i % 2 == 0) byte & 0xf else byte >> 4
                predictor = adpcmReconstruct(predictor, index, delta)
                index = adpcmNextIndex(index, delta)
                samples(emitted) = predictor / 32768f
                emitted += 1
                i += 1
              }
              blockOff += blockAlign
            }
            out = samples
          case _ => // LIST/INFO/cue chunks: skip
        }
        pos += 8 + size + (size & 1)
      }
      require(out != null, "wav-adpcm-ima: no 'data' chunk")
      out
    }
  }

  /** Real image decode, zero libraries: uncompressed 24-bit BMP.
    * Output: one grayscale intensity in [0, 1] per pixel, top-down
    * row-major regardless of the file's row order (BMP stores rows
    * bottom-up when height is positive), gray computed with exact
    * integer Rec.601 weights `(299 r + 587 g + 114 b) / 255000`. */
  final class BmpCodec extends MediaCodec {
    val name: String = "bmp-gray"
    def init(): BmpCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      require(content.length >= 54 && content(0) == 'B' && content(1) == 'M',
        "bmp-gray: not a BMP stream")
      val buf = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataOff = buf.getInt(10)
      val width = buf.getInt(18)
      val heightRaw = buf.getInt(22)
      require(buf.getShort(28) == 24 && buf.getInt(30) == 0,
        "bmp-gray: only uncompressed 24bpp BMP is supported")
      val height = math.abs(heightRaw)
      val bottomUp = heightRaw > 0
      require(width > 0 && height > 0, "bmp-gray: empty image")
      val rowSize = ((24 * width + 31) / 32) * 4 // rows pad to 4 bytes
      require(dataOff >= 54 && dataOff.toLong + rowSize.toLong * height <= content.length,
        "bmp-gray: pixel array overruns the stream")
      val out = new Array[Float](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        var x = 0
        while (x < width) {
          val p = dataOff + srcRow * rowSize + 3 * x // stored b, g, r
          val b = content(p) & 0xff
          val g = content(p + 1) & 0xff
          val r = content(p + 2) & 0xff
          out(y * width + x) = (299 * r + 587 * g + 114 * b) / 255000f
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Real COMPRESSED-format image decode, zero libraries: PNG with
    * 8-bit depth, grayscale (color type 0) or truecolor RGB (2), no
    * interlace — the zlib inflate comes from `java.util.zip.Inflater`
    * (the JDK ships the codec), all five row filters
    * (None/Sub/Up/Average/Paeth) are reconstructed, and every chunk's
    * CRC-32 is validated (corrupt blobs fail loudly, per the
    * [[MediaCodec]] contract). Output: one gray intensity in [0, 1]
    * per pixel, top-down row-major (PNG's stored order), RGB grayed
    * with the same exact integer Rec.601 weights as [[BmpCodec]].
    * Anything outside the subset (16-bit, palette, alpha, interlace)
    * fails loudly rather than decoding approximately. */
  final class PngCodec extends MediaCodec {
    val name: String = "png-gray"
    def init(): PngCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      require(content.length >= 8 && content.take(8).sameElements(sig),
        "png-gray: not a PNG stream")
      val buf = java.nio.ByteBuffer.wrap(content) // PNG integers are big-endian
      var pos = 8
      var width = 0
      var height = 0
      var channels = 0
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        require(pos + 8 <= content.length, "png-gray: truncated chunk header")
        val len = buf.getInt(pos)
        val ctype = new String(content, pos + 4, 4, "US-ASCII")
        require(len >= 0 && pos + 12 + len <= content.length,
          s"png-gray: chunk '$ctype' overruns the stream")
        val crc = new java.util.zip.CRC32()
        crc.update(content, pos + 4, 4 + len)
        require(crc.getValue.toInt == buf.getInt(pos + 8 + len),
          s"png-gray: CRC mismatch in '$ctype'")
        ctype match {
          case "IHDR" =>
            width = buf.getInt(pos + 8)
            height = buf.getInt(pos + 12)
            val bitDepth = content(pos + 16)
            val colorType = content(pos + 17)
            require(bitDepth == 8, s"png-gray: only 8-bit depth supported, got $bitDepth")
            require(colorType == 0 || colorType == 2,
              s"png-gray: only grayscale/truecolor supported, got color type $colorType")
            require(content(pos + 20) == 0, "png-gray: interlaced PNG not supported")
            require(width > 0 && height > 0, "png-gray: empty image")
            channels = if (colorType == 0) 1 else 3
          case "IDAT" => idat.write(content, pos + 8, len)
          case "IEND" => done = true
          case _ => // ancillary chunks (tEXt, pHYs, gAMA, …): skip
        }
        pos += 12 + len
      }
      require(channels > 0, "png-gray: no IHDR chunk")
      val stride = width * channels
      val raw = new Array[Byte]((stride + 1) * height)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      var n = 1
      while (off < raw.length && n != 0) {
        n = inf.inflate(raw, off, raw.length - off)
        off += n
      }
      inf.end()
      require(off == raw.length,
        s"png-gray: IDAT inflated to $off bytes, expected ${raw.length}")
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      val out = new Array[Float](width * height)
      val cur = new Array[Int](stride)
      val prev = new Array[Int](stride) // zeroed = the spec's row -1
      var y = 0
      while (y < height) {
        val rowOff = y * (stride + 1)
        val filter = raw(rowOff) & 0xff
        var x = 0
        while (x < stride) {
          val v = raw(rowOff + 1 + x) & 0xff
          val a = if (x >= channels) cur(x - channels) else 0
          val b = prev(x)
          val c = if (x >= channels) prev(x - channels) else 0
          cur(x) = (filter match {
            case 0 => v
            case 1 => v + a
            case 2 => v + b
            case 3 => v + (a + b) / 2
            case 4 => v + paeth(a, b, c)
            case f => throw new IllegalArgumentException(s"png-gray: unknown row filter $f")
          }) & 0xff
          x += 1
        }
        var px = 0
        while (px < width) {
          out(y * width + px) =
            if (channels == 1) cur(px) / 255f
            else (299 * cur(3 * px) + 587 * cur(3 * px + 1) + 114 * cur(3 * px + 2)) / 255000f
          px += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      out
    }
  }

  /** Real COMPRESSED-format image decode, zero libraries: GIF87a/89a
    * with full LZW decompression — variable code widths (up to the
    * spec's 12 bits), clear/end codes, and the deferred width bump at
    * table-full — implemented directly (the JDK ships no GIF coder;
    * LZW itself is ~80 lines). Decodes the FIRST image frame:
    * non-interlaced, local-over-global palette precedence; extensions
    * (graphic control, comments, application) are skipped as the spec
    * allows. Output: one gray intensity in [0, 1] per pixel, top-down
    * row-major, palette colors grayed with the same exact integer
    * Rec.601 weights as [[BmpCodec]]/[[PngCodec]]. Interlaced images
    * and malformed streams (bad signature, truncated sub-blocks, codes
    * past the table, missing image block) fail loudly. */
  final class GifCodec extends MediaCodec {
    val name: String = "gif-gray"
    def init(): GifCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      val sigOk = content.length >= 13 && {
        val s = new String(content, 0, 6, "US-ASCII")
        s == "GIF87a" || s == "GIF89a"
      }
      require(sigOk, "gif-gray: not a GIF stream")
      def u8(i: Int): Int = content(i) & 0xff
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8) // little-endian
      // Logical screen descriptor + optional global color table.
      val gctFlag = (u8(10) & 0x80) != 0
      val gctSize = 2 << (u8(10) & 7)
      var pos = 13
      val gctOff = pos
      if (gctFlag) pos += 3 * gctSize
      // Walk blocks to the first image descriptor.
      var imgOff = -1
      while (imgOff < 0) {
        require(pos < content.length, "gif-gray: no image block before EOF")
        u8(pos) match {
          case 0x2c => imgOff = pos
          case 0x21 => // extension: label byte, then sub-blocks to 0
            pos += 2
            while ({ require(pos < content.length, "gif-gray: truncated extension")
                     u8(pos) != 0 }) pos += 1 + u8(pos)
            pos += 1
          case 0x3b => throw new IllegalArgumentException(
            "gif-gray: trailer before any image block")
          case b => throw new IllegalArgumentException(
            f"gif-gray: unknown block 0x$b%02x")
        }
      }
      require(imgOff + 10 <= content.length, "gif-gray: truncated image descriptor")
      val width = u16(imgOff + 5)
      val height = u16(imgOff + 7)
      val iFlags = u8(imgOff + 9)
      require((iFlags & 0x40) == 0, "gif-gray: interlaced GIF not supported")
      require(width > 0 && height > 0, "gif-gray: empty image")
      pos = imgOff + 10
      val lctFlag = (iFlags & 0x80) != 0
      val lctSize = 2 << (iFlags & 7)
      val palOff = if (lctFlag) pos else gctOff
      val palSize = if (lctFlag) lctSize else gctSize
      require(lctFlag || gctFlag, "gif-gray: image has no color table")
      if (lctFlag) pos += 3 * lctSize
      require(palOff + 3 * palSize <= content.length, "gif-gray: truncated color table")
      // Palette → gray, precomputed once.
      val gray = new Array[Float](palSize)
      var pi = 0
      while (pi < palSize) {
        gray(pi) = (299 * u8(palOff + 3 * pi) + 587 * u8(palOff + 3 * pi + 1) +
          114 * u8(palOff + 3 * pi + 2)) / 255000f
        pi += 1
      }
      // Concatenate the LZW sub-blocks.
      require(pos < content.length, "gif-gray: missing LZW minimum code size")
      val minCodeSize = u8(pos)
      require(minCodeSize >= 2 && minCodeSize <= 8,
        s"gif-gray: LZW minimum code size $minCodeSize out of range")
      pos += 1
      val data = new java.io.ByteArrayOutputStream()
      while ({ require(pos < content.length, "gif-gray: truncated image data")
               u8(pos) != 0 }) {
        val n = u8(pos)
        require(pos + 1 + n <= content.length, "gif-gray: image sub-block overruns")
        data.write(content, pos + 1, n)
        pos += 1 + n
      }
      val bytes = data.toByteArray
      // LZW decode, LSB-first bit stream. Table entries are stored as
      // (prefix code, appended byte); output is materialized by
      // walking the prefix chain (bounded by table size).
      val clearCode = 1 << minCodeSize
      val endCode = clearCode + 1
      val MaxCodes = 4096
      val prefix = new Array[Int](MaxCodes)
      val suffix = new Array[Byte](MaxCodes)
      val stack = new Array[Byte](MaxCodes)
      val out = new Array[Float](width * height)
      var outPos = 0
      var codeSize = minCodeSize + 1
      var next = endCode + 1
      var prev = -1
      var acc = 0L
      var accBits = 0
      var bi = 0
      var finished = false
      def px(idx: Int): Float = {
        require(idx < palSize, "gif-gray: pixel index outside the palette")
        gray(idx)
      }
      def emit(code: Int): Unit = {
        var sp = 0
        var c = code
        while (c >= clearCode) { // walk the chain; roots are literals
          require(sp < MaxCodes, "gif-gray: corrupt LZW chain")
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        require(outPos + sp + 1 <= out.length,
          "gif-gray: LZW output exceeds image size")
        out(outPos) = px(c); outPos += 1
        while (sp > 0) { sp -= 1; out(outPos) = px(stack(sp) & 0xff); outPos += 1 }
      }
      def firstByte(code: Int): Int = {
        var c = code
        while (c >= clearCode) c = prefix(c)
        c
      }
      while (!finished) {
        if (accBits < codeSize) {
          require(bi < bytes.length, "gif-gray: LZW stream ended without end code")
          acc |= (bytes(bi) & 0xffL) << accBits; accBits += 8; bi += 1
        } else {
          val code = (acc & ((1 << codeSize) - 1)).toInt
          acc >>>= codeSize; accBits -= codeSize
          if (code == clearCode) {
            codeSize = minCodeSize + 1; next = endCode + 1; prev = -1
          } else if (code == endCode) {
            finished = true
          } else if (prev < 0) {
            require(code < clearCode, "gif-gray: first code after clear not a literal")
            require(outPos < out.length, "gif-gray: LZW output exceeds image size")
            out(outPos) = px(code); outPos += 1
            prev = code
          } else {
            // When the table is FULL (next == 4096) the spec lets an
            // encoder defer the clear code indefinitely: it keeps
            // emitting 12-bit codes against the frozen table, so the
            // decoder must keep decoding WITHOUT inserting — only a
            // code past the (frozen) table is corrupt.
            require(code <= next && code < MaxCodes,
              "gif-gray: LZW code past the table")
            if (code == next) { // the KwKwK case: cur = prev + first(prev)
              prefix(next) = prev; suffix(next) = firstByte(prev).toByte; next += 1
              emit(code)
            } else {
              emit(code)
              if (next < MaxCodes) {
                prefix(next) = prev; suffix(next) = firstByte(code).toByte; next += 1
              }
            }
            prev = code
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
      }
      require(outPos == out.length,
        s"gif-gray: decoded $outPos pixels, expected ${out.length}")
      out
    }
  }

  /** Real LOSSY-format image decode, zero external libraries: JPEG
    * through the JDK's bundled ImageIO reader (`javax.imageio` ships a
    * baseline+progressive JPEG codec in every JRE — headless-safe, no
    * AWT display needed). This retires the [[FakeCodec]] stand-in for
    * the single most common compressed image format: where PNG/GIF
    * demanded in-engine decoders ([[PngCodec]]/[[GifCodec]] — the JDK
    * exposes only their *primitives*), JPEG's full codec is already in
    * the JDK, and wrapping it IS the production move (never
    * re-implement a DCT pipeline a vetted decoder already provides).
    *
    * Output: one gray intensity in [0, 1] per pixel, top-down
    * row-major, the same exact integer Rec.601 weights as the other
    * image codecs — so a JPEG and a PNG of the same pixels produce
    * features that differ only by the JPEG's own quantization loss
    * (MultimodalSpec pins the bound). Decode is deterministic for a
    * given JRE; JPEG being lossy, cross-library bit-exactness is NOT
    * part of the contract (and is why q51 stays rows-only). Non-JPEG
    * or corrupt streams fail loudly per the [[MediaCodec]] contract. */
  final class JpegCodec extends MediaCodec {
    val name: String = "jpeg-gray"
    def init(): JpegCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      // SOI marker check first: ImageIO would happily decode PNG/GIF/BMP
      // bytes too, and a format-specific codec silently accepting the
      // wrong format hides pipeline wiring bugs.
      require(content.length >= 2 &&
        (content(0) & 0xff) == 0xff && (content(1) & 0xff) == 0xd8,
        "jpeg-gray: not a JPEG stream (missing SOI marker)")
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch {
          case e: Exception =>
            throw new IllegalArgumentException(s"jpeg-gray: ${e.getMessage}", e)
        }
      require(img != null, "jpeg-gray: ImageIO could not decode the stream")
      val width = img.getWidth
      val height = img.getHeight
      require(width > 0 && height > 0, "jpeg-gray: empty image")
      val out = new Array[Float](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(y * width + x) = (299 * r + 587 * g + 114 * b) / 255000f
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Real 24-bpp BMP ENCODER (the exact inverse of [[BmpCodec]]'s
    * subset): one gray byte per pixel, stored as r=g=b in bottom-up
    * rows padded to 4 bytes — so `BmpCodec.decode(encodeBmp24Gray(g))
    * .map(f => round(f*255))` reproduces `g` bit-exactly (the Rec.601
    * weights sum to 1000, so gray pixels survive the integer
    * weighting: (299+587+114)·v / 255000 = v/255). Exists so media
    * pipelines can be driven end-to-end through a REAL container
    * format — fixture synthesis, round-trip specs, and the
    * perceptual-hash dedup chain all encode with this and decode with
    * the production codec. */
  def encodeBmp24Gray(gray: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodeBmp24Gray: ${gray.length} bytes for ${width}x$height")
    val rowSize = ((24 * width + 31) / 32) * 4
    val out = new Array[Byte](54 + rowSize * height)
    val buf = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(out.length)
      .putInt(0).putInt(54)
      .putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0): Unit
    var sy = 0
    while (sy < height) {
      val imgRow = height - 1 - sy // stored row sy holds image row h-1-sy
      var x = 0
      while (x < width) {
        val v = gray(imgRow * width + x)
        val p = 54 + sy * rowSize + 3 * x
        out(p) = v; out(p + 1) = v; out(p + 2) = v // b, g, r
        x += 1
      }
      sy += 1
    }
    out
  }

  /** Real LOSSY JPEG ENCODER: gray pixels → a single-component JFIF
    * stream through the JDK's own ImageIO writer at maximum quality
    * (explicit 1.0 — near-unit quantization tables, so loss per pixel
    * is a few units of 255, but NOT zero: DCT round-trips still
    * round). Unlike the other encoders this one is deliberately NOT
    * bit-invertible — it exists to drive the dedup chain through a
    * real lossy container, where the contract is a BOUNDED perceptual
    * drift (q109 pins dHash Hamming distance vs the exact-pixel hash;
    * MultimodalSpec pins the pixel-level bound), the only honest
    * contract a lossy codec can carry. */
  def encodeJpegGray(gray: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodeJpegGray: ${gray.length} bytes for ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Real 16-bit PCM WAV ENCODER (the inverse of [[WavPcmCodec]]'s
    * 16-bit mono subset): RIFF/WAVE container, PCM fmt chunk, signed
    * little-endian samples. 16-bit normalization is `s / 32768f` —
    * exact in float — so `WavPcmCodec.decode(encodeWavPcm16(s)).map(f
    * => round(f·32768))` reproduces `s` bit-exactly: the same
    * round-trip contract as [[encodeBmp24Gray]]/[[encodePngGray]],
    * extending the oracle-gated media chain to the AUDIO codec
    * (q104). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    val buf = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen): Unit
    var i = 0
    while (i < samples.length) { buf.putShort(44 + 2 * i, samples(i)); i += 1 }
    out
  }

  /** Real IMA ADPCM ENCODER (the lossy inverse of [[AdpcmImaCodec]]):
    * mono 4-bit codes in `blockAlign`-byte blocks inside a RIFF/WAVE
    * container with format tag 0x11, a spec-compliant 20-byte fmt
    * chunk (cbSize=2 + samplesPerBlock) and the `fact` sample count
    * the decoder truncates by. The encoder runs the DECODER'S
    * reconstruction inside its quantization loop (successive
    * approximation against the step table), so encode→decode error
    * is exactly the quantizer's — the property the drift spec and
    * the q147 tolerance gate measure. ~4:1 vs PCM16. */
  def encodeAdpcmImaWav(samples: Array[Short], sampleRate: Int = 8000,
                        blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign > 4 && blockAlign % 4 == 0,
      s"encodeAdpcmImaWav: blockAlign=$blockAlign")
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val nBlocks = math.max(1,
      (samples.length + samplesPerBlock - 1) / samplesPerBlock)
    val dataLen = nBlocks * blockAlign
    val out = new Array[Byte](12 + 28 + 12 + 8 + dataLen)
    val buf = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(out.length - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11)                    // IMA ADPCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(4)                       // bits per code
      .putShort(2)                       // cbSize
      .putShort(samplesPerBlock.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(dataLen): Unit
    var index = 0 // step index carries ACROSS blocks (standard practice)
    var s = 0
    var blockOff = 12 + 28 + 12 + 8
    while (s < samples.length || s == 0) {
      val first = if (s < samples.length) samples(s).toInt else 0
      buf.putShort(blockOff, first.toShort)
      out(blockOff + 2) = index.toByte
      out(blockOff + 3) = 0
      var predictor = first
      s += 1
      var i = 0
      while (i < (blockAlign - 4) * 2 && s < samples.length) {
        val step = AdpcmStepTable(index)
        var diff = samples(s).toInt - predictor
        var delta = if (diff < 0) { diff = -diff; 8 } else 0
        // Successive approximation mirroring the reconstruction sums.
        var st = step
        if (diff >= st) { delta |= 4; diff -= st }
        st >>= 1
        if (diff >= st) { delta |= 2; diff -= st }
        st >>= 1
        if (diff >= st) delta |= 1
        predictor = adpcmReconstruct(predictor, index, delta)
        index = adpcmNextIndex(index, delta)
        val b = blockOff + 4 + i / 2
        if (i % 2 == 0) out(b) = (delta & 0xf).toByte
        else out(b) = (out(b) | (delta << 4)).toByte
        s += 1
        i += 1
      }
      blockOff += blockAlign
      if (samples.length == 0) s = 1 // emitted the single silent block
    }
    out
  }

  // ------------------------------------------------------------------
  // MJPEG-in-AVI video codec — the engine's first REAL video decode
  // path (q50's frame sampling previously rode the FakeCodec stub).
  // Motion-JPEG AVI is a genuine public format (camera/capture
  // standard: RIFF 'AVI ' container, 'vids'/'MJPG' stream, each frame
  // an independent baseline JPEG in a '00dc' chunk) whose entire
  // decode stack the engine already carries: RIFF walking (the WAV
  // codecs) + the in-engine JpegCodec per frame. Inter-frame
  // prediction formats (H.264 etc.) remain out of scope — their
  // entropy-coding tables and prediction machinery are not
  // re-derivable from public math within this engine's constraints,
  // and the JDK ships no video codec (recorded decision, the MP3
  // note's sibling).
  // ------------------------------------------------------------------

  /** MJPEG-AVI ENCODER: grayscale frames (each `width`×`height` bytes)
    * as max-quality baseline JPEGs inside a minimal-but-compliant AVI:
    * hdrl LIST (avih main header + one 'vids'/'MJPG' strl), movi LIST
    * of '00dc' frame chunks. 25 fps nominal. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int,
                     height: Int): Array[Byte] = {
    require(frames.nonEmpty, "encodeAviMjpeg: no frames")
    val jpegs = frames.map { f => encodeJpegGray(f, width, height) }
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // strf: BITMAPINFOHEADER
    val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++
      le16(24) ++ fourcc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    // strh: stream header — 'vids'/'MJPG', rate 25/1, length = frames
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++
      le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(jpegs.length) ++ le32(jpegs.map(_.length).max) ++
      le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fourcc(id) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(4 + body.length) ++ fourcc(kind) ++ body
    // avih: 56-byte main header
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(jpegs.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    bos.write(fourcc("RIFF")); bos.write(le32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** MJPEG-AVI DECODER (the video [[MediaCodec]] leg): walks the RIFF
    * tree, validates the 'vids'/'MJPG' stream header and frame
    * geometry against the main header, decodes every '00dc' frame
    * through the production [[JpegCodec]], and returns ALL frames'
    * gray intensities concatenated in stream order (frame f occupies
    * [f·w·h, (f+1)·w·h) — the layout [[videoFrameSlice]] and the
    * frame-sampling operators index into). The declared frame count
    * must be met exactly; malformed input fails loudly. */
  final class AviMjpegCodec extends MediaCodec {
    val name: String = "avi-mjpeg"
    def init(): AviMjpegCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      def ascii(off: Int) = new String(content, off, 4, "US-ASCII")
      require(content.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "AVI ",
        "avi-mjpeg: not a RIFF/AVI stream")
      val buf = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var width = -1
      var height = -1
      var declaredFrames = -1
      var sawMjpgStream = false
      val jpeg = new JpegCodec().init()
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      def walk(pos0: Int, end0: Int): Unit = {
        var pos = pos0
        while (pos + 8 <= end0) {
          val id = ascii(pos)
          val size = buf.getInt(pos + 4)
          require(size >= 0 && pos + 8 + size <= end0,
            s"avi-mjpeg: chunk '$id' overruns the stream")
          id match {
            case "LIST" =>
              require(size >= 4, "avi-mjpeg: LIST too small")
              walk(pos + 12, pos + 8 + size)
            case "avih" =>
              require(size >= 56, "avi-mjpeg: avih too small")
              declaredFrames = buf.getInt(pos + 8 + 16)
              width = buf.getInt(pos + 8 + 32)
              height = buf.getInt(pos + 8 + 36)
              require(width > 0 && height > 0, "avi-mjpeg: empty geometry")
            case "strh" =>
              require(size >= 8, "avi-mjpeg: strh too small")
              if (ascii(pos + 8) == "vids") {
                require(ascii(pos + 12) == "MJPG",
                  "avi-mjpeg: only the MJPG video codec is supported")
                sawMjpgStream = true
              }
            case "00dc" =>
              require(sawMjpgStream && width > 0,
                "avi-mjpeg: frame chunk before headers")
              val fb = java.util.Arrays.copyOfRange(content, pos + 8, pos + 8 + size)
              val gray = jpeg.decode(fb)
              require(gray.length == width * height,
                s"avi-mjpeg: frame is ${gray.length} px, header says ${width}x$height")
              frames += gray
            case _ => // other streams/index/info chunks: skip
          }
          pos += 8 + size + (size & 1)
        }
      }
      walk(12, content.length)
      require(declaredFrames >= 0, "avi-mjpeg: no avih header")
      require(frames.length == declaredFrames,
        s"avi-mjpeg: decoded ${frames.length} frames, header declares $declaredFrames")
      val out = new Array[Float](frames.length * width * height)
      var f = 0
      while (f < frames.length) {
        System.arraycopy(frames(f), 0, out, f * width * height, width * height)
        f += 1
      }
      out
    }
  }

  /** One frame's pixels from [[AviMjpegCodec]]'s concatenated layout. */
  def videoFrameSlice(decoded: Array[Float], width: Int, height: Int,
                      frame: Int): Array[Float] = {
    val fsz = width * height
    require(decoded.length % fsz == 0 && frame >= 0 &&
      (frame + 1) * fsz <= decoded.length,
      s"videoFrameSlice: frame $frame of ${decoded.length / fsz}")
    java.util.Arrays.copyOfRange(decoded, frame * fsz, (frame + 1) * fsz)
  }

  // ------------------------------------------------------------------
  // MDCT transform audio codec — the third audio leg. WHY THIS AND NOT
  // MP3/MP2: the perceptual stages of MPEG-1 audio (Layer II/III bit-
  // allocation tables, the 512-tap synthesis window D[]) are committee-
  // designed NUMERIC TABLES from ISO/IEC 11172-3 Annex B with no
  // closed form — they cannot be re-derived from public math, only
  // transcribed, so a bit-compatible MP3/MP2 leg is out of scope for
  // this from-public-knowledge engine (recorded decision; the JDK
  // ships no audio codec either — javax.sound handles PCM only).
  // What IS public math is the transform architecture under all of
  // them: the Modified DCT with 50 %-overlap time-domain aliasing
  // cancellation (Princen–Bradley 1986/1987) and the closed-form sine
  // window w[n] = sin(π/2M·(n+½)), which satisfies the PR condition
  // w²[n] + w²[n+M] = 1 exactly. This codec is that architecture,
  // honestly framed: real MDCT analysis, per-frame max-scalefactor
  // 4-bit uniform quantization (the lossy stage), IMDCT + overlap-add
  // synthesis, in a RIFF/WAVE container under an in-engine format tag
  // (0x4D44 — NOT an IANA/Microsoft-registered codec id; readers
  // outside this engine will not recognize it, by design). ~3.2:1 vs
  // PCM16 at M=32. All trigonometry is StrictMath (bit-reproducible
  // across JVMs/platforms — Math.cos intrinsics are not).
  // ------------------------------------------------------------------

  /** MDCT coefficients per frame (frame = 2M samples, hop M). */
  val MdctM = 32

  /** In-engine RIFF format tag for the MDCT codec ("MD" LE). */
  val MdctFormatTag = 0x4D44

  /** Bytes per MDCT frame: float32 scalefactor + M 4-bit coefficients. */
  val MdctFrameBytes = 4 + MdctM / 2

  /** The N×M MDCT basis, N = 2M rows of analysis window × cosine:
    * basis(n)(k) = w[n]·cos(π/M·(n + ½ + M/2)·(k + ½)). Shared by
    * analysis and synthesis (the MDCT is its own transpose up to the
    * 2/M synthesis gain). StrictMath for cross-platform determinism. */
  private lazy val mdctBasis: Array[Array[Double]] = {
    val m = MdctM
    Array.tabulate(2 * m) { n =>
      val w = StrictMath.sin(StrictMath.PI / (2 * m) * (n + 0.5))
      Array.tabulate(m) { k =>
        w * StrictMath.cos(StrictMath.PI / m * (n + 0.5 + m / 2.0) * (k + 0.5))
      }
    }
  }

  /** Forward MDCT of a signal: frame f covers samples
    * [fM − M, fM + M) (out-of-range reads are 0), f = 0 until
    * ceil(n/M) + 1 so every sample lies in exactly two frames'
    * overlap. Returns nFrames × M coefficient rows. */
  private[ops] def mdctForward(x: Array[Float]): Array[Array[Double]] = {
    val m = MdctM
    val nFrames = if (x.length == 0) 1 else (x.length - 1) / m + 2
    Array.tabulate(nFrames) { f =>
      val base = f * m - m
      val out = new Array[Double](m)
      var k = 0
      while (k < m) {
        var acc = 0.0
        var n = 0
        while (n < 2 * m) {
          val t = base + n
          if (t >= 0 && t < x.length) acc += mdctBasis(n)(k) * x(t)
          n += 1
        }
        out(k) = acc
        k += 1
      }
      out
    }
  }

  /** IMDCT + windowed overlap-add: the exact inverse of
    * [[mdctForward]] for unquantized coefficients (time-domain alias
    * terms cancel between adjacent frames — the Princen–Bradley
    * property MultimodalSpec pins to float precision). */
  private[ops] def mdctReconstruct(frames: Array[Array[Double]],
                                   nSamples: Int): Array[Float] = {
    val m = MdctM
    val acc = new Array[Double](nSamples)
    var f = 0
    while (f < frames.length) {
      val base = f * m - m
      var n = 0
      while (n < 2 * m) {
        val t = base + n
        if (t >= 0 && t < nSamples) {
          var s = 0.0
          var k = 0
          while (k < m) { s += mdctBasis(n)(k) * frames(f)(k); k += 1 }
          acc(t) += 2.0 / m * s
        }
        n += 1
      }
      f += 1
    }
    val out = new Array[Float](nSamples)
    var t = 0
    while (t < nSamples) {
      out(t) = math.max(-1.0, math.min(1.0, acc(t))).toFloat
      t += 1
    }
    out
  }

  /** MDCT transform-codec ENCODER: PCM16 mono → per-frame
    * (scalefactor, 4-bit quantized coefficients) in a RIFF/WAVE
    * container under [[MdctFormatTag]]. The lossy stage is the
    * quantizer alone: q[k] = round(X[k]/scale·7) ∈ [−7, 7] with
    * scale = max|X[k]| — so encode→decode error is exactly the
    * quantizer's, the property the drift spec and the q160 tolerance
    * gate measure (the [[encodeAdpcmImaWav]] contract). */
  def encodeMdctWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val x = new Array[Float](samples.length)
    var i = 0
    while (i < x.length) { x(i) = samples(i) / 32768f; i += 1 }
    val frames = mdctForward(x)
    val dataLen = frames.length * MdctFrameBytes
    val out = new Array[Byte](12 + 28 + 12 + 8 + dataLen)
    val buf = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(out.length - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(MdctFormatTag.toShort)
      .putShort(1)                          // mono
      .putInt(sampleRate)
      .putInt(sampleRate * MdctFrameBytes / MdctM) // byte rate
      .putShort(MdctFrameBytes.toShort)     // blockAlign = one frame
      .putShort(4)                          // bits per coefficient
      .putShort(2)                          // cbSize
      .putShort(MdctM.toShort)              // coefficients per frame
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(dataLen): Unit
    var off = 12 + 28 + 12 + 8
    frames.foreach { fr =>
      var scale = 0.0
      var k = 0
      while (k < MdctM) { if (math.abs(fr(k)) > scale) scale = math.abs(fr(k)); k += 1 }
      buf.putFloat(off, scale.toFloat)
      k = 0
      while (k < MdctM) {
        val q = if (scale == 0.0) 0
          else math.round(fr(k) / scale * 7.0).toInt // ∈ [−7, 7]
        val nib = q & 0xf
        val b = off + 4 + k / 2
        if (k % 2 == 0) out(b) = nib.toByte
        else out(b) = (out(b) | (nib << 4)).toByte
        k += 1
      }
      off += MdctFrameBytes
    }
    out
  }

  /** MDCT transform-codec DECODER (the [[MediaCodec]] leg): parses the
    * [[MdctFormatTag]] container, dequantizes each frame
    * (X̂[k] = q[k]·scale/7), IMDCT + overlap-adds, truncates to the
    * `fact` sample count. Malformed input fails loudly. */
  final class MdctCodec extends MediaCodec {
    val name: String = "wav-mdct"
    def init(): MdctCodec = this
    def decode(content: Array[Byte]): Array[Float] = {
      def ascii(off: Int) = new String(content, off, 4, "US-ASCII")
      require(content.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
        "wav-mdct: not a RIFF/WAVE stream")
      val buf = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var haveFmt = false
      var nSamples = -1
      var out: Array[Float] = null
      var pos = 12
      while (pos + 8 <= content.length && out == null) {
        val id = ascii(pos)
        val size = buf.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size <= content.length,
          s"wav-mdct: chunk '$id' overruns the stream")
        id match {
          case "fmt " =>
            // Tag first: a foreign-but-valid WAV (16-byte PCM fmt)
            // must be rejected as "wrong format tag", not "too small".
            require(size >= 2, "wav-mdct: fmt chunk too small")
            require((buf.getShort(pos + 8) & 0xffff) == MdctFormatTag,
              "wav-mdct: not the MDCT format tag")
            require(size >= 20, "wav-mdct: fmt chunk too small")
            require(buf.getShort(pos + 10) == 1, "wav-mdct: only mono is supported")
            require(buf.getShort(pos + 20) == MdctFrameBytes,
              "wav-mdct: unexpected blockAlign")
            require(buf.getShort(pos + 22) == 4, "wav-mdct: only 4-bit coefficients")
            require(buf.getShort(pos + 26) == MdctM,
              "wav-mdct: unexpected coefficients-per-frame")
            haveFmt = true
          case "fact" =>
            require(size >= 4, "wav-mdct: fact chunk too small")
            nSamples = buf.getInt(pos + 8)
          case "data" =>
            require(haveFmt, "wav-mdct: 'data' before 'fmt '")
            require(nSamples >= 0, "wav-mdct: 'data' before 'fact'")
            val nFrames = size / MdctFrameBytes
            require(nFrames * MdctFrameBytes == size,
              "wav-mdct: data size is not a whole number of frames")
            require(nSamples == 0 || nFrames >= (nSamples - 1) / MdctM + 2,
              "wav-mdct: too few frames for the declared sample count")
            val frames = Array.tabulate(nFrames) { f =>
              val off = pos + 8 + f * MdctFrameBytes
              val scale = buf.getFloat(off).toDouble
              require(scale >= 0 && !scale.isNaN && !scale.isInfinite,
                "wav-mdct: invalid frame scalefactor")
              Array.tabulate(MdctM) { k =>
                val byte = content(off + 4 + k / 2) & 0xff
                val nib = if (k % 2 == 0) byte & 0xf else byte >> 4
                val q = if (nib >= 8) nib - 16 else nib // sign-extend 4-bit
                q * scale / 7.0
              }
            }
            out = mdctReconstruct(frames, nSamples)
          case _ => // LIST/INFO chunks: skip
        }
        pos += 8 + size + (size & 1)
      }
      require(out != null, "wav-mdct: no 'data' chunk")
      out
    }
  }

  /** Real grayscale PNG ENCODER (the inverse of [[PngCodec]]'s
    * color-type-0 subset): one gray byte per pixel, 8-bit depth,
    * filter 0 on every row, IDAT deflated with the JDK `Deflater`,
    * every chunk CRC-32-stamped. PNG stores exact sample bytes, so
    * `PngCodec.decode(encodePngGray(g)).map(f => round(f*255))`
    * reproduces `g` bit-exactly — the same round-trip contract as
    * [[encodeBmp24Gray]], which is what lets the perceptual-hash
    * dedup chain run over a COMPRESSED container under the same
    * integer-SQL oracle (q102). */
  def encodePngGray(gray: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodePngGray: ${gray.length} bytes for ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(ctype: String, payload: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      out.write(len)
      val tagged = ctype.getBytes("US-ASCII") ++ payload
      out.write(tagged)
      val crc = new java.util.zip.CRC32()
      crc.update(tagged)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type 0 = grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    chunk("IHDR", ihdr)
    // Scanlines: a filter-type-0 byte then the row's samples.
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      System.arraycopy(gray, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zipped.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Real grayscale GIF89a ENCODER (the inverse of [[GifCodec]]'s
    * gray subset): a 256-entry gray global palette (entry i =
    * (i,i,i) — Rec.601 weights sum to 1000, so decode returns
    * exactly i/255) and the pixel stream as a REAL LZW code stream —
    * literal 8-bit-rooted codes with periodic clear codes, the
    * encoder tracking the decoder's table growth so its code widths
    * widen in step (9→10… bits, the deferred-bump rule). Simplest
    * spec-valid LZW (no compression from string matching — the point
    * is a bit-exact container round trip through the production
    * decoder, not ratio), so
    * `GifCodec.decode(encodeGifGray(g)).map(f => round(f·255))`
    * reproduces `g` bit-exactly (q107's contract). */
  def encodeGifGray(gray: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodeGifGray: ${gray.length} bytes for ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0x80 | 7); w8(0); w8(0) // GCT present, 256 entries
    for (i <- 0 until 256) { w8(i); w8(i); w8(i) }
    w8(0x2c); w16(0); w16(0); w16(width); w16(height); w8(0)
    val minCodeSize = 8
    w8(minCodeSize)
    val clearCode = 1 << minCodeSize
    val endCode = clearCode + 1
    val bitBuf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var acc = 0L
    var accBits = 0
    var codeWidth = minCodeSize + 1
    var next = endCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += codeWidth
      while (accBits >= 8) { bitBuf += (acc & 0xff).toByte; acc >>>= 8; accBits -= 8 }
    }
    put(clearCode)
    var sinceClear = 0
    for (p <- gray) {
      if (sinceClear == 128) {
        put(clearCode); codeWidth = minCodeSize + 1; next = endCode + 1; sinceClear = 0
      }
      put(p & 0xff)
      // The decoder grows its table one entry per code AFTER the first
      // following a clear, widening when the table fills — mirror it
      // so literal codes stay in step with its reads.
      if (sinceClear >= 1) {
        next += 1
        if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      }
      sinceClear += 1
    }
    put(endCode)
    if (accBits > 0) bitBuf += (acc & 0xff).toByte
    bitBuf.grouped(255).foreach { blk => w8(blk.length); out.write(blk.toArray) }
    w8(0); w8(0x3b)
    out.toByteArray
  }

  /** Declared dHash Hamming tolerance of the LOSSY image leg (q109):
    * the max bits a max-quality JPEG round-trip may move an 18×16
    * corpus image's 64-bit dHash. dHash pools 2×2 before comparing
    * neighbors, so per-pixel quantization error (a few /255 at
    * quality 1.0) only flips bits whose pooled cells were nearly
    * tied; MultimodalSpec measures the real corpus distribution
    * (max ≈ half this bound at sf0.01) and q109's oracle pins the
    * flag for every document. */
  val JpegPhashTolerance = 24

  /** Declared SUMMED Hamming tolerance of the temporal video verify
    * (q163): the max total bits, over all 3 frames of a candidate
    * pair's MJPEG-AVI hash sequences, that the lossy per-frame JPEG
    * round-trips may add on top of the pair's exact distance: 3
    * frames × the per-image [[JpegPhashTolerance]]. MultimodalSpec
    * measures the real corpus distribution (max 33, mean 7.3 over
    * qualifying pairs at sf0.01 — the ≥2× margin discipline) and
    * q163's oracle pins the flag for every pair. */
  val VideoSeqTolerance = 72

  /** Declared fingerprint Hamming tolerance of the LOSSY audio leg
    * (q147): the max bits an IMA ADPCM round-trip may move a clip's
    * 64-bit energy-contour fingerprint. The contour compares SUMS of
    * adjacent 2-sample |amplitude| windows, so the 4-bit quantizer's
    * per-sample error only flips bits whose windows were nearly
    * tied; MultimodalSpec measures the real corpus distribution
    * (max 12, mean 5.5 at sf0.01 — half this bound) and q147's
    * oracle pins the flag for every document. */
  val AdpcmAfpTolerance = 24

  /** Declared fingerprint Hamming tolerance of the MDCT audio leg
    * (q160), same contract as [[AdpcmAfpTolerance]]: the max bits an
    * MDCT 4-bit-quantizer round-trip may move a clip's 64-bit
    * energy-contour fingerprint. MultimodalSpec measures the real
    * corpus distribution at sf0.01 (max 9, mean 3.9 — under half
    * this bound) and q160's oracle pins the flag per document. */
  val MdctAfpTolerance = 24

  /** 64-bit difference hash (dHash) of a decoded grayscale image: the
    * perceptual fingerprint behind image NEAR-dup dedup. Pixels are
    * re-quantized to exact ints (`round(f·255)` — lossless for codec
    * outputs that came from 8-bit sources), 2×2 block-SUM pooled to
    * 9×8 (integer sums, no division — nothing to round differently
    * anywhere else), and each of the 64 bits records whether a pooled
    * cell exceeds its right neighbor (strict >). Gradient direction
    * survives brightness scaling and small local edits, which is the
    * dHash family's whole point. Integer space end-to-end, so an
    * ANSI-SQL oracle reproduces the hash bit-for-bit from the same
    * pixel bytes (q97). */
  def dhash64(gray: Array[Float], width: Int, height: Int): Long = {
    val pw = width / 2
    val ph = height / 2
    require(width == 2 * pw && height == 2 * ph && pw == 9 && ph == 8,
      s"dhash64: image must 2x2-pool to 9x8, got ${width}x$height")
    val pooled = new Array[Int](pw * ph)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        pooled((y / 2) * pw + x / 2) += math.round(gray(y * width + x) * 255f)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var py = 0
    while (py < ph) {
      var px = 0
      while (px < 8) {
        if (pooled(py * pw + px) > pooled(py * pw + px + 1))
          hash |= 1L << (py * 8 + px)
        px += 1
      }
      py += 1
    }
    hash
  }

  /** Per-image perceptual hash over REAL decoded pixels: the same
    * partition-batched decode shape as [[extractFeatures]] (codec
    * constructed once per partition), emitting `(doc_id, phash)` for
    * [[graft.ops.Dedup.simhashPairs]]'s banded Hamming join. At
    * 100 TB this is the map pass of the media-dedup job: decode cost
    * amortizes per partition, the shuffle carries 16 bytes per image,
    * and candidate generation downstream is a hash join on 16-bit
    * bands — never all-pairs pixel comparison. */
  def imageDhash(media: DataFrame, width: Int, height: Int,
                 mkCodec: () => MediaCodec = () => new BmpCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = mkCodec().init()
        rows.map { case (id, bytes) =>
          (id, dhash64(codec.decode(bytes), width, height))
        }
      }
      .toDF("doc_id", "phash")
  }

  /** 64-bit audio energy-contour fingerprint: the audio analogue of
    * [[dhash64]], in the spirit of the Haitsma–Kalker energy-
    * difference fingerprint but time-domain and integer-exact so an
    * ANSI-SQL oracle reproduces it bit-for-bit. Samples re-quantize
    * to exact ints (`round(f·scale)` — lossless for PCM sources); the
    * first `65·windowSize` samples (the fingerprint CLIP — the audio
    * analogue of dHash's fixed 18×16 thumbnail; missing samples count
    * as silence) split into 65 fixed windows whose energy is the SUM
    * of absolute sample values, and bit k records whether window k's
    * energy exceeds window k+1's (strict >). Energy direction
    * survives volume scaling and small local edits — the property
    * near-dup needs — and the fingerprint feeds the SAME banded
    * Hamming machinery as the image family. The default 2-sample
    * window is deliberately small: like dHash's 4-byte pooled cells,
    * small windows keep adjacent energies high-variance, which is
    * what separates true near-dups from the background (measured at
    * sf0.01: radius 3 recovers 25 of the 27 planted pairs with ZERO
    * background collisions; 8-sample windows collapse to near-ties
    * and admit hundreds). Empty signal → 0. */
  def audioFingerprint64(samples: Array[Float], quantScale: Int = 32768,
                         windowSize: Int = 2): Long = {
    require(windowSize >= 1, s"audioFingerprint64: windowSize=$windowSize")
    val energy = new Array[Long](65)
    val n = math.min(samples.length, 65 * windowSize)
    var i = 0
    while (i < n) {
      energy(i / windowSize) +=
        math.abs(math.round(samples(i) * quantScale).toLong)
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (energy(k) > energy(k + 1)) fp |= 1L << k
      k += 1
    }
    fp
  }

  /** Per-clip audio fingerprints over REAL decoded samples: the same
    * partition-batched decode shape as [[imageDhash]] (codec
    * constructed once per partition), emitting `(doc_id, afp)` for
    * [[graft.ops.Dedup.simhashPairs]]'s banded Hamming join — the
    * audio member of the media-dedup family. At 100 TB: decode cost
    * amortizes per partition, the shuffle carries 16 bytes per clip,
    * candidate generation downstream is a combo-banded hash join. */
  def audioFingerprints(media: DataFrame,
                        mkCodec: () => MediaCodec = () => new WavPcmCodec,
                        quantScale: Int = 32768): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = mkCodec().init()
        rows.map { case (id, bytes) =>
          (id, audioFingerprint64(codec.decode(bytes), quantScale))
        }
      }
      .toDF("doc_id", "afp")
  }

  /** Modulo-bucket mean pooling: raw signal of ANY length → a fixed
    * `dim`-sized feature vector (bucket j = mean of samples at
    * positions ≡ j mod dim). The engine's codec-agnostic featurizer —
    * deterministic, length-independent, empty input → zeros. */
  def poolModulo(raw: Array[Float], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < raw.length) { acc(i % dim) += raw(i); cnt(i % dim) += 1; i += 1 }
    var j = 0
    while (j < dim) { if (cnt(j) > 0) acc(j) /= cnt(j); j += 1 }
    acc
  }

  /** Partition-batched feature extraction: one codec instance per
    * partition, reused across all of its rows (real codecs are
    * expensive to construct — per-row init is the anti-pattern this
    * shape exists to avoid). The codec ships as a FACTORY so each
    * partition builds its own instance executor-side; decode output is
    * pooled to `dim` with [[poolModulo]]. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int,
                      mkCodec: () => MediaCodec = () => new FakeCodec): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = mkCodec().init()
      rows.map(m => FeatureRow(m.doc_id, poolModulo(codec.decode(m.content), dim),
        m.content.length.toLong, codec.name))
    }
  }

  final case class PooledIntRow(doc_id: Long, bucket: Int, psum: Long,
                                pcnt: Long, n_bytes: Long, codec: String)

  /** Integer-space modulo pooling: the same partition-batched decode
    * as [[extractFeatures]], but the [0, 1] signal is re-quantized to
    * exact 8-bit ints (`round(f·255)` — lossless for codecs whose
    * source was 8-bit) and each modulo bucket emits its SUM and COUNT
    * instead of a float mean. Sums and counts are exact integers in
    * ANY engine, so the whole decode→pool chain carries a bit-exact
    * ANSI-SQL oracle (q51) — the float mean is a trailing division the
    * consumer applies when it actually wants one. Buckets with no
    * samples emit (0, 0) so the output shape is fixed at `dim` rows
    * per document. */
  def extractPooledInts(media: Dataset[MediaRow], dim: Int,
                        mkCodec: () => MediaCodec = () => new FakeCodec,
                        quantScale: Int = 255): Dataset[PooledIntRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = mkCodec().init()
      rows.flatMap { m =>
        val raw = codec.decode(m.content)
        val sums = new Array[Long](dim)
        val cnts = new Array[Long](dim)
        var i = 0
        while (i < raw.length) {
          // quantScale re-quantizes the codec's normalized signal back
          // to its source integer domain: 255 for 8-bit image/byte
          // codecs, 32768 for 16-bit PCM (both exact — the values are
          // integers/2^k small enough to be float-exact).
          sums(i % dim) += math.round(raw(i) * quantScale)
          cnts(i % dim) += 1
          i += 1
        }
        (0 until dim).map(j => PooledIntRow(m.doc_id, j, sums(j), cnts(j),
          m.content.length.toLong, codec.name))
      }
    }
  }

  /** Frame sampling: one row per `everyMs` tick of `duration_ms`, the
    * frame payload a deterministic byte slice of the blob (stub for a
    * real frame grab at that timestamp). Pure Catalyst — `sequence`
    * generates tick arrays, `explode` fans them out, binary
    * `substring` slices; no UDF, no driver loop. */
  def sampleFrames(media: DataFrame, everyMs: Long, frameBytes: Int = 16): DataFrame =
    media
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .withColumn("frame",
        expr(s"substring(content, CAST(frame_ms % greatest(octet_length(content), 1) AS INT) + 1, $frameBytes)"))
      .select(col("doc_id"), col("media_type"), col("frame_ms"), col("frame"))

  /** Metadata-aware "resize": scales the declared dimensions and stamps
    * the transform; the pixel work is the codec's job (stubbed), the
    * metadata contract is the engine's. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
      .withColumn("resize_applied", (scale < 1.0).cast("boolean"))
  }
}
