package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media travels as an opaque `binary` column plus typed metadata
  * (width/height/sample_rate/duration), and the engine provides the
  * *plumbing* — schema, partition-wise batch decode, frame sampling,
  * metadata-aware resize — with the codec itself pluggable.
  *
  * The actual byte→pixels/samples decode is STUBBED with a
  * deterministic fake ([[FakeCodec]]): no image/audio library exists in
  * this environment. Everything around the stub is real and is the part
  * that matters at 100 TB:
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

  /** Deterministic stand-in for a real decoder (REPLACE IN PRODUCTION
    * with an actual codec binding): "decodes" bytes into a dim-sized
    * feature vector of normalized per-bucket byte sums. Deliberately
    * cheap, pure, and platform-independent so tests pin the plumbing,
    * not the codec. */
  final class FakeCodec(dim: Int) {
    val name: String = s"fake-codec-$dim"
    var initCount = 0 // test hook: proves per-partition (not per-row) init
    def init(): FakeCodec = { initCount += 1; this }
    def decode(content: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](dim)
      val cnt = new Array[Int](dim)
      var i = 0
      while (i < content.length) {
        val b = content(i) & 0xff
        acc(i % dim) += b.toFloat
        cnt(i % dim) += 1
        i += 1
      }
      var j = 0
      while (j < dim) { if (cnt(j) > 0) acc(j) /= (cnt(j) * 255f); j += 1 }
      acc
    }
  }

  /** Partition-batched feature extraction: one codec instance per
    * partition, reused across all of its rows (real codecs are
    * expensive to construct — per-row init is the anti-pattern this
    * shape exists to avoid). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new FakeCodec(dim).init()
      rows.map(m => FeatureRow(m.doc_id, codec.decode(m.content),
        m.content.length.toLong, codec.name))
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
