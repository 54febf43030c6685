package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Multimodal

/** Multimodal-column queries: the harness has no real media, so
  * `documents.text` bytes stand in for the blob (the corpus is pure
  * ASCII, so DuckDB's VARCHAR arithmetic mirrors Spark's byte
  * arithmetic exactly for the frame-sampling oracle). The decode stub
  * is deterministic (see [[graft.ops.Multimodal.FakeCodec]]); the
  * feature query is declared rows-only because a partition-batched
  * JVM codec is exactly the kind of op the SQL oracle cannot express. */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // Frame sampling over fake video blobs: one row per 100 ms tick,
    // payload a byte slice. sequence+explode+substring — all Catalyst.
    Q("q50_frame_sample",
      """WITH media AS (
        |  SELECT doc_id, 'video/fake' AS media_type, text,
        |         length(text) % 500 AS duration_ms
        |  FROM documents),
        |ticks AS (
        |  SELECT doc_id, media_type, text, duration_ms,
        |         unnest(generate_series(0, duration_ms, 100)) AS frame_ms
        |  FROM media)
        |SELECT doc_id, media_type, frame_ms,
        |       CAST(length(substring(text, CAST(frame_ms % greatest(length(text), 1) AS INT) + 1, 16)) AS BIGINT) AS frame_len,
        |       substring(text, CAST(frame_ms % greatest(length(text), 1) AS INT) + 1, 16) AS frame_str
        |FROM ticks""".stripMargin) {
      (s, d) =>
        val media = table(s, d, "documents").select(
          col("doc_id"),
          lit("video/fake").as("media_type"),
          col("text").cast("binary").as("content"),
          (length(col("text")) % 500).cast("bigint").as("duration_ms"))
        Multimodal.sampleFrames(media, everyMs = 100L)
          .select(col("doc_id"), col("media_type"), col("frame_ms"),
            octet_length(col("frame")).cast("bigint").as("frame_len"),
            col("frame").cast("string").as("frame_str"))
    },

    // Partition-batched feature extraction through the stub codec —
    // rows-only check (JVM decode is not SQL-expressible); the codec
    // and plumbing are unit-tested (MultimodalSpec).
    Q.noOracle("q51_media_features") {
      (s, d) =>
        import s.implicits._
        val media = table(s, d, "documents").select(
          col("doc_id"),
          lit("image/fake").as("media_type"),
          col("text").cast("binary").as("content"),
          length(col("text")).cast("bigint").as("duration_ms"))
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media, dim = 8).toDF()
          .select(col("doc_id"), col("n_bytes"), col("codec"),
            size(col("embedding")).as("emb_dim"),
            round(aggregate(col("embedding"), lit(0.0),
              (a, v) => a + v * v), 6).as("emb_sq_norm"))
    }
  )
}
