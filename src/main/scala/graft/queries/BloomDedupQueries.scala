package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Functions.portableHash64
import graft.io.Sources.table
import graft.ops.PortableBloom

/** Bloom-routed incremental ingest dedup: the arriving batch tests
  * membership against a bounded bit-table sketch of the seen corpus,
  * and only the "maybe seen" fraction pays the exact join — the
  * "definitely new" rows are admitted on the sketch's structural
  * no-false-negative guarantee alone. This is the steady-state shape
  * of exact dedup at ingest: the 10⁹-key seen set compresses to an
  * m-bit table that builds in one partial-aggregated `bit_or` pass
  * and probes by equi join, so batch cost is ∝ batch (+ the fp tail),
  * never ∝ corpus.
  *
  * Unlike q84's engine-native sketch ([[graft.ops.RuntimeFilter]],
  * whose bloom is an opaque Spark binary and therefore invisible to
  * the oracle), this filter is plain integer arithmetic
  * ([[PortableBloom]]) — the oracle rebuilds the identical bit table
  * and pins the per-row ROUTING DECISION (`bloom_maybe`), not just
  * the final answer: a false negative (the bug class that silently
  * re-admits duplicates) hash-mismatches the gate instead of hiding
  * inside a correct-looking join. */
object BloomDedupQueries {

  /** Probe functions (k) and filter width per seen key. 4 bits/key is
    * the HARNESS dial — it keeps the false-positive path live at
    * oracle scale (~15% of non-dup batch rows route through the exact
    * join and come out is_new=1/bloom_maybe=1). Production wants
    * 10–16 bits/key (fp < 1%); m scales with the seen count either
    * way, so the semantics are corpus-size-invariant. */
  val K = 3
  val BitsPerKey = 4L

  /** Shared oracle CTEs: salted fp per doc (`dd`), the 90% cut
    * (`base`/`batch`), the derived width (`mm.m`), seen-set bit
    * positions (`bp`), and the finished bit table (`words`). q188
    * probes it; q203 maintains it as a stream. */
  private lazy val bloomCtes: String = {
    val p0 = PortableBloom.positionSql("fp", 0, "m")
    val p1 = PortableBloom.positionSql("fp", 1, "m")
    val p2 = PortableBloom.positionSql("fp", 2, "m")
    s"""dd AS (SELECT doc_id,
       |    ${LlmQueries.h64("CASE WHEN doc_id % 7 = 0 THEN CAST(doc_id % 50 AS VARCHAR) ELSE text END")} AS fp
       |  FROM documents),
       |mx AS (SELECT max(doc_id) AS mxid FROM dd),
       |base AS (SELECT dd.doc_id, dd.fp FROM dd, mx WHERE dd.doc_id < (mxid * 9) // 10),
       |batch AS (SELECT dd.doc_id, dd.fp FROM dd, mx WHERE dd.doc_id >= (mxid * 9) // 10),
       |nn AS (SELECT count(*) AS n FROM base),
       |mm AS (SELECT min(1::BIGINT << CAST(s AS INT)) AS m
       |       FROM range(1, 63) t(s), nn
       |       WHERE (1::BIGINT << CAST(s AS INT)) >= $BitsPerKey * n),
       |bp AS (
       |  SELECT $p0 AS pos FROM base, mm
       |  UNION ALL SELECT $p1 FROM base, mm
       |  UNION ALL SELECT $p2 FROM base, mm),
       |words AS (SELECT pos // 32 AS widx,
       |    bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
       |  FROM bp GROUP BY 1)""".stripMargin
  }

  /** The Spark-side salted fingerprint frame (mirrors `dd`). */
  private def fps(s: org.apache.spark.sql.SparkSession, d: String) =
    table(s, d, "documents")
      .select(col("doc_id"), portableHash64(
        when(col("doc_id") % 7 === 0, (col("doc_id") % 50).cast("string"))
          .otherwise(col("text"))).as("fp"))

  val all: Seq[Q] = Seq(

    // Per-batch-row dedup verdict with the bloom routing pinned:
    // seen corpus = first 90% of doc ids (the q182 convention), batch
    // = the rest; fp = the exact-dedup text hash. bloom_maybe is the
    // sketch's verdict, is_new the exact one; rows with bloom_maybe=0
    // NEVER touched the seen set (two-path union in the plan), and
    // the no-false-negative invariant is visible in the result as
    // "is_new=0 ⇒ bloom_maybe=1".
    Q("q188_bloom_ingest_dedup", {
      val p0 = PortableBloom.positionSql("fp", 0, "m")
      val p1 = PortableBloom.positionSql("fp", 1, "m")
      val p2 = PortableBloom.positionSql("fp", 2, "m")
      s"""WITH $bloomCtes,
         |pr AS (
         |  SELECT doc_id, fp, $p0 AS pos FROM batch, mm
         |  UNION ALL SELECT doc_id, fp, $p1 FROM batch, mm
         |  UNION ALL SELECT doc_id, fp, $p2 FROM batch, mm),
         |hits AS (SELECT p.doc_id, p.fp,
         |    sum(CASE WHEN ((coalesce(w.bits, 0) >> CAST(p.pos % 32 AS INT)) & 1) = 1
         |        THEN 1 ELSE 0 END) AS h
         |  FROM pr p LEFT JOIN words w ON p.pos // 32 = w.widx
         |  GROUP BY p.doc_id, p.fp),
         |sf AS (SELECT DISTINCT fp FROM base)
         |SELECT h.doc_id, h.fp,
         |  CAST(CASE WHEN h.h = $K THEN 1 ELSE 0 END AS INT) AS bloom_maybe,
         |  CAST(CASE WHEN s.fp IS NULL THEN 1 ELSE 0 END AS INT) AS is_new
         |FROM hits h LEFT JOIN sf s ON h.fp = s.fp""".stripMargin
    }) {
      (s, d) =>
        // Fixture salt (in `fps`): every 7th doc keys on doc_id % 50
        // instead of its text, so the batch contains TRUE duplicates
        // of the seen corpus (the harness word salad has none across
        // the 90% cut) and the is_new=0 ⇒ bloom_maybe=1 leg is live.
        val docs = fps(s, d)
        val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
        val cut = mx * 9L / 10L
        val base = docs.filter(col("doc_id") < cut)
        val batch = docs.filter(col("doc_id") >= cut)
        // Two bounded 1-row/driver scalars (the q182 discipline):
        // the corpus max id and the seen count that sizes m.
        val n = base.count()
        require(n >= 1, "q188: empty seen corpus")
        val m = PortableBloom.nextPow2(BitsPerKey * n)
        val words = PortableBloom.bitTable(base, "fp", K, m)
        val flagged = PortableBloom.withMaybe(batch, "fp", K, m, words)
        // Routing: only maybe-rows join the seen set; definite-new
        // rows are admitted by the sketch's no-false-negative
        // guarantee without touching it.
        val seenf = base.select(col("fp").as("sfp")).distinct()
        val maybes = flagged.filter(col("bloom_maybe") === 1)
          .join(seenf, col("fp") === col("sfp"), "left")
          .select(col("doc_id"), col("fp"), col("bloom_maybe"),
            when(col("sfp").isNull, 1).otherwise(0).cast("int").as("is_new"))
        val defNew = flagged.filter(col("bloom_maybe") === 0)
          .select(col("doc_id"), col("fp"), col("bloom_maybe"),
            lit(1).cast("int").as("is_new"))
        maybes.unionByName(defNew)
    },

    // STREAMING maintenance of the bloom bit table: the seen corpus
    // arrives in batches and the sketch accretes in a streaming
    // bit_or aggregate — bit_or is idempotent AND mergeable, so the
    // state is exact under any trigger pacing and bounded by m/32
    // words regardless of how many keys stream through. This is how
    // the q188 router's sketch stays warm at ingest without
    // rebuilding over the corpus; the oracle is the from-scratch bit
    // table (correct maintenance is indistinguishable from
    // recomputation — the q180/q200 discipline).
    Q("q203_stream_bloom_maintenance",
      s"""WITH $bloomCtes
         |SELECT widx, bits FROM words""".stripMargin) {
      (s, d) =>
        val docs = fps(s, d)
        val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
        val base = docs.filter(col("doc_id") < mx * 9L / 10L)
        val n = base.count()
        require(n >= 1, "q203: empty seen corpus")
        val m = PortableBloom.nextPow2(BitsPerKey * n)
        val feed = base.select(col("doc_id"),
          explode(array((0 until K).map(i =>
            PortableBloom.position(col("fp"), i, m)): _*)).as("pos"))
        val scratch = java.nio.file.Files.createTempDirectory("graft_q203")
        val staging = s"$scratch/pos"
        try {
          feed.repartitionByRange(4, col("doc_id")).write.parquet(staging)
          val stream = s.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 2).parquet(staging)
          val agg = stream
            .groupBy(expr("pos div 32").as("widx"))
            .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 32 as int)))")
              .as("bits"))
          val sinkName = "q203_stream_bloom_sink"
          s.catalog.dropTempView(sinkName)
          val q = agg.writeStream.format("memory").queryName(sinkName)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try require(q.awaitTermination(300000),
            "q203: stream did not drain within 300s — partial bit table")
          finally q.stop()
          s.table(sinkName).select(col("widx"), col("bits"))
        } finally
          org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
    }
  )
}
