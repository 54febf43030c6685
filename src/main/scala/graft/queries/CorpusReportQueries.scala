package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.{Dedup, TextAnalysis}

/** Corpus release reporting and denoising-objective sample prep —
  * the two bookends of a training-data pipeline: the per-source
  * datasheet a corpus release ships (counts every consumer audits
  * before training), and the T5-style span-corruption pairs the
  * pretraining job reads.
  */
object CorpusReportQueries {

  val all: Seq[Q] = Seq(

    // The corpus DATASHEET: one row per source with the release
    // ledger — document count, exact-unique texts (the dedup
    // headroom), total whitespace tokens (the budget currency every
    // q62/q164 allocation speaks), quality-gate pass count (q35's
    // gate in its integer-exact form), distinct languages. One hash
    // aggregate; the distinct counts plan as two-phase distinct
    // aggregates (first exchange keyed by (source, text) — a source
    // with 10⁹ identical docs spreads across reducers). At 100 TB
    // this is the whole-corpus summary scan: one pass, no joins.
    Q("q178_corpus_datasheet",
      s"""SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
         |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tok,
         |  CAST(sum(CASE WHEN len(string_split(text,' ')) BETWEEN 20 AND 200
         |        AND len(list_filter(string_split(text,' '),
         |              w -> w IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")}))) * 5
         |            <= len(string_split(text,' ')) * 2
         |       THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM documents GROUP BY source""".stripMargin) {
      (s, d) =>
        val ws = Dedup.tokens(col("text"))
        val stopCnt = TextAnalysis.stopwordCount(ws)
        table(s, d, "documents")
          .select(col("source"), col("text"), col("lang"),
            size(ws).cast("bigint").as("n_tok"),
            when(size(ws).between(20, 200) &&
                 stopCnt * 5 <= size(ws) * 2, 1L).otherwise(0L).as("is_q"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("text")).as("n_unique"),
            sum(col("n_tok")).as("n_tok"),
            sum(col("is_q")).as("n_quality"),
            countDistinct(col("lang")).as("n_langs"))
    },

    // T5-style SPAN CORRUPTION (Raffel et al., "Exploring the Limits
    // of Transfer Learning..."): ~15% of each document's tokens drop
    // out in 3-token spans; the input keeps one sentinel <x_k> per
    // span, the target lists each sentinel followed by the tokens it
    // hides. Span placement is DETERMINISTIC (position p corrupted
    // iff (p + doc_id%20) % 20 < 3 — a per-doc phase instead of an
    // RNG stream no two engines would share; spans can never overlap
    // by construction, and the doc's last span may run short). The
    // whole pair builds inside the row as transform/filter lambdas
    // over the token array — a pure map pass over 10¹⁰ documents, no
    // explode, no shuffle, no UDF. Spark lambda indexes are 0-based,
    // DuckDB's 1-based: the oracle shifts by one, pinned here.
    Q("q179_span_corruption",
      """SELECT doc_id,
        |  coalesce(array_to_string(list_filter(list_transform(ws, (w, i) ->
        |    CASE WHEN (i - 1 + off) % 20 >= 3 THEN w
        |         WHEN (i - 1 + off) % 20 = 0
        |           THEN '<x_' || CAST((i - 1 + off) // 20 AS VARCHAR) || '>'
        |         ELSE NULL END), x -> x IS NOT NULL), ' '), '') AS input_text,
        |  -- array_to_string([]) is NULL in DuckDB; Spark's array_join is ''
        |  coalesce(array_to_string(list_filter(list_transform(ws, (w, i) ->
        |    CASE WHEN (i - 1 + off) % 20 >= 3 THEN NULL
        |         WHEN (i - 1 + off) % 20 = 0
        |           THEN '<x_' || CAST((i - 1 + off) // 20 AS VARCHAR) || '> ' || w
        |         ELSE w END), x -> x IS NOT NULL), ' '), '') AS target_text,
        |  CAST(len(list_filter(list_transform(ws, (w, i) ->
        |    CASE WHEN (i - 1 + off) % 20 < 3 THEN w ELSE NULL END),
        |    x -> x IS NOT NULL)) AS BIGINT) AS n_corrupt
        |FROM (SELECT doc_id, string_split(text,' ') AS ws, doc_id % 20 AS off
        |      FROM documents)""".stripMargin) {
      (s, d) =>
        val base = table(s, d, "documents")
          .select(col("doc_id"), Dedup.tokens(col("text")).as("ws"),
            (col("doc_id") % 20).as("off"))
        def phase(i: org.apache.spark.sql.Column) = (i + col("off")) % 20
        def spanK(i: org.apache.spark.sql.Column) =
          floor((i + col("off")) / lit(20)).cast("long")
        def sentinel(i: org.apache.spark.sql.Column) =
          concat(lit("<x_"), spanK(i), lit(">"))
        base.select(col("doc_id"),
          array_join(filter(
            transform(col("ws"), (w, i) =>
              when(phase(i) >= 3, w)
                .when(phase(i) === 0, sentinel(i))
                .otherwise(lit(null))),
            x => x.isNotNull), " ").as("input_text"),
          array_join(filter(
            transform(col("ws"), (w, i) =>
              when(phase(i) >= 3, lit(null))
                .when(phase(i) === 0, concat(sentinel(i), lit(" "), w))
                .otherwise(w)),
            x => x.isNotNull), " ").as("target_text"),
          size(filter(
            transform(col("ws"), (w, i) =>
              when(phase(i) < 3, w).otherwise(lit(null))),
            x => x.isNotNull)).cast("bigint").as("n_corrupt"))
    },

    // EXACT length-percentile trim (P5/P95 by token count) WITHOUT a
    // global sort: token counts have a bounded integer domain, so the
    // exact distribution is a histogram (one partial-aggregated
    // groupBy over ≤ max-doc-tokens distinct values) and the
    // percentile boundary is a prefix-sum over that BOUNDED frame —
    // the only single-partition stage touches the histogram, never
    // the corpus. The trim itself is then a map-pass filter against
    // two 1-row broadcasts. This is how "drop the length tails before
    // training" stays exact at 100 TB — quantile_approx would be
    // neither exact nor oracle-pinnable, and a global ORDER BY to
    // find P5 would sort 10¹⁰ rows to read two of them.
    // Boundary definition (integer-exact in both engines): pXX = the
    // smallest token count whose cumulative doc count reaches
    // ceil(XX% of n), i.e. min v with cum(v)·20 ≥ n (P5) / ≥ 19n (P95).
    Q("q189_percentile_trim",
      """WITH tok AS (SELECT doc_id, source,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS tok FROM documents),
        |hist AS (SELECT tok AS v, count(*) AS c FROM tok GROUP BY 1),
        |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM hist),
        |nn AS (SELECT count(*) AS n FROM tok),
        |lo AS (SELECT CAST(min(v) AS BIGINT) AS p05_tok FROM cum, nn WHERE cum * 20 >= n),
        |hi AS (SELECT CAST(min(v) AS BIGINT) AS p95_tok FROM cum, nn WHERE cum * 20 >= 19 * n)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN tok BETWEEN p05_tok AND p95_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  p05_tok, p95_tok
        |FROM tok, lo, hi GROUP BY source, p05_tok, p95_tok""".stripMargin) {
      (s, d) =>
        val docs = table(s, d, "documents").select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        val hist = docs.groupBy(col("tok").as("v")).agg(count(lit(1)).as("c"))
        // Single-partition window over the HISTOGRAM — bounded by the
        // token-count domain (≤ max doc length rows), not the corpus.
        val cum = hist.withColumn("cum",
          sum("c").over(org.apache.spark.sql.expressions.Window.orderBy("v")))
        val nd = docs.agg(count(lit(1)).as("n"))
        val cn = cum.crossJoin(broadcast(nd))
        val lo = cn.filter(col("cum") * 20 >= col("n"))
          .agg(min("v").as("p05_tok"))
        val hi = cn.filter(col("cum") * 20 >= col("n") * 19)
          .agg(min("v").as("p95_tok"))
        docs.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
          .groupBy("source", "p05_tok", "p95_tok")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("tok").between(col("p05_tok"), col("p95_tok")), 1L)
              .otherwise(0L)).as("n_kept"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            col("p05_tok"), col("p95_tok"))
    },

    // Corpus-generation DIFF: the release audit between two corpus
    // versions — which documents were added, removed, or changed
    // (same id, different text). One full-outer equi join on the id,
    // comparing exact-dedup fingerprints rather than full texts (at
    // 100 TB the diff reads two fingerprint columns, not 2×100 TB of
    // text; both generations' stores already carry the hash). A
    // bucketed-by-id table layout makes this join co-located — the
    // TableStore generation discipline — but the semantics need only
    // the join. Fixture: the "previous" generation is derived from
    // the corpus deterministically — every 17th doc missing (added
    // since), every 13th doc carrying an older text (changed), and a
    // shifted-id tail the new generation dropped (removed).
    Q("q193_corpus_diff", {
      val fp = (e: String) => LlmQueries.h64(e)
      s"""WITH g1 AS (
         |  SELECT doc_id, ${fp("CASE WHEN doc_id % 13 = 0 THEN 'OLD ' || text ELSE text END")} AS fp1
         |  FROM documents WHERE doc_id % 17 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000000, ${fp("text")} FROM documents WHERE doc_id % 19 = 0),
         |g2 AS (SELECT doc_id, ${fp("text")} AS fp2 FROM documents)
         |SELECT coalesce(g2.doc_id, g1.doc_id) AS doc_id,
         |  CASE WHEN g1.doc_id IS NULL THEN 'added'
         |       WHEN g2.doc_id IS NULL THEN 'removed'
         |       WHEN fp1 <> fp2 THEN 'changed'
         |       ELSE 'unchanged' END AS verdict
         |FROM g1 FULL OUTER JOIN g2 ON g1.doc_id = g2.doc_id""".stripMargin
    }) {
      (s, d) =>
        import graft.functions.Functions.portableHash64
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val g1 = docs.filter(col("doc_id") % 17 =!= 0)
          .select(col("doc_id"), portableHash64(
            when(col("doc_id") % 13 === 0, concat(lit("OLD "), col("text")))
              .otherwise(col("text"))).as("fp1"))
          .unionByName(docs.filter(col("doc_id") % 19 === 0)
            .select((col("doc_id") + 1000000000L).as("doc_id"),
              portableHash64(col("text")).as("fp1")))
        val g2 = docs.select(col("doc_id").as("doc_id2"),
          portableHash64(col("text")).as("fp2"))
        g1.join(g2, col("doc_id") === col("doc_id2"), "full")
          .select(
            coalesce(col("doc_id2"), col("doc_id")).as("doc_id"),
            when(col("fp1").isNull, "added")
              .when(col("fp2").isNull, "removed")
              .when(col("fp1") =!= col("fp2"), "changed")
              .otherwise("unchanged").as("verdict"))
    },

    // Cross-source OVERLAP MATRIX: for every source pair, how many
    // distinct texts they share — the provenance diagnostic behind
    // "which feeds are re-crawling each other" and the input to
    // source-priority dedup. Scale shape: NEVER the (fp, source)
    // self-join (a boilerplate text in 10⁹ docs across two sources
    // would quadratically explode exactly there); instead one groupBy
    // per text key collecting the DISTINCT source set — bounded by
    // the source count, a release-grain constant — then in-array pair
    // expansion and one count per pair. Fixture: the harness corpus
    // has zero natural cross-source dups, so every 9th-mod doc keys
    // on a shared constant (the q188 salt discipline).
    Q("q197_source_overlap",
      """WITH k AS (SELECT DISTINCT
        |    CASE WHEN doc_id % 9 < 2 THEN 'shared-' || CAST(doc_id % 35 AS VARCHAR)
        |         ELSE text END AS key,
        |    source
        |  FROM documents),
        |p AS (SELECT a.key, a.source AS src_a, b.source AS src_b
        |      FROM k a JOIN k b ON a.key = b.key AND a.source < b.source)
        |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM p GROUP BY src_a, src_b""".stripMargin) {
      (s, d) =>
        val keyed = table(s, d, "documents")
          .select(
            when(col("doc_id") % 9 < 2,
              concat(lit("shared-"), (col("doc_id") % 35).cast("string")))
              .otherwise(col("text")).as("key"),
            col("source"))
          .distinct()
        val sets = keyed.groupBy("key")
          .agg(sort_array(collect_set(col("source"))).as("ss"))
          .filter(size(col("ss")) > 1)
        sets.select(explode(flatten(transform(
            sequence(lit(1), size(col("ss")) - 1),
            i => transform(sequence(i + 1, size(col("ss"))),
              j => struct(
                element_at(col("ss"), i).as("src_a"),
                element_at(col("ss"), j).as("src_b")))))).as("pair"))
          .groupBy(col("pair.src_a").as("src_a"), col("pair.src_b").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
    },

    // Vocabulary HEAD audit: the corpus's top-20 words by exact
    // frequency with their corpus share in ppm — the Zipf-head report
    // a tokenizer-training or stopword decision reads. Deterministic
    // under ties (count desc, word asc), so the LIMIT is exact. Plan:
    // one partial-aggregated word count and a TakeOrdered(20) — no
    // global sort materializes.
    Q("q198_vocab_head",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |cnt AS (SELECT word, count(*) AS n FROM w GROUP BY word),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt)
        |SELECT word, CAST(n AS BIGINT) AS n,
        |       CAST(n * 1000000 // t AS BIGINT) AS share_ppm
        |FROM cnt, tot ORDER BY n DESC, word LIMIT 20""".stripMargin) {
      (s, d) =>
        val cnt = table(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n"))
        val tot = cnt.agg(sum(col("n")).cast("long").as("t"))
        cnt.crossJoin(broadcast(tot))
          .select(col("word"), col("n"),
            expr("n * 1000000 div t").as("share_ppm"))
          .orderBy(col("n").desc, col("word").asc)
          .limit(20)
    },

    // STREAMING maintenance of the length histogram — q189's exact
    // percentile state kept warm as the corpus arrives (the
    // q180/q166 stream==batch discipline): token counts stream in, a
    // streaming aggregate accretes per-value counts, and the final
    // state IS the bounded-domain histogram q189's boundary read-off
    // consumes. State is bounded by the token-count domain (never the
    // corpus), additive under any trigger pacing, and the oracle is
    // the from-scratch histogram — correct maintenance is
    // indistinguishable from recomputation.
    Q("q200_stream_length_stats",
      """SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
        |       CAST(count(*) AS BIGINT) AS c
        |FROM documents GROUP BY 1""".stripMargin) {
      (s, d) =>
        val feed = table(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("v"))
        val scratch = java.nio.file.Files.createTempDirectory("graft_q200")
        val staging = s"$scratch/toks"
        try {
          feed.repartitionByRange(4, col("doc_id")).write.parquet(staging)
          val stream = s.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 2).parquet(staging)
          val agg = stream.groupBy(col("v")).agg(count(lit(1)).as("c"))
          val sinkName = "q200_stream_length_sink"
          s.catalog.dropTempView(sinkName)
          val q = agg.writeStream.format("memory").queryName(sinkName)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try require(q.awaitTermination(300000),
            "q200: stream did not drain within 300s — partial histogram")
          finally q.stop()
          s.table(sinkName).select(col("v"), col("c"))
        } finally
          org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
    }
  )
}
