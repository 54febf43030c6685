package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table

/** LINE-level corpus dedup — the CCNet/RefinedWeb boilerplate-removal
  * stage (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data"): a line that recurs across many
  * DOCUMENTS (cookie banners, nav text, copyright footers) is crawl
  * boilerplate, not content, and is dropped from every document while
  * each document's unique lines survive in order. Distinct from the
  * engine's document-level (q30/q31) and span-level (q79/q106)
  * families: the unit is the physical line, and the duplication
  * signal is corpus-wide document frequency, not within-doc structure.
  *
  * The harness corpus is single-line word salad, so — the HtmlQueries
  * fixture discipline — each document is deterministically re-lined
  * (every 10th space becomes a newline) and salted with two shared
  * boilerplate lines: a cookie banner (even ids, first line) and a
  * copyright footer (ids divisible by 3, last line). Both engines
  * build the identical fixture from shared string constants.
  *
  * Scale shape at 100 TB: one explode to (doc, pos, line) — ~50 rows
  * per document, the same fan-out class as the shingle index — then
  * the document-frequency aggregate. `count(DISTINCT doc_id)` plans as
  * the two-phase distinct aggregate: the first exchange keys by
  * (line, doc_id), so a boilerplate line present in 10⁹ documents
  * spreads across every reducer instead of hammering one (the salting
  * the q111 count joins do by hand, here for free from the distinct
  * rewrite); the second phase counts the already-deduped pairs. The
  * boilerplate line set joins back by line key — a few thousand rows
  * in any real crawl (AQE broadcasts it), never all-pairs — and the
  * reassembly is one partial-aggregated groupBy(doc). The threshold
  * is a FRACTION of the corpus (df·20 > n: strictly above 5% of
  * documents), not an absolute count, so the operator's semantics are
  * corpus-size-invariant — an absolute cutoff would silently stop
  * firing at 100× the documents. */
object LineDedupQueries {

  /** Boilerplate fixture lines (shared Spark/SQL constants). */
  private val Cookie = "accept all cookies to continue browsing this site"
  private val Footer = "copyright corpus inc all rights reserved"

  /** A line is boilerplate iff df · DfDenom > n_docs (df strictly
    * above 1/DfDenom of the corpus) — integer-exact in both engines. */
  private[queries] val DfDenom = 20L

  /** The q173/q174/q180 instantiation: lines over raw `documents`. */
  private lazy val lineCtes: String = lineCtesOver("documents")

  /** The removal pass over a (doc_id, t) frame of re-lined text:
    * per-doc (n_lines, n_kept, text_clean) with corpus-boilerplate
    * lines (df · [[DfDenom]] > n) removed, order preserved — the
    * Spark leg q174 declares and q181's pipeline reuses. One explode,
    * one line-frequency aggregate (two-phase distinct), one key join
    * against the bounded boilerplate set, one groupBy reassembly via
    * sort_array — no window, no second explode. */
  private[queries] def cleanLines(lined: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val lines = lined.select(col("doc_id"),
      posexplode(split(col("t"), "\n")).as(Seq("pos", "line")))
    val nd = lined.agg(count(lit(1)).as("n"))
    val boiler = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") * DfDenom > col("n"))
      .select(col("line"), lit(1).as("__boiler"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("__boiler").isNull, 1)).as("n_kept"),
        coalesce(
          array_join(
            transform(
              filter(
                sort_array(collect_list(when(col("__boiler").isNull,
                  struct(col("pos"), col("line"))))),
                x => x.isNotNull),
              x => x.getField("line")),
            "\n"),
          lit("")).as("text_clean"))
  }

  /** Re-line the document: every 10th space → newline (one global
    * regex pass; Java and RE2 agree on this pattern), then the salted
    * boilerplate lines. (`private[queries]`: q181's pipeline applies
    * the same re-lining to its extracted text.) */
  private[queries] def linedCol = {
    val base = regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n")
    val withCookie = when(col("doc_id") % 2 === 0,
      concat(lit(Cookie + "\n"), base)).otherwise(base)
    when(col("doc_id") % 3 === 0,
      concat(withCookie, lit("\n" + Footer))).otherwise(withCookie)
  }

  /** The identical fixture + explode as SQL CTEs over a (doc_id,
    * source, text) relation: `lx` = (doc_id, source, t), `l` =
    * (doc_id, pos, line), `dfreq` = per-line document frequency,
    * `nd` = corpus size. Parameterized so q181 can run the line
    * stage over its extracted survivors. */
  private[queries] def lineCtesOver(src: String): String =
    s"""lx AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 3 = 0 THEN x || chr(10) || '$Footer' ELSE x END AS t
       |  FROM (
       |    SELECT doc_id, source,
       |      CASE WHEN doc_id % 2 = 0 THEN '$Cookie' || chr(10) || y ELSE y END AS x
       |    FROM (
       |      SELECT doc_id, source,
       |        regexp_replace(text, '((\\S+ ){9}\\S+) ', '\\1' || chr(10), 'g') AS y
       |      FROM $src))),
       |l AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, ln[CAST(i AS INT)] AS line
       |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ln FROM lx),
       |       unnest(generate_series(1, len(ln))) AS g(i)),
       |dfreq AS (
       |  SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM l GROUP BY line),
       |nd AS (SELECT count(*) AS n FROM lx)""".stripMargin

  val all: Seq[Q] = Seq(

    // The corpus line-frequency profile: which lines are boilerplate,
    // and how widespread. This is the diagnostic a curation run reads
    // before committing a removal threshold (CCNet's "duplicated
    // paragraphs" report) — and the aggregate whose result q174
    // consumes. The two salted lines must surface (df = n/2 and n/3);
    // genuine text lines stay far under the 5% fraction unless the
    // corpus's own exact-duplicate documents push one over — in which
    // case removing it is the correct call, which is the point.
    Q("q173_line_boilerplate",
      s"""WITH $lineCtes
         |SELECT line, df FROM dfreq, nd WHERE df * $DfDenom > n""".stripMargin) {
      (s, d) =>
        val lined = table(s, d, "documents")
          .select(col("doc_id"), linedCol.as("t"))
        val lines = lined.select(col("doc_id"),
          posexplode(split(col("t"), "\n")).as(Seq("pos", "line")))
        val dfreq = lines.groupBy("line")
          .agg(countDistinct(col("doc_id")).as("df"))
        val nd = lined.agg(count(lit(1)).as("n"))
        dfreq.crossJoin(broadcast(nd))
          .filter(col("df") * DfDenom > col("n"))
          .select(col("line"), col("df"))
    },

    // The removal pass: every document reassembled without its
    // boilerplate lines, order preserved, with the per-doc line
    // ledger (n_lines kept for audit — a doc that loses most of its
    // lines to boilerplate is itself a quality signal downstream
    // gates can read). Lines join the boilerplate set by key (anti
    // semantics via a null-flag left join so ONE pass computes both
    // the counts and the cleaned text), then one groupBy(doc)
    // reassembles via sort_array over (pos, line) structs — no
    // window, no second explode.
    Q("q174_line_dedup_clean",
      s"""WITH $lineCtes,
         |b AS (SELECT line FROM dfreq, nd WHERE df * $DfDenom > n)
         |SELECT l.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(count(*) FILTER (WHERE b.line IS NULL) AS BIGINT) AS n_kept,
         |       coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
         |                  FILTER (WHERE b.line IS NULL), '') AS text_clean
         |FROM l LEFT JOIN b ON l.line = b.line
         |GROUP BY l.doc_id""".stripMargin) {
      (s, d) =>
        cleanLines(table(s, d, "documents")
          .select(col("doc_id"), linedCol.as("t")))
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            col("text_clean"))
    },

    // STREAMING maintenance of the line-frequency profile: the
    // corpus arrives in batches (maxFilesPerTrigger-paced file
    // stream), the per-line document frequency accretes in a
    // streaming aggregate, and the boilerplate set is read off the
    // final state — hash-matching q173's from-scratch batch answer
    // (the q166/q137 stream==batch discipline). Streaming
    // aggregations cannot hold COUNT(DISTINCT) state, so the feed is
    // the DISTINCT (doc_id, line) pairs — deduped batch-side at
    // ingest, exactly where production dedups them — and the
    // streaming state is then a plain additive count per line:
    // bounded by the distinct-line count, mergeable across any
    // trigger pacing. Oracle: identical text to q173 (correct
    // maintenance is indistinguishable from recomputation).
    Q("q180_stream_line_stats",
      s"""WITH $lineCtes
         |SELECT line, df FROM dfreq, nd WHERE df * $DfDenom > n""".stripMargin) {
      (s, d) =>
        val lined = table(s, d, "documents")
          .select(col("doc_id"), linedCol.as("t"))
        val pairs = lined.select(col("doc_id"),
            explode(split(col("t"), "\n")).as("line"))
          .distinct()
        val n = lined.count()
        val scratch = java.nio.file.Files.createTempDirectory("graft_q180")
        val staging = s"$scratch/pairs"
        pairs.repartitionByRange(4, col("doc_id")).write.parquet(staging)
        val stream = s.readStream.schema(pairs.schema)
          .option("maxFilesPerTrigger", 2).parquet(staging)
        val agg = stream.groupBy(col("line"))
          .agg(count(lit(1)).as("df"))
        val sinkName = "q180_stream_line_sink"
        s.catalog.dropTempView(sinkName)
        try {
          val q = agg.writeStream.format("memory").queryName(sinkName)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try require(q.awaitTermination(300000),
            "q180: stream did not drain within 300s — partial line stats")
          finally q.stop()
        } finally
          org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
        s.table(sinkName)
          .filter(col("df") * DfDenom > lit(n))
          .select(col("line"), col("df"))
    },

    // INCREMENTAL maintenance of the line-frequency profile (the
    // q167/q73 lagged-update discipline): the existing corpus's line
    // stats are a persisted table (modeled here as the stats over the
    // first 90% of doc ids); a new document batch arrives, and the
    // update computes line counts over ONLY the batch, then MERGES by
    // addition — exact, because per-line document frequency is
    // additive over disjoint document sets (the within-doc dedup is
    // per-document). Steady-state cost is ∝ batch, not corpus: the
    // only full-corpus artifact touched is the stats table itself
    // (a full-outer key merge — in production a MERGE INTO). Oracle:
    // the from-scratch q173 text verbatim — correct incremental
    // maintenance is indistinguishable from recomputing the world.
    Q("q182_line_stats_incremental",
      s"""WITH $lineCtes
         |SELECT line, df FROM dfreq, nd WHERE df * $DfDenom > n""".stripMargin) {
      (s, d) =>
        val lined = table(s, d, "documents")
          .select(col("doc_id"), linedCol.as("t"))
        val mx = lined.agg(max(col("doc_id"))).collect()(0).getLong(0)
        val cut = (mx * 9L) / 10L
        val pairs = lined.select(col("doc_id"),
            explode(split(col("t"), "\n")).as("line"))
          .distinct()
        val baseDf = pairs.filter(col("doc_id") < cut)
          .groupBy("line").agg(count(lit(1)).as("df_b"))
        val batchDf = pairs.filter(col("doc_id") >= cut)
          .groupBy("line").agg(count(lit(1)).as("df_n"))
        val merged = baseDf.join(batchDf, Seq("line"), "full")
          .select(col("line"),
            (coalesce(col("df_b"), lit(0L)) +
             coalesce(col("df_n"), lit(0L))).as("df"))
        val nd = lined.agg(count(lit(1)).as("n"))
        merged.crossJoin(broadcast(nd))
          .filter(col("df") * DfDenom > col("n"))
          .select(col("line"), col("df"))
    }
  )
}
