package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.TextAnalysis

/** HTML/markup boilerplate extraction — step 0 of every crawl
  * pipeline (reference scope: the engine's curation chains assumed
  * pre-extracted text until round 13; these rows make extraction a
  * first-class, oracle-gated stage). The harness ships no HTML, so —
  * exactly like the multimodal family synthesizes real BMP/WAV blobs
  * from the harness tables — each document's text is wrapped in a
  * DETERMINISTIC page skeleton (title/style/script head, link-farm
  * nav, related-links aside, an optional promo line, the body in one
  * or two divs, a footer), built from shared string constants so the
  * Spark fixture and the DuckDB oracle's CTE are the same text by
  * construction.
  *
  * Scale shape: the whole family is codegen'd regex map passes — no
  * UDF, no explode, no shuffle until the declared rollups. At 100 TB
  * extraction is one linear pass over every crawled byte; the
  * argmax-by-density runs INSIDE the row (array_max over a scored
  * struct array), so "pick the main block of each of 10¹⁰ pages"
  * never materializes a per-block row set.
  */
object HtmlQueries {

  // ── The deterministic page skeleton (shared Spark/SQL constants) ──

  private val HeadA = "<html><head><title>doc "
  private val HeadB = "</title><style>body{margin:0;padding:0} " +
    "p{color:#333}</style><script>var n=42; function f(i){return n+i;}" +
    "</script></head><body><nav><a href=\"/\">home</a> " +
    "<a href=\"/docs\">docs</a> <a href=\"/about\">about</a> " +
    "<a href=\"/contact\">contact</a></nav><aside>related " +
    "<a href=\"/r1\">one</a> <a href=\"/r2\">two</a> " +
    "<a href=\"/r3\">three</a> <a href=\"/r4\">four</a></aside>"
  private val Promo = "<div class=\"promo\">subscribe to our newsletter</div>"
  private val BodyOpen = "<div class=\"body\">"
  private val Foot = "<footer>copyright 2024 corpus inc " +
    "<a href=\"/terms\">terms</a> <a href=\"/privacy\">privacy</a>" +
    "</footer></body></html>"

  /** The page for one document: even ids carry a short promo block,
    * ids divisible by 3 split their body across two divs (so density
    * selection has real work — the extractor must pick the dominant
    * half, not "the only div"). (`private[queries]`: q181 wraps the
    * frontier survivors in the same pages.) */
  private[queries] def htmlCol = {
    val promo = when(col("doc_id") % 2 === 0, lit(Promo)).otherwise(lit(""))
    val body = when(col("doc_id") % 3 === 0,
      concat(lit(BodyOpen), col("text").substr(lit(1), lit(80)),
        lit("</div>" + BodyOpen),
        col("text").substr(lit(81), greatest(length(col("text")) - 80, lit(0))),
        lit("</div>")))
      .otherwise(concat(lit(BodyOpen), col("text"), lit("</div>")))
    concat(lit(HeadA), col("doc_id").cast("string"), lit(HeadB),
      promo, body, lit(Foot))
  }

  /** The identical page as a SQL CTE over a (doc_id, source, text)
    * relation — parameterized so q181 can build pages over the
    * frontier survivors instead of raw `documents`. */
  private[queries] def hxCteOver(src: String): String =
    s"""hx AS (
       |  SELECT doc_id, source,
       |    '$HeadA' || CAST(doc_id AS VARCHAR) || '$HeadB' ||
       |    CASE WHEN doc_id % 2 = 0 THEN '$Promo' ELSE '' END ||
       |    CASE WHEN doc_id % 3 = 0
       |         THEN '$BodyOpen' || substr(text, 1, 80) || '</div>$BodyOpen' ||
       |              substr(text, 81, greatest(length(text) - 80, 0)) || '</div>'
       |         ELSE '$BodyOpen' || text || '</div>' END ||
       |    '$Foot' AS html
       |  FROM $src)""".stripMargin

  /** Shared extraction CTEs: block list per page, per-block text and
    * integer density, and the per-page argmax (`best`). Mirrors
    * [[graft.ops.TextAnalysis.mainBlockStruct]] stage for stage. */
  private[queries] def extractCtesOver(src: String): String =
    s"""${hxCteOver(src)},
       |ns AS (
       |  SELECT doc_id, source,
       |         regexp_replace(regexp_replace(html,
       |           '${TextAnalysis.ScriptStyleRe}', ' ', 'g'),
       |           '${TextAnalysis.HtmlCommentRe}', ' ', 'g') AS h2
       |  FROM hx),
       |bl AS (
       |  SELECT doc_id, source,
       |         regexp_extract_all(h2, '${TextAnalysis.BlockRe}', 1) AS blocks
       |  FROM ns),
       |blk AS (
       |  SELECT doc_id, i, blocks[CAST(i AS INT)] AS raw
       |  FROM bl, unnest(generate_series(1, len(blocks))) AS g(i)),
       |sc AS (
       |  SELECT doc_id, i, raw,
       |         trim(regexp_replace(regexp_replace(raw,
       |           '${TextAnalysis.TagRe}', ' ', 'g'), ' +', ' ', 'g')) AS txt
       |  FROM blk),
       |scored AS (
       |  SELECT doc_id, i, txt,
       |         (CAST(length(txt) AS BIGINT) * length(txt) * 1000)
       |           // (length(raw) + 1) AS s
       |  FROM sc),
       |best AS (
       |  SELECT doc_id, txt, s FROM (
       |    SELECT doc_id, txt, s,
       |           row_number() OVER (PARTITION BY doc_id
       |             ORDER BY s DESC, i) AS rn
       |    FROM scored) WHERE rn = 1)""".stripMargin

  /** The q169/q170 instantiation: pages over raw `documents`. */
  private val extractCtes: String = extractCtesOver("documents")

  val all: Seq[Q] = Seq(

    // Markup stripping + main-content selection, both oracle-gated on
    // every page: n_blocks pins the block segmentation, page_text
    // pins the tag/script/style stripper, (main_text, density) pin
    // the integer text-density argmax. One codegen'd map pass per
    // page — the plan is a parquet scan and a projection, nothing
    // else (PlanSpec pins no exchange before the sink).
    Q("q169_html_extract",
      s"""WITH $extractCtes
         |SELECT bl.doc_id,
         |       CAST(len(bl.blocks) AS BIGINT) AS n_blocks,
         |       best.txt AS main_text,
         |       CAST(best.s AS BIGINT) AS density,
         |       trim(regexp_replace(regexp_replace(regexp_replace(
         |         regexp_replace(hx.html, '${TextAnalysis.ScriptStyleRe}', ' ', 'g'),
         |         '${TextAnalysis.HtmlCommentRe}', ' ', 'g'),
         |         '${TextAnalysis.TagRe}', ' ', 'g'), ' +', ' ', 'g')) AS page_text
         |FROM bl JOIN best USING (doc_id) JOIN hx USING (doc_id)""".stripMargin) {
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"), htmlCol.as("html"))
          .select(col("doc_id"), col("html"),
            TextAnalysis.mainBlockStruct(col("html")).as("__b"))
          .select(col("doc_id"),
            size(TextAnalysis.blockContents(col("html"))).cast("long")
              .as("n_blocks"),
            col("__b").getField("t").as("main_text"),
            col("__b").getField("s").as("density"),
            TextAnalysis.pageText(col("html")).as("page_text"))
    },

    // The crawl-curation composition: raw pages → main-text
    // extraction → token-count quality gate → exact dedup on the
    // EXTRACTED text (keep lowest doc id, count copies) — the step-0
    // chain that feeds everything downstream (the q145-style gates
    // dedup what this emits). The dedup keys on extracted text, so
    // two pages differing only in boilerplate (same body, different
    // promo/nav) collapse — exactly what raw-page hashing misses.
    // Scale shape: one extraction map pass, one hash aggregate on the
    // text key; no window, no self-join.
    Q("q170_crawl_curate",
      s"""WITH $extractCtes,
         |g AS (
         |  SELECT best.doc_id, d.source, best.txt,
         |         len(string_split(best.txt, ' ')) AS n_tok
         |  FROM best JOIN documents d USING (doc_id)
         |  WHERE len(string_split(best.txt, ' ')) >= 20),
         |k AS (
         |  SELECT txt, min(doc_id) AS doc_id,
         |         CAST(count(*) AS BIGINT) AS n_copies
         |  FROM g GROUP BY txt)
         |SELECT k.doc_id, g.source,
         |       CAST(len(string_split(k.txt, ' ')) AS BIGINT) AS n_tok,
         |       k.n_copies
         |FROM k JOIN g ON g.doc_id = k.doc_id""".stripMargin) {
      (s, d) =>
        val ext = table(s, d, "documents")
          .select(col("doc_id"), col("source"), htmlCol.as("html"))
          .select(col("doc_id"), col("source"),
            TextAnalysis.mainText(col("html")).as("main_text"))
        val gated = ext.filter(size(split(col("main_text"), " ")) >= 20)
        gated.groupBy(col("main_text"))
          .agg(min(struct(col("doc_id"), col("source"))).as("__k"),
            count(lit(1)).as("n_copies"))
          .select(col("__k").getField("doc_id").as("doc_id"),
            col("__k").getField("source").as("source"),
            size(split(col("main_text"), " ")).cast("long").as("n_tok"),
            col("n_copies"))
    },

    // The FULL crawl pipeline, end to end — every step-0 stage this
    // engine grew in r13, composed in production order over one
    // corpus: URL canonicalization + frontier dedup (fetch each
    // canonical target once: min-id survivor per canon), page fixture
    // + main-text extraction (q169's density argmax), line-level
    // corpus-boilerplate removal at the corpus-fraction threshold
    // computed over the SURVIVING corpus (q173's rule — the df
    // denominator is what the frontier kept, not what was crawled),
    // NFC normalization, token-count quality gate, and exact dedup on
    // the cleaned text (min-id survivor, copy count). The oracle is
    // the same composition assembled from each stage's already-gated
    // CTEs (urlCtes / extractCtesOver / lineCtesOver), so the chain
    // is pinned stage-for-stage, not just end-to-end. Scale shape:
    // three map passes (canon, page+extract, re-line), three hash
    // aggregates (frontier min, line df, final dedup), one bounded
    // boilerplate join — no window over the corpus, no self-join, no
    // explode except the line stage's ~50 rows/doc.
    Q("q181_crawl_pipeline_v5",
      s"""WITH ${UrlQueries.urlCtes},
         |w AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY canon),
         |s1 AS (
         |  SELECT d.doc_id, d.source, d.text
         |  FROM documents d JOIN w USING (doc_id)),
         |${extractCtesOver("s1")},
         |e1 AS (
         |  SELECT best.doc_id, s1.source, best.txt AS text
         |  FROM best JOIN s1 USING (doc_id)),
         |${LineDedupQueries.lineCtesOver("e1")},
         |b AS (SELECT line FROM dfreq, nd
         |      WHERE df * ${LineDedupQueries.DfDenom} > n),
         |c2 AS (
         |  SELECT l.doc_id,
         |         coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
         |                    FILTER (WHERE b.line IS NULL), '') AS tclean
         |  FROM l LEFT JOIN b ON l.line = b.line
         |  GROUP BY l.doc_id),
         |g AS (
         |  SELECT c2.doc_id, e1.source,
         |         nfc_normalize(replace(c2.tclean, chr(10), ' ')) AS t
         |  FROM c2 JOIN e1 USING (doc_id)
         |  WHERE len(string_split(
         |          nfc_normalize(replace(c2.tclean, chr(10), ' ')), ' ')) >= 20),
         |k AS (
         |  SELECT t, min(doc_id) AS doc_id,
         |         CAST(count(*) AS BIGINT) AS n_copies
         |  FROM g GROUP BY t)
         |SELECT k.doc_id, g.source,
         |       CAST(len(string_split(k.t, ' ')) AS BIGINT) AS n_tok,
         |       k.n_copies
         |FROM k JOIN g ON g.doc_id = k.doc_id""".stripMargin) {
      (s, d) =>
        import graft.functions.UnicodeExpressions.nfc
        val docs = table(s, d, "documents")
        // 1. frontier: one fetch per canonical URL (min-id survivor)
        val keep = docs
          .select(col("doc_id"),
            graft.ops.Url.canonicalizeUrl(UrlQueries.urlCol).as("canon"))
          .groupBy("canon").agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        val s1 = docs.join(keep, Seq("doc_id"), "left_semi")
        // 2. pages → main-text extraction
        val ext = s1.select(col("doc_id"), col("source"), htmlCol.as("html"))
          .select(col("doc_id"), col("source"),
            TextAnalysis.mainText(col("html")).as("text"))
        // 3. line-level boilerplate removal over the surviving corpus
        val cleaned = LineDedupQueries.cleanLines(
          ext.select(col("doc_id"), LineDedupQueries.linedCol.as("t")))
        // 4. NFC + token gate; 5. exact dedup on cleaned text
        val gated = cleaned.join(ext.select("doc_id", "source"), "doc_id")
          .select(col("doc_id"), col("source"),
            nfc(regexp_replace(col("text_clean"), "\n", " ")).as("t"))
          .filter(size(split(col("t"), " ")) >= 20)
        gated.groupBy("t")
          .agg(min(struct(col("doc_id"), col("source"))).as("__k"),
            count(lit(1)).as("n_copies"))
          .select(col("__k").getField("doc_id").as("doc_id"),
            col("__k").getField("source").as("source"),
            size(split(col("t"), " ")).cast("long").as("n_tok"),
            col("n_copies"))
    }
  )
}
