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
    * half, not "the only div"). */
  private def htmlCol = {
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

  /** The identical page as a SQL CTE over `documents`. */
  private val hxCte: String =
    s"""hx AS (
       |  SELECT doc_id, source,
       |    '$HeadA' || CAST(doc_id AS VARCHAR) || '$HeadB' ||
       |    CASE WHEN doc_id % 2 = 0 THEN '$Promo' ELSE '' END ||
       |    CASE WHEN doc_id % 3 = 0
       |         THEN '$BodyOpen' || substr(text, 1, 80) || '</div>$BodyOpen' ||
       |              substr(text, 81, greatest(length(text) - 80, 0)) || '</div>'
       |         ELSE '$BodyOpen' || text || '</div>' END ||
       |    '$Foot' AS html
       |  FROM documents)""".stripMargin

  /** Shared extraction CTEs: block list per page, per-block text and
    * integer density, and the per-page argmax (`best`). Mirrors
    * [[graft.ops.TextAnalysis.mainBlockStruct]] stage for stage. */
  private val extractCtes: String =
    s"""$hxCte,
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
    }
  )
}
