package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.ops.QualityFilters

/** Document-quality filter batteries: the Gopher repetition signals
  * (q186), the C4 line-cleaning rules (q187), and the curation FUNNEL
  * report composing both with exact dedup (q196) — the per-stage
  * survival ledger a release run publishes. All are single codegen'd
  * map passes (PlanSpec pins q186/q187; q196 adds exactly one
  * aggregate) because they run over every byte of a 100 TB corpus
  * before any keyed stage gets to see it.
  *
  * Fixture discipline (the LineDedupQueries pattern): the harness
  * corpus is single-line word salad, so documents are re-lined via the
  * shared [[LineDedupQueries.linedCol]] fixture; q187/q196 salt
  * deterministic C4 triggers (terminal periods, a `javascript`
  * prefix, a `lorem ipsum` placeholder line, a brace line) and q186 a
  * within-doc duplicate line, all from doc_id/position arithmetic —
  * both engines build the identical fixture, so every rule fires on
  * real rows in both. */
object QualityFilterQueries {

  import QualityFilters._

  /** q187/q196 fixture lines (shared Spark/SQL constants). The lorem
    * line deliberately PASSES the line filter (terminal period, 5
    * words) while killing the page — the C4 line-vs-page rule
    * distinction. */
  private val LoremLine = "lorem ipsum dolor sit amet."
  private val BraceLine = "function() { return 0; }"

  private def lx = LineDedupQueries.lineCtesOver("documents")

  /** Gopher scoring chain over a `base(doc_id, lines, ws, n_chars)`
    * CTE: run-length decomposition of lines and word-2-grams →
    * per-doc `scored` integers. Shared by q186 and q196. */
  private val gopherChain: String =
    """g AS (SELECT *, list_transform(range(1, len(ws)),
      |        i -> ws[i] || ' ' || ws[i+1]) AS g2 FROM base),
      |s1 AS (SELECT *, list_sort(lines) AS ln_sorted,
      |         list_sort(g2) AS g_sorted FROM g),
      |s2 AS (SELECT *,
      |  list_filter(range(1, len(ln_sorted)+1),
      |    i -> i = 1 OR ln_sorted[i] <> ln_sorted[i-1]) AS ln_bpos,
      |  list_filter(range(1, len(g_sorted)+1),
      |    i -> i = 1 OR g_sorted[i] <> g_sorted[i-1]) AS g_bpos
      |  FROM s1),
      |s3 AS (SELECT *,
      |  list_transform(range(1, len(ln_bpos)+1),
      |    j -> CASE WHEN j = len(ln_bpos) THEN len(ln_sorted) + 1 - ln_bpos[j]
      |         ELSE ln_bpos[j+1] - ln_bpos[j] END) AS ln_runs,
      |  list_transform(range(1, len(g_bpos)+1),
      |    j -> CASE WHEN j = len(g_bpos) THEN len(g_sorted) + 1 - g_bpos[j]
      |         ELSE g_bpos[j+1] - g_bpos[j] END) AS g_runs
      |  FROM s2),
      |s4 AS (SELECT *, list_max(g_runs) AS g_maxrun FROM s3),
      |scored AS (SELECT doc_id,
      |  CAST(len(lines) AS BIGINT) AS n_lines,
      |  CAST(len(ln_bpos) AS BIGINT) AS n_distinct_lines,
      |  CAST(list_sum(list_transform(range(1, len(ln_bpos)+1),
      |    j -> CASE WHEN ln_runs[j] > 1
      |         THEN ln_runs[j] * length(ln_sorted[ln_bpos[j]])
      |         ELSE 0 END)) AS BIGINT) AS dup_line_chars,
      |  CAST(list_sum(list_transform(lines, l -> length(l))) AS BIGINT) AS line_chars,
      |  CAST(g_maxrun AS BIGINT) AS top2_cnt,
      |  list_min(list_transform(
      |    list_filter(range(1, len(g_bpos)+1), j -> g_runs[j] = g_maxrun),
      |    j -> g_sorted[g_bpos[j]])) AS top2_gram,
      |  CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS word_chars,
      |  CAST(len(ws) AS BIGINT) AS n_words
      |  FROM s4)""".stripMargin

  /** The composite Gopher keep flag over `scored` columns. */
  private val gopherKeepSql: String =
    s"""CASE WHEN (n_lines - n_distinct_lines) * 1000 // n_lines <= $MaxDupLineMilli
       |        AND dup_line_chars * 1000 // line_chars <= $MaxDupCharMilli
       |        AND top2_cnt * length(top2_gram) * 1000 // n_chars <= $MaxTop2CharMilli
       |        AND word_chars * 1000 // n_words BETWEEN $MinMeanWordMilli AND $MaxMeanWordMilli
       |   THEN 1 ELSE 0 END""".stripMargin

  /** C4 fixture-salting CTEs (lx.t → salted line array `ls3.lines`). */
  private val c4SaltCtes: String =
    s"""ls0 AS (SELECT doc_id, string_split(t, chr(10)) AS l0 FROM lx),
       |ls1 AS (SELECT doc_id, list_transform(l0, (l, p) -> concat(
       |    CASE WHEN (doc_id + p) % 7 = 0 THEN 'javascript ' ELSE '' END,
       |    l,
       |    CASE WHEN (doc_id + p) % 3 = 0 THEN '.' ELSE '' END)) AS l1
       |  FROM ls0),
       |ls2 AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0
       |    THEN list_append(l1, '$LoremLine') ELSE l1 END AS l2 FROM ls1),
       |ls3 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0
       |    THEN list_append(l2, '$BraceLine') ELSE l2 END AS lines FROM ls2)""".stripMargin

  /** The C4 line-keep lambda body (over a line `l`), SQL side. */
  private val c4KeepSql: String =
    s"""ends_with(l, '.') AND len(string_split(l, ' ')) >= $C4MinWords
       |    AND NOT contains(l, 'javascript')
       |    AND NOT contains(l, 'cookies')""".stripMargin

  /** The C4 page-keep flag over a `lines` column, SQL side. */
  private val c4PageKeepSql: String =
    s"""CASE WHEN len(list_filter(lines, l -> $c4KeepSql)) >= $C4MinLines
       |        AND len(list_filter(lines, l -> contains(l, '{'))) = 0
       |        AND len(list_filter(lines, l -> contains(l, 'lorem ipsum'))) = 0
       |   THEN 1 ELSE 0 END""".stripMargin

  /** Spark side of [[c4SaltCtes]]: (doc_id, text, lines). Staged
    * selects — the lambdas capture the previous stage's columns. */
  private def saltedLinesFrame(s: SparkSession, d: String): DataFrame = {
    val lined = Sources.table(s, d, "documents")
      .select(col("doc_id"), col("text"), LineDedupQueries.linedCol.as("t"))
    val ls0 = lined.select(col("doc_id"), col("text"),
      split(col("t"), "\n").as("l0"))
    // Spark transform indexes are 0-based; the oracle's DuckDB
    // lambdas are 1-based — p = i + 1 aligns them.
    val ls1 = ls0.select(col("doc_id"), col("text"),
      transform(col("l0"), (l, i) => concat(
        when((col("doc_id") + i + 1) % 7 === 0, lit("javascript "))
          .otherwise(lit("")),
        l,
        when((col("doc_id") + i + 1) % 3 === 0, lit("."))
          .otherwise(lit("")))).as("l1"))
    val ls2 = ls1.select(col("doc_id"), col("text"),
      when(col("doc_id") % 13 === 0,
        concat(col("l1"), array(lit(LoremLine)))).otherwise(col("l1"))
        .as("l2"))
    ls2.select(col("doc_id"), col("text"),
      when(col("doc_id") % 11 === 0,
        concat(col("l2"), array(lit(BraceLine)))).otherwise(col("l2"))
        .as("lines"))
  }

  val all: Seq[Q] = Seq(

    // Gopher repetition battery (Rae et al. 2021, Appendix A): per
    // document, the duplicate-line fraction, the fraction of
    // characters inside duplicated lines, the top word-2-gram and its
    // character share, and mean word length — each an exact integer
    // milli-fraction — plus the composite keep flag. Within-doc
    // duplicate counting is sort + run-length decomposition,
    // O(L log L) in the document's own length; ties on the top gram
    // break to the lexicographically smallest (binary collation on
    // both engines). One map pass, no shuffle.
    Q("q186_gopher_quality",
      s"""WITH $lx,
         |lf AS (SELECT doc_id, string_split(t, chr(10)) AS l0 FROM lx),
         |tw AS (SELECT doc_id, CASE WHEN doc_id % 41 = 0
         |         THEN string_split(text, ' ')[1] ELSE text END AS text
         |       FROM documents),
         |base AS (
         |  SELECT lf.doc_id,
         |         CASE WHEN lf.doc_id % 5 = 0 THEN list_append(l0, l0[1])
         |              ELSE l0 END AS lines,
         |         string_split(d.text, ' ') AS ws, length(d.text) AS n_chars
         |  FROM lf JOIN tw d ON lf.doc_id = d.doc_id),
         |$gopherChain
         |SELECT doc_id, n_lines, top2_cnt, top2_gram,
         |  (n_lines - n_distinct_lines) * 1000 // n_lines AS dup_line_milli,
         |  dup_line_chars * 1000 // line_chars AS dup_char_milli,
         |  top2_cnt * length(top2_gram) * 1000 // n_chars AS top2_char_milli,
         |  word_chars * 1000 // n_words AS mean_wlen_milli,
         |  $gopherKeepSql AS keep_gopher
         |FROM scored""".stripMargin) {
      (s, d) => {
        // Fixture: re-lined corpus, plus a salted WITHIN-doc duplicate
        // (every 5th doc repeats its first line) so the dup-line
        // signal has live coverage — the corpus's cross-doc
        // boilerplate lines appear once per document. Every 41st doc
        // is truncated to its FIRST WORD so the no-2-grams degenerate
        // path (NULL top2 signals, keep=0) is oracle-pinned, not just
        // spec-pinned.
        val lf = Sources.table(s, d, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 41 === 0,
              element_at(split(col("text"), " "), 1)).otherwise(col("text"))
              .as("text"),
            split(LineDedupQueries.linedCol, "\n").as("l0"))
        QualityFilters.gopherSignals(lf.select(col("doc_id"), col("text"),
          when(col("doc_id") % 5 === 0,
            concat(col("l0"), slice(col("l0"), 1, 1))).otherwise(col("l0"))
            .as("lines")))
      }
    },

    // C4 line-cleaning rules (Raffel et al. 2020 §2.2): keep lines
    // ending in terminal punctuation with ≥ 5 words and no
    // code/policy marker; drop whole pages carrying a brace or a
    // `lorem ipsum` placeholder or fewer than 3 surviving lines.
    // Salts (period / `javascript ` / placeholder / brace lines) are
    // deterministic doc_id+position arithmetic so every rule fires;
    // the lorem line passes the LINE filter while killing the PAGE —
    // the rule-level distinction the battery must preserve. One map
    // pass; the cleaned text ships with the flag so a downstream
    // stage filters without recomputing.
    Q("q187_c4_line_filters",
      s"""WITH $lx,
         |$c4SaltCtes,
         |k AS (SELECT doc_id, lines,
         |       list_filter(lines, l -> $c4KeepSql) AS kept FROM ls3)
         |SELECT doc_id,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  $c4PageKeepSql AS page_keep,
         |  coalesce(array_to_string(kept, chr(10)), '') AS text_c4
         |FROM k""".stripMargin) {
      (s, d) =>
        QualityFilters.c4Clean(
          saltedLinesFrame(s, d).select(col("doc_id"), col("lines")))
    },

    // The curation FUNNEL: the per-stage survival ledger a release
    // run publishes — corpus → Gopher gate → C4 page gate → exact
    // dedup, as FOUR counts from ONE map pass + ONE aggregate. Both
    // batteries evaluate over the same salted line fixture (a real
    // run's one corpus), the C4 flag and the dedup key thread through
    // gopherSignals' passthrough instead of re-scanning and joining,
    // and the distinct-survivor count plans as the two-phase distinct
    // aggregate. This is the composition row: the number every
    // curation ablation reads ("how much survives each gate, and how
    // much of THAT is unique").
    Q("q196_curation_funnel",
      s"""WITH $lx,
         |$c4SaltCtes,
         |base AS (
         |  SELECT ls3.doc_id, ls3.lines, string_split(d.text, ' ') AS ws,
         |         length(d.text) AS n_chars
         |  FROM ls3 JOIN documents d ON ls3.doc_id = d.doc_id),
         |$gopherChain,
         |gk AS (SELECT doc_id, $gopherKeepSql AS keep_gopher FROM scored),
         |ck AS (SELECT doc_id, $c4PageKeepSql AS page_keep FROM ls3)
         |SELECT CAST(count(*) AS BIGINT) AS n_all,
         |  CAST(sum(gk.keep_gopher) AS BIGINT) AS n_gopher,
         |  CAST(sum(gk.keep_gopher * ck.page_keep) AS BIGINT) AS n_c4,
         |  CAST(count(DISTINCT CASE WHEN gk.keep_gopher = 1 AND ck.page_keep = 1
         |       THEN d.text END) AS BIGINT) AS n_unique
         |FROM gk JOIN ck ON gk.doc_id = ck.doc_id
         |     JOIN documents d ON gk.doc_id = d.doc_id""".stripMargin) {
      (s, d) => {
        val flagged = saltedLinesFrame(s, d)
          .withColumn("page_keep", QualityFilters.c4PageKeep(col("lines")))
        QualityFilters.gopherSignals(flagged, extra = Seq("page_keep", "text"))
          .agg(
            count(lit(1)).as("n_all"),
            sum(col("keep_gopher")).cast("long").as("n_gopher"),
            sum(col("keep_gopher") * col("page_keep")).cast("long").as("n_c4"),
            countDistinct(when(
              col("keep_gopher") === 1 && col("page_keep") === 1,
              col("text"))).as("n_unique"))
      }
    }
  )
}
