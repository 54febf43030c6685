package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition- and rule-based document quality filters — the Gopher
  * repetition battery (Rae et al. 2021, "Scaling Language Models",
  * Appendix A: duplicate-line fraction, duplicate-line character
  * fraction, top-n-gram character fraction, mean word length) and the
  * C4 line-level cleaning rules (Raffel et al. 2020, §2.2: keep lines
  * that end in terminal punctuation and have ≥ `C4MinWords` words,
  * drop lines carrying code/policy markers, drop whole pages with
  * brace/placeholder markers or too few surviving sentences).
  *
  * Scale design: every signal is a per-document array expression —
  * one codegen'd map pass, no explode, no shuffle, no UDF (the same
  * stance as [[TextAnalysis]]; these run over every byte of a 100 TB
  * corpus). Within-document duplicate counting is the sort-and-
  * run-length form, O(L log L) per document in the document's OWN
  * length — never a corpus-wide aggregate (that family is the
  * LINE-dedup operators, q173/q174, where the signal is cross-doc
  * document frequency). All arithmetic is integer (milli-fractions
  * via `x * 1000 div y`), so the DuckDB oracle matches bit-for-bit.
  *
  * The run-length machinery mirrors this DuckDB form (1-BASED
  * positions on both engines):
  * {{{
  *   bpos = positions i where sorted[i] starts a new run
  *   runs[j] = bpos[j+1] - bpos[j]   (last: n+1 - bpos[last])
  * }}}
  */
object QualityFilters {

  /** Gopher keep-thresholds (milli-fractions / milli-chars). */
  val MaxDupLineMilli = 300L // dup-line fraction ≤ 0.30
  val MaxDupCharMilli = 400L // chars-in-duplicated-lines ≤ 0.40
  val MaxTop2CharMilli = 200L // top-2-gram char fraction ≤ 0.20
  val MinMeanWordMilli = 3000L // mean word length ∈ [3, 10]
  val MaxMeanWordMilli = 10000L

  /** C4: a surviving line needs at least this many words. */
  val C4MinWords = 5
  /** C4: a surviving page needs at least this many surviving lines. */
  val C4MinLines = 3

  /** Sorted copy plus run-length decomposition of `arr`, appended as
    * materialized columns (`p_sorted`, `p_bpos`, `p_runs` under the
    * given prefix). Staged `.select`s on purpose: the lambdas CAPTURE
    * the previous stage's columns, and Spark performs no subexpression
    * elimination inside higher-order-function lambdas — inlining
    * `sort_array(...)` into every `element_at` would re-sort per
    * ELEMENT (the spanGrams caller-contract lesson).
    *
    * Empty-array guard: Spark's `sequence(1, 0)` is the DESCENDING
    * [1, 0] — `element_at(arr, 0)` then throws unconditionally —
    * while DuckDB's `range(1, 1)` is empty. Every sequence here is
    * gated on the array being non-empty so an empty input yields
    * empty bpos/runs on both engines instead of a crash. */
  private def withRuns(df: DataFrame, arr: String, p: String): DataFrame = {
    val sorted = df.withColumn(s"${p}_sorted", sort_array(col(arr)))
    val bpos = sorted.withColumn(s"${p}_bpos",
      when(size(col(s"${p}_sorted")) >= 1,
        filter(
          sequence(lit(1), size(col(s"${p}_sorted"))),
          i => i === 1 ||
            element_at(col(s"${p}_sorted"), i) =!=
            element_at(col(s"${p}_sorted"), i - 1)))
        .otherwise(array().cast("array<int>")))
    bpos.withColumn(s"${p}_runs",
      when(size(col(s"${p}_bpos")) >= 1,
        transform(sequence(lit(1), size(col(s"${p}_bpos"))),
          j => when(j === size(col(s"${p}_bpos")),
            size(col(s"${p}_sorted")) + 1 - element_at(col(s"${p}_bpos"), j))
            .otherwise(element_at(col(s"${p}_bpos"), j + 1) -
              element_at(col(s"${p}_bpos"), j))))
        .otherwise(array().cast("array<int>")))
  }

  /** Characters inside within-doc duplicated elements (every copy of
    * every element whose run length > 1), from [[withRuns]] columns. */
  private def dupChars(p: String): Column =
    aggregate(
      zip_with(col(s"${p}_runs"), col(s"${p}_bpos"),
        (r, b) => when(r > 1,
          r * length(element_at(col(s"${p}_sorted"), b)))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Longest run length (the top element's within-doc count). */
  private def maxRun(p: String): Column = array_max(col(s"${p}_runs"))

  /** The most frequent element, ties broken lexicographically
    * smallest — deterministic and identical on both engines (binary
    * collation over lowercase-ASCII tokens). Callers must have
    * materialized `${p}_maxrun` first (lambda-capture rule). */
  private def topElem(p: String): Column =
    when(size(col(s"${p}_bpos")) >= 1,
      array_min(transform(
        filter(sequence(lit(1), size(col(s"${p}_bpos"))),
          j => element_at(col(s"${p}_runs"), j) === col(s"${p}_maxrun")),
        j => element_at(col(s"${p}_sorted"),
          element_at(col(s"${p}_bpos"), j)))))
      .otherwise(lit(null).cast("string"))

  /** Gopher repetition battery over a frame bearing `doc_id`, raw
    * `text`, and a line array `lines`. Output is per-document:
    * line-duplication fractions, the top word-2-gram and its
    * character share, mean word length, and the composite keep flag —
    * every ratio an exact integer milli-fraction. `extra` columns
    * from the input pass through untouched (the q196 funnel threads
    * its C4 flag and dedup key through the one map pass instead of
    * re-scanning and joining). */
  def gopherSignals(docs: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val ex = extra.map(col)
    val base = docs.select(Seq(col("doc_id"), col("lines"),
      split(col("text"), " ").as("ws"),
      length(col("text")).cast("long").as("n_chars")) ++ ex: _*)
    // Word 2-grams WITH repeats (q47's shingle builder dedups; the
    // Gopher signal needs multiplicity).
    // Single-word docs have NO 2-grams: DuckDB's range(1, 1) is
    // empty, Spark's sequence(1, 0) is the descending [1, 0] whose
    // element_at(ws, 0) always throws — so the gram list is gated on
    // size(ws) >= 2 (same empty-list result as the oracle).
    val grams = base.withColumn("g2",
      when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat_ws(" ", element_at(col("ws"), i),
            element_at(col("ws"), i + 1))))
        .otherwise(array().cast("array<string>")))
    val lineRuns = withRuns(grams, "lines", "ln")
    val gramRuns = withRuns(lineRuns, "g2", "g")
      .withColumn("g_maxrun", maxRun("g"))
    val scored = gramRuns.select(Seq(
      col("doc_id"),
      size(col("lines")).cast("long").as("n_lines"),
      size(col("ln_bpos")).cast("long").as("n_distinct_lines"),
      dupChars("ln").as("dup_line_chars"),
      aggregate(col("lines"), lit(0L), (a, l) => a + length(l))
        .as("line_chars"),
      col("g_maxrun").cast("long").as("top2_cnt"),
      topElem("g").as("top2_gram"),
      col("n_chars"),
      aggregate(col("ws"), lit(0L), (a, w) => a + length(w)).as("word_chars"),
      size(col("ws")).cast("long").as("n_words")) ++ ex: _*)
    // Integer `div` (not float `/` + cast) so every milli-fraction is
    // bit-identical to the oracle's `//`. nullif'd divisors: DuckDB's
    // `// 0` is NULL while ANSI Spark throws — a 0-line doc (possible
    // after upstream line filtering) must degrade to NULL signals on
    // both engines, not crash one of them.
    val withMilli = scored.select(Seq(
      col("doc_id"), col("n_lines"), col("top2_cnt"), col("top2_gram"),
      expr("(n_lines - n_distinct_lines) * 1000 div nullif(n_lines, 0)")
        .as("dup_line_milli"),
      expr("dup_line_chars * 1000 div nullif(line_chars, 0)")
        .as("dup_char_milli"),
      expr("top2_cnt * length(top2_gram) * 1000 div nullif(n_chars, 0)")
        .as("top2_char_milli"),
      expr("word_chars * 1000 div nullif(n_words, 0)")
        .as("mean_wlen_milli")) ++ ex: _*)
    // when/otherwise (NOT a bare cast) so a NULL condition — a
    // single-word doc's NULL top2 signals — lands on 0 exactly like
    // the oracle's CASE WHEN ... THEN 1 ELSE 0 END.
    withMilli.withColumn("keep_gopher",
      when(col("dup_line_milli") <= MaxDupLineMilli &&
        col("dup_char_milli") <= MaxDupCharMilli &&
        col("top2_char_milli") <= MaxTop2CharMilli &&
        col("mean_wlen_milli").between(MinMeanWordMilli, MaxMeanWordMilli),
        lit(1)).otherwise(lit(0)))
  }

  /** C4 line-keep predicate: terminal punctuation, ≥ [[C4MinWords]]
    * words, no code/policy marker. */
  def c4LineKeep(l: Column): Column =
    l.endsWith(".") &&
      size(split(l, " ")) >= C4MinWords &&
      !l.contains("javascript") && !l.contains("cookies")

  /** C4 page-keep flag over a line array (the page-level half of
    * [[c4Clean]], exposed for compositions that only gate). */
  def c4PageKeep(lines: Column): Column =
    (size(filter(lines, l => c4LineKeep(l))) >= C4MinLines &&
      !exists(lines, l => l.contains("{")) &&
      !exists(lines, l => l.contains("lorem ipsum"))).cast("int")

  /** C4 cleaning over a frame bearing `doc_id` and a salted line
    * array `lines`: per-document kept-line ledger, the page-level
    * keep flag (no brace, no placeholder text, ≥ [[C4MinLines]]
    * surviving lines), and the cleaned text. One map pass. */
  def c4Clean(docs: DataFrame): DataFrame = {
    val kept = docs.select(col("doc_id"), col("lines"),
      filter(col("lines"), l => c4LineKeep(l)).as("kept"))
    kept.select(
      col("doc_id"),
      size(col("lines")).cast("long").as("n_lines"),
      size(col("kept")).cast("long").as("n_kept"),
      (size(col("kept")) >= C4MinLines &&
        !exists(col("lines"), l => l.contains("{")) &&
        !exists(col("lines"), l => l.contains("lorem ipsum")))
        .cast("int").as("page_keep"),
      array_join(col("kept"), "\n").as("text_c4"))
  }
}
