package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Bpe

/** Real-BPE tokenization queries (SURVEY.md LLM-pipeline family).
  *
  * q98 runs the WHOLE trained-tokenizer pipeline under the oracle
  * gate: merge-table training (10 greedy merges, corpus-wide argmax
  * per iteration) and application (a replace chain per word) both
  * live in exact string/integer space, so the DuckDB oracle replays
  * training as 10 UNROLLED MATERIALIZED CTE iterations — the q68
  * unrolled-k-means discipline applied to a tokenizer — and must
  * reproduce every merged representation string bit-for-bit. The
  * Spark side reads the memoized merge table
  * ([[Indexes.bpeMerges]]); its timed path is the pure map-expression
  * apply, the production shape (train once per corpus generation,
  * tokenize every batch).
  */
object BpeQueries {

  /** Declared merge count: enough to learn multi-level rules (the
    * sf0.01 corpus learns e.g. m+er and p+ar on top of e+r / a+r). */
  val NMerges = 10

  private val NormSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** The unrolled training+apply chain. `MATERIALIZED` is load-bearing:
    * each `w{k}` is referenced twice (pair counts and the next
    * iteration), and without it DuckDB's inlining doubles the plan per
    * iteration — 2^10 blow-up, ~30x slower measured. */
  private def oracleSql(n: Int): String = {
    val parts = Seq(
      s"""w0 AS MATERIALIZED (
         |  SELECT doc_id, j, regexp_replace(words[CAST(j AS INT)], '(.)', '<\\1>', 'g') AS rep
         |  FROM (SELECT doc_id, str_split($NormSql, ' ') AS words FROM documents),
         |       unnest(generate_series(1, len(words))) AS g(j)
         |  WHERE words[CAST(j AS INT)] <> '')""".stripMargin) ++
      (0 until n).map { k =>
        s"""p$k AS (
           |  SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT)+1] AS b, count(*) AS c
           |  FROM (SELECT str_split(trim(rep, '<>'), '><') AS syms FROM w$k),
           |       unnest(generate_series(1, len(syms)-1)) AS g(i)
           |  GROUP BY 1, 2),
           |m$k AS (SELECT a, b FROM p$k ORDER BY c DESC, a, b LIMIT 1),
           |w${k + 1} AS MATERIALIZED (
           |  SELECT w.doc_id, w.j,
           |         replace(w.rep, '<'||m.a||'><'||m.b||'>', '<'||m.a||m.b||'>') AS rep
           |  FROM w$k w, m$k m)""".stripMargin
      }
    s"""WITH ${parts.mkString(",\n")}
       |SELECT d.doc_id,
       |       CAST(coalesce(t.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
       |       coalesce(t.bpe_text, '') AS bpe_text
       |FROM documents d LEFT JOIN (
       |  SELECT doc_id,
       |         sum(len(str_split(trim(rep, '<>'), '><'))) AS bpe_tokens,
       |         string_agg(rep, ' ' ORDER BY j) AS bpe_text
       |  FROM w$n GROUP BY doc_id) t ON d.doc_id = t.doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Trained-BPE tokenization: per document, the merged symbol count
    // (the REAL token budget) and the full merged representation (so
    // the oracle pins every rule application, not just the count).
    Q("q98_bpe_tokenize", oracleSql(NMerges)) {
      (s, d) =>
        val merges = Indexes.bpeMerges(s, d, NMerges)
        table(s, d, "documents")
          .select(col("doc_id"), Bpe.wordArray(col("text")).as("words"))
          .select(col("doc_id"),
            transform(col("words"),
              w => Bpe.applyMerges(Bpe.charWrap(w), merges)).as("reps"))
          .select(col("doc_id"),
            aggregate(col("reps"), lit(0L),
              (acc, r) => acc + size(Bpe.symbols(r))).as("bpe_tokens"),
            array_join(col("reps"), " ").as("bpe_text"))
    }
  )
}
