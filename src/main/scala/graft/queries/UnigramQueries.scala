package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Unigram

/** Unigram-LM (SentencePiece-style) tokenizer queries — the OTHER
  * public tokenizer family next to [[BpeQueries]]'s BPE: an EM-pruned
  * piece vocabulary applied by per-word Viterbi lattice DP.
  *
  * q206 runs the WHOLE pipeline under the oracle gate: seed substring
  * counts → seed prune → [[graft.ops.Unigram.EmRounds]] unrolled
  * Viterbi-EM rounds → final prune → segmentation — the q98/q68
  * unrolled-replay discipline, with the DP replayed in DuckDB as a
  * `list_reduce` lattice over the SAME fixed-order IEEE double
  * arithmetic (piece probabilities are single divisions of exact
  * integer counts; the DP multiplies in recurrence order and breaks
  * ties to the shortest piece — bit-identical on both engines, see
  * [[graft.ops.Unigram]]). The oracle output includes the full
  * segmented text, so every DP decision is pinned, not just counts.
  *
  * q207 plugs the trained-unigram counts into the q63/q101 token
  * budget — the drop-in column-swap the budget operator documents,
  * demonstrated for this tokenizer family end-to-end.
  */
object UnigramQueries {

  import Unigram.{EmRounds, FinalMulti, MaxPieceLen, SeedMulti}

  /** q207 budgets (unigram-token units — same scale as trained-BPE
    * counts: roughly normalized chars over mean piece length). */
  private val Budgets = Map("src0" -> 2000L, "src1" -> 5000L)
  private val DefaultBudget = 3500L

  /** The DuckDB Viterbi DP over word column `w` under map column `m`:
    * returns the final cell's '|'-joined segmentation. Mirrors
    * [[graft.ops.Unigram.viterbiCell]] exactly — candidates built
    * ONCE per position in piece-length order, left-to-right reduce
    * with strict `>` (first maximum wins), prev.score · p(piece) in
    * recurrence order. Cell for prefix length p lives at acc[p+1]. */
  private def dpSeg(m: String, w: String): String = {
    // Candidate for piece length l at position j = CAST(x[1].score AS INT).
    def cand(l: Int): String = {
      val j = "CAST(x[1].score AS INT)"
      val piece = s"substr($w, $j - ${l - 1}, $l)"
      val prev = s"acc[$j - ${l - 1}]"
      s"""CASE WHEN $j >= $l AND len(map_extract($m, $piece)) > 0
         |THEN {'score': $prev.score * map_extract($m, $piece)[1],
         |      'seg': $prev.seg || '|' || $piece}
         |ELSE NULL END""".stripMargin.replace("\n", " ")
    }
    val cands = (1 to MaxPieceLen).map(cand).mkString("[", ", ", "]")
    s"""list_reduce(
       |  [[{'score': 1.0, 'seg': ''}]::STRUCT(score DOUBLE, seg VARCHAR)[]] ||
       |  list_transform(range(1, length($w) + 1),
       |    jj -> [{'score': CAST(jj AS DOUBLE), 'seg': ''}]),
       |  (acc, x) -> acc || [list_reduce(
       |    list_filter($cands, cd -> cd IS NOT NULL),
       |    (b, cc) -> CASE WHEN cc.score > b.score THEN cc ELSE b END)]
       |)[length($w) + 1].seg""".stripMargin
  }

  /** Probability-map CTE body over a (p, c) vocabulary CTE `v`:
    * p → CAST(c AS DOUBLE) / CAST(Σc AS DOUBLE) — one IEEE division
    * of exactly-converted integers per piece (the Scala trainer's
    * `c.toDouble / t`). */
  private def mapCte(v: String): String =
    s"""SELECT map(list(p ORDER BY p),
       |  list(CAST(c AS DOUBLE) / (SELECT CAST(sum(c) AS DOUBLE) FROM $v)
       |       ORDER BY p)) AS m FROM $v""".stripMargin

  /** The unrolled training chain, ending in the final vocabulary `vf`
    * and the per-instance segmentation `inst(doc_id, j, segt, np)`.
    * Mirrors [[graft.ops.Unigram.trainVocab]] + the apply pass:
    * `wi`/`wt` word instances/types (the BPE normalization, shared
    * text), `sd` seed substring counts, `v0` = alphabet + top
    * [[SeedMulti]] multi-pieces, then per EM round r: segment types
    * under m(r−1) → exact integer piece counts → v(r) = alphabet
    * (count floored at 1) + used multi-pieces; final prune to
    * [[FinalMulti]] multi-pieces. MATERIALIZED where referenced
    * twice (the q98 lesson — DuckDB otherwise inlines the whole DP
    * chain per reference). */
  private def trainingCtes: String = {
    val seedLists = (1 to MaxPieceLen).map { l =>
      s"""list_transform(range(1, length(w) - ${l - 1} + 1),
         |  i -> substr(w, CAST(i AS INT), $l))""".stripMargin.replace("\n", " ")
    }.mkString(" || ")
    val head =
      s"""wi AS MATERIALIZED (
         |  SELECT doc_id, j, words[CAST(j AS INT)] AS w
         |  FROM (SELECT doc_id, str_split(${BpeQueries.NormSql}, ' ') AS words
         |        FROM documents),
         |       unnest(generate_series(1, len(words))) AS g(j)
         |  WHERE words[CAST(j AS INT)] <> ''),
         |wt AS MATERIALIZED (SELECT w, count(*) AS n FROM wi GROUP BY w),
         |sd AS MATERIALIZED (
         |  SELECT p, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT n, unnest($seedLists) AS p FROM wt) GROUP BY p),
         |v0 AS MATERIALIZED (
         |  SELECT p, c FROM sd WHERE length(p) = 1
         |  UNION ALL
         |  SELECT p, c FROM (
         |    SELECT p, c FROM sd WHERE length(p) > 1
         |    ORDER BY c DESC, p LIMIT $SeedMulti))""".stripMargin
    val rounds = (0 until EmRounds).map { r =>
      s"""m$r AS (${mapCte(s"v$r")}),
         |s${r + 1} AS MATERIALIZED (
         |  SELECT wt.w, wt.n, ${dpSeg(s"m$r.m", "wt.w")} AS seg FROM wt, m$r),
         |c${r + 1} AS MATERIALIZED (
         |  SELECT p, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT n, unnest(list_filter(str_split(seg, '|'),
         |                         x -> x <> '')) AS p FROM s${r + 1})
         |  GROUP BY p),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT s.p, greatest(coalesce(c.c, 0), 1) AS c
         |  FROM (SELECT p FROM v0 WHERE length(p) = 1) s
         |       LEFT JOIN c${r + 1} c ON s.p = c.p
         |  UNION ALL
         |  SELECT p, c FROM c${r + 1} WHERE length(p) > 1)""".stripMargin
    }
    val tail =
      s"""vf AS MATERIALIZED (
         |  SELECT p, c FROM v$EmRounds WHERE length(p) = 1
         |  UNION ALL
         |  SELECT p, c FROM (
         |    SELECT p, c FROM v$EmRounds WHERE length(p) > 1
         |    ORDER BY c DESC, p LIMIT $FinalMulti)),
         |mf AS (${mapCte("vf")}),
         |sf AS MATERIALIZED (
         |  SELECT dw.w, ${dpSeg("mf.m", "dw.w")} AS seg
         |  FROM (SELECT DISTINCT w FROM wi) dw, mf),
         |inst AS MATERIALIZED (
         |  SELECT wi.doc_id, wi.j, ltrim(sf.seg, '|') AS segt,
         |         CAST(len(list_filter(str_split(sf.seg, '|'),
         |                              x -> x <> '')) AS BIGINT) AS np
         |  FROM wi JOIN sf ON wi.w = sf.w)""".stripMargin
    (Seq(head) ++ rounds ++ Seq(tail)).mkString(",\n")
  }

  /** `documents` + per-doc (uni_tokens, uni_text) via the persisted
    * vocabulary and the memoized per-partition apply. */
  private def tokenized(s: org.apache.spark.sql.SparkSession, d: String,
                        cols: String*): org.apache.spark.sql.DataFrame = {
    val vocab = Indexes.unigramVocab(s, d).orderBy("p").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    Unigram.withSegmentedWords(
      Indexes.bpeWords(s, d).select(cols.map(col) :+ col("__ws"): _*),
      "__ws", vocab, "uni_tokens", "uni_text")
  }

  val all: Seq[Q] = Seq(

    // Trained unigram-LM tokenization: per document, the Viterbi
    // piece count (the token budget under this tokenizer family) and
    // the full segmented text (so the oracle pins every lattice
    // decision). Training replays as unrolled EM CTEs; application
    // is the memoized per-partition DP over word TYPES (one DP per
    // type per partition — the q98 apply discipline), so tokenizing
    // 100 TB is one map pass after a bounded-metadata vocabulary
    // train.
    Q("q206_unigram_tokenize",
      s"""WITH $trainingCtes
         |SELECT d.doc_id,
         |       CAST(coalesce(t.ut, 0) AS BIGINT) AS uni_tokens,
         |       coalesce(t.txt, '') AS uni_text
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id, sum(np) AS ut,
         |         string_agg(segt, ' ' ORDER BY j) AS txt
         |  FROM inst GROUP BY doc_id) t ON d.doc_id = t.doc_id""".stripMargin) {
      (s, d) =>
        tokenized(s, d, "doc_id")
          .select(col("doc_id"), col("uni_tokens"), col("uni_text"))
    },

    // Unigram counts composed into the token-budget mixing operator
    // (q63's shape, q101's composition proof applied to THIS
    // tokenizer): train → count → hash-ordered prefix-sum budget in
    // one lineage — the drop-in column swap the budget operator
    // documents. The oracle replays the full training chain AND the
    // budget window, so a drift in either half fails the row.
    Q("q207_unigram_token_budget",
      s"""WITH $trainingCtes,
         |bt AS (SELECT d.doc_id, d.source,
         |         CAST(coalesce(t.ut, 0) AS BIGINT) AS n_tok
         |       FROM documents d LEFT JOIN (
         |         SELECT doc_id, sum(np) AS ut FROM inst GROUP BY doc_id
         |       ) t ON d.doc_id = t.doc_id),
         |c AS (SELECT doc_id, source, n_tok,
         |        CAST(sum(n_tok) OVER (PARTITION BY source
         |          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
         |      FROM bt)
         |SELECT doc_id, source, n_tok, cum_tok FROM c
         |WHERE cum_tok <= (CASE source WHEN 'src0' THEN ${Budgets("src0")}
         |                              WHEN 'src1' THEN ${Budgets("src1")}
         |                              ELSE $DefaultBudget END)""".stripMargin) {
      (s, d) =>
        graft.ops.Sampling.tokenBudget(
          tokenized(s, d, "doc_id", "source")
            .select("doc_id", "source", "uni_tokens"),
          "source", "doc_id", col("uni_tokens"),
          budgets = Budgets, defaultBudget = DefaultBudget)
          .select("doc_id", "source", "n_tok", "cum_tok")
    },

    // INCREMENTAL unigram-vocabulary maintenance — q210's discipline
    // applied to the OTHER tokenizer family, closing the last
    // non-incremental leg: word-type counts are ADDITIVE, so when a
    // batch arrives (last 20 % of the id space, the q155/q210
    // watermark convention) the persisted type table folds the
    // batch's counts with one counts-sum — the old corpus text is
    // NEVER re-scanned — and [[graft.ops.Unigram.trainVocab]] (which
    // consumes a type table by construction) reruns the seed → EM →
    // prune chain over the folded table. The trained (piece, count)
    // vocabulary must be INDISTINGUISHABLE from training on the whole
    // corpus from scratch (the q205/q210 "recomputing the world"
    // discipline): the oracle replays the full-corpus unrolled EM
    // chain and the final vocabulary must match piece-for-piece,
    // count-for-count. UnigramSpec pins fold-trained ≡ from-scratch
    // on a seeded corpus; operationally the retrain is gated on the
    // q155 drift monitor exactly as q210 documents. Scale bill: one
    // batch-sized tokenize pass + a type-table sum + EmRounds
    // vocabulary-sized aggregates — nothing corpus-proportional.
    Q("q211_unigram_vocab_incremental",
      s"""WITH $trainingCtes
         |SELECT p, CAST(c AS BIGINT) AS c FROM vf""".stripMargin) {
      (s, d) =>
        val words = Indexes.bpeWords(s, d).select(col("doc_id"), col("__ws"))
        val mx = words.agg(max(col("doc_id"))).head().getLong(0)
        val cut = mx * 4 / 5
        def typesOf(df: org.apache.spark.sql.DataFrame) =
          df.select(explode(col("__ws")).as("w"))
            .groupBy("w").agg(count(lit(1)).as("n"))
        // Persisted corpus type table (recomputed from the same word
        // index here so the row is self-contained — the q205/q210
        // convention) + the incoming batch's counts, folded.
        val folded = typesOf(words.filter(col("doc_id") < cut))
          .unionByName(typesOf(words.filter(col("doc_id") >= cut)))
          .groupBy("w").agg(sum(col("n")).as("n"))
        import s.implicits._
        Unigram.trainVocab(folded).toDF("p", "c")
    }
  )
}
