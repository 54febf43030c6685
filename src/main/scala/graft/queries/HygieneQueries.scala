package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.TextHygiene

/** Byte-level corpus hygiene: mojibake repair (q194) and
  * special-token scrubbing (q195). Both queries salt deterministic
  * artifacts into the harness corpus (built from the SAME Scala
  * constants the operators use, so Spark and the oracle share exact
  * bytes), count them, and emit the repaired text — the count is the
  * corpus-health / poisoning signal a release datasheet carries. */
object HygieneQueries {

  /** SQL string-literal escape (only ' needs doubling; the artifact
    * strings carry no control chars by construction). */
  private def esc(s: String): String = s.replace("'", "''")

  /** DuckDB literal replace chain mirroring
    * [[TextHygiene.fixMojibake]] / scrubSpecialTokens. */
  private def sqlChain(expr: String, pairs: Seq[(String, String)]): String =
    pairs.foldLeft(expr) { case (acc, (f, t)) =>
      s"replace($acc, '${esc(f)}', '${esc(t)}')"
    }

  /** DuckDB occurrence count in chain order, mirroring
    * [[TextHygiene.mojibakeCount]] semantics. */
  private def sqlCount(expr: String, pats: Seq[(String, String)]): String =
    pats.indices.map { i =>
      val applied = sqlChain(expr, pats.take(i))
      val pat = pats(i)._1
      s"(length($applied) - length(replace($applied, '${esc(pat)}', ''))) // ${pat.length}"
    }.mkString("(", " + ", ")")

  /** Fixture: mojibake injected into every 4th doc (artifacts drawn
    * from the operator's own map so bytes match across engines). */
  private val MojInject: String = {
    val m = TextHygiene.MojibakeMap.map { case (k, _) => k }
    s" caf${m(3)} don${m(0)}t ${m(2)} ${m(5)}ber"
  }

  /** Fixture: control strings injected into every 6th doc. */
  private val TokInject: (String, String) = {
    val t = TextHygiene.SpecialTokens
    (t.head, s" ${t(3)}mid${t(5)} tail")
  }

  val all: Seq[Q] = Seq(

    // Mojibake repair (the ftfy problem): cp1252 double-decoding
    // artifacts → intended characters, as a chain of LITERAL global
    // replaces — one codegen'd map pass, no regex engine involved, so
    // any engine reproduces it byte-for-byte. n_fixed is the artifact
    // count BEFORE repair (chain-order counting = exactly what the
    // repair removes), the datasheet's encoding-health signal.
    Q("q194_mojibake_repair", {
      val salted = s"CASE WHEN doc_id % 4 = 1 THEN text || '${esc(MojInject)}' ELSE text END"
      s"""WITH s AS (SELECT doc_id, $salted AS t FROM documents)
         |SELECT doc_id,
         |  CAST(${sqlCount("t", TextHygiene.MojibakeMap)} AS BIGINT) AS n_fixed,
         |  ${sqlChain("t", TextHygiene.MojibakeMap)} AS text_fixed
         |FROM s""".stripMargin
    }) {
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 1, concat(col("text"), lit(MojInject)))
              .otherwise(col("text")).as("t"))
          .select(col("doc_id"),
            TextHygiene.mojibakeCount(col("t")).as("n_fixed"),
            TextHygiene.fixMojibake(col("t")).as("text_fixed"))
    },

    // Special-token scrubbing: tokenizer control strings found in raw
    // text ("<|endoftext|>" inside a crawled page fakes a document
    // boundary at training time — the pretraining prompt-injection
    // vector) are counted and removed outright. Literal replaces
    // (the tokens carry regex metachars), one map pass; n_special > 0
    // is the per-doc poisoning flag downstream audits read. The scrub
    // is SINGLE-PASS by contract: adversarial nesting ("<<s>s>")
    // reconstructs a token through removal (TextHygieneSpec pins it),
    // so release gates QUARANTINE flagged docs rather than trust
    // their cleaned text — the count is the load-bearing output.
    Q("q195_special_token_scrub", {
      val pairs = TextHygiene.SpecialTokens.map(_ -> "")
      val salted = s"CASE WHEN doc_id % 6 = 2 THEN '${esc(TokInject._1)}' || text || '${esc(TokInject._2)}' ELSE text END"
      s"""WITH s AS (SELECT doc_id, $salted AS t FROM documents)
         |SELECT doc_id,
         |  CAST(${sqlCount("t", pairs)} AS BIGINT) AS n_special,
         |  ${sqlChain("t", pairs)} AS text_clean
         |FROM s""".stripMargin
    }) {
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 6 === 2,
              concat(lit(TokInject._1), col("text"), lit(TokInject._2)))
              .otherwise(col("text")).as("t"))
          .select(col("doc_id"),
            TextHygiene.specialTokenCount(col("t")).as("n_special"),
            TextHygiene.scrubSpecialTokens(col("t")).as("text_clean"))
    }
  )
}
