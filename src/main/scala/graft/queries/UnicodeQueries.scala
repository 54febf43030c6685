package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.functions.UnicodeExpressions.{nfc, nfkc}

/** Unicode normalization legs (NFC exact-oracle'd via DuckDB's
  * `nfc_normalize`; NFKC pinned against explicit compatibility
  * mappings of the injected characters). The harness corpus is pure
  * ASCII, so — the multimodal-fixture discipline — each document
  * deterministically grows two codepoint-equivalent variants:
  * `deco` (every 'a' followed by U+0300 combining grave, every "fi"
  * fused to the U+FB01 ligature) and `prec` (the same text with the
  * precomposed U+00E0 and the same ligature). The variants are
  * byte-distinct but canonically equivalent up to the ligature, which
  * only NFKC folds — exactly the two failure modes (dedup split, BPE
  * word-type split) the NFC/NFKC legs exist to close.
  */
object UnicodeQueries {

  /** Spark-side variant builders (exactly mirrored by [[vCte]]):
    * deco = a + U+0300 combining grave (decomposed) + the U+FB01
    * ligature; prec = the precomposed U+00E0 + the same ligature.
    * Explicit escapes — a source-encoding mangle here would silently
    * change the fixture. */
  private def decoCol = regexp_replace(
    regexp_replace(col("text"), "a", "a\u0300"), "fi", "\uFB01")
  private def precCol = regexp_replace(
    regexp_replace(col("text"), "a", "\u00E0"), "fi", "\uFB01")

  /** chr(768) = U+0300, chr(224) = U+00E0 'à', chr(64257) = U+FB01. */
  private val vCte: String =
    """v AS (
      |  SELECT doc_id,
      |         replace(replace(text, 'a', 'a' || chr(768)), 'fi', chr(64257)) AS deco,
      |         replace(replace(text, 'a', chr(224)), 'fi', chr(64257)) AS prec
      |  FROM documents)""".stripMargin

  val all: Seq[Q] = Seq(

    // NFC/NFKC per document: the decomposed variant byte-differs from
    // the precomposed one (raw_eq pins WHERE — only 'a'-free texts
    // coincide), NFC composes them equal (nfc_eq must be 1 for every
    // row), and NFKC additionally folds the ligature (nfkc_text is
    // pinned against the explicit U+FB01 → "fi" mapping). One
    // codegen'd map pass; ASCII rows take the allocation-free fast
    // path, so at 100 TB the leg costs a byte sweep plus the
    // Normalizer call on genuinely non-ASCII rows only.
    Q("q171_nfc_normalize",
      s"""WITH $vCte
         |SELECT doc_id,
         |       CAST(CASE WHEN deco = prec THEN 1 ELSE 0 END AS INT) AS raw_eq,
         |       CAST(CASE WHEN nfc_normalize(deco) = prec THEN 1 ELSE 0 END AS INT) AS nfc_eq,
         |       nfc_normalize(deco) AS nfc_text,
         |       replace(text, 'a', chr(224)) AS nfkc_text
         |FROM v JOIN documents USING (doc_id)""".stripMargin) {
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"), decoCol.as("deco"), precCol.as("prec"))
          .select(col("doc_id"),
            when(col("deco") === col("prec"), 1).otherwise(0)
              .cast("int").as("raw_eq"),
            when(nfc(col("deco")) === col("prec"), 1).otherwise(0)
              .cast("int").as("nfc_eq"),
            nfc(col("deco")).as("nfc_text"),
            nfkc(col("deco")).as("nfkc_text"))
    },

    // The dedup before/after: a mixed-form corpus (every document
    // present in both spellings under distinct ids) exact-dedups to
    // ~2× the true group count on raw bytes and to the true count
    // after NFC — the one-row summary that proves the NFC leg closes
    // the split. Same hash-aggregate shape as q30's exact dedup.
    Q("q172_nfc_dedup",
      s"""WITH $vCte,
         |u AS (SELECT doc_id AS id, prec AS t FROM v
         |      UNION ALL
         |      SELECT doc_id + 1000000, deco FROM v)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT t) AS BIGINT) AS n_raw_groups,
         |       CAST(count(DISTINCT nfc_normalize(t)) AS BIGINT) AS n_nfc_groups
         |FROM u""".stripMargin) {
      (s, d) =>
        val v = table(s, d, "documents")
          .select(col("doc_id"), decoCol.as("deco"), precCol.as("prec"))
        val u = v.select(col("doc_id").as("id"), col("prec").as("t"))
          .unionByName(v.select((col("doc_id") + 1000000L).as("id"),
            col("deco").as("t")))
        u.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("t")).as("n_raw_groups"),
          countDistinct(nfc(col("t"))).as("n_nfc_groups"))
    }
  )
}
