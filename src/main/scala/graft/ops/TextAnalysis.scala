package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Functions.portableHash64

/** Text analysis for training-data pipelines: token counting
  * (whitespace + a BPE-ish regex), quality scoring (length / token /
  * stopword ratios), a deterministic language-ID heuristic (character
  * n-gram marker scoring), and content fingerprints (polynomial
  * rolling hash over the token stream).
  *
  * Scale design: every operator here is a scalar/array expression per
  * document — a single codegen'd map pass, no shuffle, no UDF. The
  * only shuffles in the declared queries are the final per-source
  * rollups (partial aggregation applies). All functions are
  * engine-portable: the DuckDB oracle evaluates the same expressions
  * (same regexes, same fold order) and must agree bit-for-bit.
  */
object TextAnalysis {

  /** Rolling-hash modulus (Mersenne prime 2^31-1). */
  val P: Long = 2147483647L

  /** English stopword markers used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** BPE-ish tokenizer regex: letter runs, digit runs, single
    * punctuation marks. Alternatives are applied left-to-right at
    * each position in both engines (all engines' regex scans are
    * non-overlapping leftmost), so counts agree. */
  val BpeIshRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count (regex token stream length) — the documented
    * one-pass APPROXIMATION of a trained tokenizer's budget, for
    * pipelines that cannot afford a vocabulary. The real trained
    * merge-table tokenizer is [[Bpe]] (q98); budget queries that need
    * true token counts should apply its merge table instead. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIshRegex), lit(0)))

  /** Count of tokens that are stopwords. */
  def stopwordCount(ws: Column): Column =
    size(filter(ws, w => w.isin(Stopwords: _*)))

  /** Non-space character count (for avg token length). */
  def nonSpaceChars(text: Column): Column =
    length(regexp_replace(text, " ", ""))

  /** Language-ID marker profiles: per language, a fixed alternation
    * of character bigrams; the score is the count of non-overlapping
    * occurrences. Deterministic and engine-portable (fixed-width
    * alternatives ⇒ identical counts on any regex engine). Ordered
    * alphabetically — the prediction tie-break follows this order. */
  val LangProfiles: Seq[(String, String)] = Seq(
    "de" -> "ch|ei|de|en|sch",
    "en" -> "th|he|in|er|re",
    "es" -> "os|la|el|as|do",
    "fr" -> "le|ou|es|on|eu",
    "zh" -> "zh|sh|ng|xi|ua")

  /** Marker score for one language profile. */
  def langScore(text: Column, profile: String): Column =
    size(regexp_extract_all(text, lit(profile), lit(0)))

  /** Predicted language: first language (alphabetical) achieving the
    * maximum marker score. `scores` must align with [[LangProfiles]]. */
  def langPredict(scores: Seq[Column]): Column = {
    val m = greatest(scores: _*)
    LangProfiles.map(_._1).zip(scores).foldRight(lit(null).cast("string")) {
      case ((lang, s), rest) => when(s === m, lit(lang)).otherwise(rest)
    }
  }

  /** Polynomial rolling hash of the token stream (order-sensitive
    * content fingerprint): fold h = (31*h + hash64(w) mod P) mod P
    * left-to-right. DuckDB computes the identical fold via
    * `list_reduce(list_prepend(0, hashes), ...)`. */
  def rollingFingerprint(ws: Column): Column =
    aggregate(ws, lit(0L),
      (acc, w) => pmod(acc * 31 + pmod(portableHash64(w), lit(P)), lit(P)))

  /** Corpus-cleaning normalization: lowercase, strip everything but
    * `[a-z0-9 ]`, collapse whitespace runs, trim. Deliberately plain
    * regex built-ins (codegen'd, engine-portable) — normalization runs
    * over every byte of a 100 TB corpus, so it must stay inside
    * whole-stage codegen. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** [[normalize]] with Unicode NFC canonicalization FIRST
    * ([[graft.functions.UnicodeExpressions.nfc]]): codepoint-
    * equivalent spellings ("é" precomposed vs e+combining-acute)
    * byte-diverge and so defeat exact dedup and split BPE word types
    * unless composed before any byte-keyed stage. On pure-ASCII text
    * the two functions are IDENTICAL (ASCII is already in NFC and the
    * fast path is an allocation-free byte scan), which is why the
    * ASCII-oracle'd consumers can adopt this variant with their
    * oracles gaining only a `nfc_normalize(...)` wrap. Multilingual
    * corpora should use this everywhere; q171/q172 oracle-gate the
    * NFC leg on injected decomposed characters. */
  def normalizeNfc(text: Column): Column =
    normalize(graft.functions.UnicodeExpressions.nfc(text))

  /** PII redaction patterns (emails, international-ish phone numbers,
    * 13-16-digit card numbers) → fixed placeholder tokens. Fixed-form
    * regexes chosen to match identically across regex engines. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  val CardRe = "[0-9]{13,16}"

  /** Redact PII in order: emails first (their digits must never
    * half-match the phone pattern), then card numbers (a 13-16-digit
    * run also satisfies the looser phone pattern, so cards must win),
    * then phones. */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noCard = regexp_replace(noEmail, CardRe, "<CARD>")
    regexp_replace(noCard, PhoneRe, "<PHONE>")
  }

  // ── HTML / markup boilerplate extraction (crawl step 0) ──────────

  /** `<script>`/`<style>` subtrees — removed FIRST, because their
    * contents are code, not text (a tag-stripper alone would leak
    * `var n=42` into the "visible text"). Non-greedy, dotall,
    * case-insensitive; no backreferences, so Java regex (Spark) and
    * RE2 (DuckDB) match identically. */
  val ScriptStyleRe: String =
    "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"

  /** HTML comments. */
  val HtmlCommentRe: String = "(?s)<!--.*?-->"

  /** Any remaining markup tag. */
  val TagRe: String = "<[^>]*>"

  /** Block-level container contents, in document order. Non-greedy to
    * the nearest closing block tag — a FLAT block model: nested
    * markup yields innermost-first fragments (deterministically and
    * identically on both regex engines), which is the right unit for
    * boilerplate separation — a nav inside a wrapper div is still its
    * own low-density block. */
  val BlockRe: String =
    "(?is)<(?:div|p|nav|aside|header|footer|section|article)[^>]*>" +
      "(.*?)</(?:div|p|nav|aside|header|footer|section|article)>"

  /** Scripts, styles and comments out — the shared first stage of
    * [[pageText]] and [[blockContents]]. */
  def stripScriptStyle(html: Column): Column =
    regexp_replace(regexp_replace(html, ScriptStyleRe, " "), HtmlCommentRe, " ")

  /** Whole-page visible text: script/style/comment subtrees removed,
    * every remaining tag → space, whitespace collapsed, trimmed.
    * Pure codegen'd regex chain — markup stripping runs over every
    * byte of a crawl, so like [[normalize]] it must stay a map pass
    * inside whole-stage codegen. */
  def pageText(html: Column): Column =
    trim(regexp_replace(regexp_replace(
      stripScriptStyle(html), TagRe, " "), " +", " "))

  /** Visible text of ONE extracted block fragment. */
  def blockText(raw: Column): Column =
    trim(regexp_replace(regexp_replace(raw, TagRe, " "), " +", " "))

  /** Contents of every block-level container, in document order. */
  def blockContents(html: Column): Column =
    regexp_extract_all(stripScriptStyle(html), lit(BlockRe), lit(1))

  /** Main-content selection by INTEGER text density: per block,
    * score = len(text)²·1000 / (len(raw)+1) — long AND markup-light
    * blocks win (the boilerpipe signal with both of its factors:
    * a link-farm nav is markup-dense, a promo line is short; the
    * main body is neither). Returns the argmax block as a struct
    * (s = score, ni = −index, t = text): `array_max` over the scored
    * struct array is the argmax with ties broken by FIRST block —
    * a single codegen'd expression per document, no explode, no
    * shuffle, no window. The float division inside `floor` is exact:
    * numerator ≤ len²·1000 < 2⁵³ and a non-divisible quotient sits
    * ≥ 1/len(raw) below the next integer — 10⁸ ulps away from any
    * rounding hazard — so `floor(a/b)` equals the oracle's integer
    * `//` bit-for-bit. */
  def mainBlockStruct(html: Column): Column = {
    val scored = transform(blockContents(html), (b, i) => {
      val t = blockText(b)
      struct(
        floor(length(t).cast("long") * length(t) * lit(1000L)
          / (length(b) + lit(1))).as("s"),
        (-i).cast("long").as("ni"),
        t.as("t"))
    })
    array_max(scored)
  }

  /** The selected main-content text (null when the page has no
    * block-level containers at all). */
  def mainText(html: Column): Column = mainBlockStruct(html).getField("t")

  /** Sliding-window token chunks — the concat-and-chunk prep step
    * that turns variable-length documents into fixed-ish training
    * windows. One (start offset) element per `stride` tokens; callers
    * explode it and [[chunkAt]] each offset. Pure array expressions:
    * the chunking of a 100 TB corpus is a map pass with NO shuffle
    * and no UDF, and slices reference the token array rather than
    * copying the document per chunk. */
  def chunkStarts(ws: Column, stride: Int): Column = {
    require(stride > 0, s"chunkStarts: stride must be positive, got $stride")
    sequence(lit(0), greatest(size(ws) - 1, lit(0)), lit(stride))
  }

  /** The `chunkSize`-token window of `ws` starting at 0-based
    * `start` (shorter at the tail, like any clamping slice). */
  def chunkAt(ws: Column, start: Column, chunkSize: Int): Column =
    slice(ws, start + 1, lit(chunkSize))

  /** All `n`-token sliding spans of the token array, each re-joined
    * with single spaces — the unit of SPAN-LEVEL exact dedup
    * (duplicated n-gram passages across documents, the
    * boilerplate/citation/license-block signal exact doc-level dedup
    * misses). Pure array expressions (`sequence` + `slice` +
    * `concat_ws`): generating every span of a 100 TB corpus is one
    * codegen'd map pass, and each span SLICES the token array rather
    * than copying the document. Documents shorter than `n` tokens
    * yield an empty array — guarded explicitly because
    * `sequence(1, len-n+1)` would otherwise generate a DESCENDING
    * range when `len < n`.
    *
    * CALLER CONTRACT: pass `ws` as a MATERIALIZED column reference
    * (`.select(tokenExpr.as("toks"))` first, then
    * `spanGrams(col("toks"), n)`), never an inline expression tree.
    * The slice lambda CAPTURES `ws`, and Spark performs no
    * subexpression elimination inside higher-order-function lambdas —
    * an inline `split(normalize(text))` would re-run its regexes once
    * per SPAN instead of once per document (measured 7x slower at
    * harness scale, and span-count-proportional at 100 TB). */
  def spanGrams(ws: Column, n: Int): Column = {
    require(n > 0, s"spanGrams: span length must be positive, got $n")
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
