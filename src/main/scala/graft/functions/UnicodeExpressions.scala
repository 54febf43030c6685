package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFKC) as a native expression.
  *
  * Exact dedup, BPE word typing and shingle hashing all key on raw
  * string bytes, so two CODEPOINT-EQUIVALENT spellings of the same
  * text ("é" precomposed U+00E9 vs decomposed e+U+0301) defeat every
  * one of them. Multilingual corpora must canonicalize before any
  * byte-keyed stage; Spark ships no normalization function, and a
  * Scala UDF would box every row — the same justification as
  * [[DotProductFloat]] (a scalar kernel built-ins cannot express).
  *
  * The 100 TB cost story is the ASCII fast path: text that is pure
  * ASCII is by definition in every normalization form, and the check
  * is an allocation-free byte scan of the UTF8String (no String
  * decode, input reference returned unchanged). On ASCII-dominant
  * corpora the pass costs one memory sweep; only genuinely non-ASCII
  * rows pay the `java.text.Normalizer` call. Semantics are the
  * Unicode standard's, so DuckDB's `nfc_normalize` is an exact oracle
  * for the NFC form (q171/q172 pin it); NFKC compatibility mappings
  * are pinned against explicit per-character replace chains on the
  * fixture's injected characters.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(form == "NFC" || form == "NFKC" || form == "NFD" || form == "NFKD",
    s"UnicodeNormalize: unknown form $form")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_$form"

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  /** Allocation-free: ASCII bytes are non-negative in UTF-8. */
  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if (u.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    if (isAscii(u)) u
    else {
      val str = u.toString
      if (java.text.Normalizer.isNormalized(str, nf)) u
      else UTF8String.fromString(java.text.Normalizer.normalize(str, nf))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unicodeNormalize", this,
      classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) " +
        s"$self.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeExpressions {
  private val eu = org.apache.spark.sql.GraftExpressionBridge

  /** Canonical composition (the dedup-safe form; DuckDB
    * `nfc_normalize` is its exact oracle). */
  def nfc(s: Column): Column =
    eu.column(UnicodeNormalize(eu.expression(s), "NFC"))

  /** Compatibility composition (ligatures/fullwidth/etc. folded —
    * lossier, the form BPE vocabularies usually want). */
  def nfkc(s: Column): Column =
    eu.column(UnicodeNormalize(eu.expression(s), "NFKC"))
}
