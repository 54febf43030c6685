package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL byte-pair encoding: a greedy merge table trained on the
  * corpus, then applied as a bounded chain of plain string replaces —
  * the trained-vocabulary tokenizer a training-data pipeline budgets
  * with ([[TextAnalysis.bpeTokenCount]] remains as the documented
  * one-pass regex APPROXIMATION for pipelines that cannot afford a
  * trained vocabulary; this is the real thing).
  *
  * Determinism is the design driver (the graft oracle contract): the
  * whole algorithm stays in exact string/integer space.
  *
  *   - Words are bracket-wrapped per symbol (`"hello"` →
  *     `"<h><e><l><l><o>"`), so ONE merge rule is ONE
  *     leftmost-non-overlapping `replace` of `"<a><b>"` with
  *     `"<ab>"`. The wrapping makes false matches impossible — a
  *     pattern can neither match the suffix of a longer symbol (no
  *     `<` before it) nor bleed into the next symbol (no `>` after
  *     it) — and adjacent occurrences share no characters, so every
  *     engine's replace (leftmost, continue after the replacement)
  *     produces the identical result. `<`/`>` cannot collide with
  *     content: symbols come from [[TextAnalysis.normalize]]'s
  *     `[a-z0-9]` alphabet.
  *   - Training is `nMerges` UNROLLED iterations (the q68 k-means
  *     discipline): count adjacent symbol pairs corpus-wide, take the
  *     argmax with the total order (count DESC, a ASC, b ASC) — ASCII
  *     on `[a-z0-9]`, identical in any engine — apply the rule,
  *     repeat. The DuckDB oracle replays the same unrolled chain.
  *   - Applying rules once each, in training order, equals canonical
  *     rank-order BPE apply: a merge can only create adjacencies
  *     involving its NEW symbol, which only LATER-trained rules can
  *     reference, so earlier rules never become applicable again.
  *
  * Scale shape: training is `nMerges` corpus aggregates, each ending
  * in a ONE-ROW collect (a merge rule is bounded metadata — the
  * k-means-centroid/PQ-codebook discipline), paid once per corpus and
  * memoized in the index registry. Application is a pure per-document
  * map expression — a replace chain inside whole-stage codegen, no
  * shuffle, no UDF — so tokenizing 100 TB costs one map pass.
  */
object Bpe {

  /** Per-symbol bracket wrapping of one word. */
  def charWrap(w: Column): Column = regexp_replace(w, "(.)", "<$1>")

  /** Normalized, empty-filtered word array of a document. */
  def wordArray(text: Column): Column =
    filter(split(TextAnalysis.normalize(text), " "), w => w =!= "")

  /** The symbol array of a wrapped representation. */
  def symbols(rep: Column): Column = split(trim(rep, "<>"), "><")

  /** Apply a trained merge table (in training order — see the
    * rank-order equivalence note above). */
  def applyMerges(rep: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(rep) { case (r, (a, b)) =>
      replace(r, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }

  /** Adjacent symbol pairs of each representation row — `(a, b)`
    * structs, one per adjacency. `zip_with` over two slices keeps the
    * pair generation a pure array expression (the slices are lambda
    * ARGUMENTS, evaluated once — not captured subtrees). */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** Iterations between lineage truncations in [[trainMerges]]: the
    * loop appends one `replace` per merge, so UNTRUNCATED iteration k
    * re-evaluates k replaces over the corpus — O(n²) string work and
    * an ever-deeper Catalyst plan across n merges (fine at the old
    * toy n = 10, ruinous at a production-shaped 64+). Materializing
    * the representations every 8 merges caps both the per-iteration
    * replace chain and the analysis depth at a constant, making total
    * training work ∝ nMerges · corpus — the loop's scale shape is
    * then exactly "n bounded aggregates", as documented above. */
  val TruncateEvery = 8

  /** Train a greedy BPE merge table over `docs(textCol)`: `nMerges`
    * bounded iterations, each one corpus-wide pair count + a one-row
    * argmax collect. Stops early if no adjacent pair remains. */
  def trainMerges(docs: DataFrame, textCol: String,
                  nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"trainMerges: nMerges=$nMerges")
    var reps = docs
      .select(explode(wordArray(col(textCol))).as("w"))
      .select(charWrap(col("w")).as("rep"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val top = reps
        .select(symbols(col("rep")).as("syms"))
        .select(explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        reps = reps.withColumn("rep",
          replace(col("rep"), lit(s"<$a><$b>"), lit(s"<$a$b>")))
        // Bake accumulated replaces into stored rows so the chain —
        // and the plan — stay constant-depth (eager: the truncation
        // must happen HERE, not lazily inside the next aggregate).
        // Superseded checkpoint blocks are freed by the context
        // cleaner once unreferenced.
        if (merges.size % TruncateEvery == 0)
          reps = reps.localCheckpoint(true)
      }
    }
    merges.toSeq
  }
}
