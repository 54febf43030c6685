package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the OTHER public
  * tokenizer family (Kudo 2018, "Subword Regularization"): a piece
  * vocabulary trained by EM-pruning a seed of frequent substrings,
  * applied by per-word Viterbi segmentation under the learned piece
  * probabilities. Complements [[Bpe]]: BPE grows a vocabulary bottom-up
  * by greedy merges; unigram starts from an over-complete seed and
  * prunes — and its application is a max-product lattice DP rather
  * than a replace chain.
  *
  * Determinism (the graft oracle contract), by construction:
  *
  *   - Piece COUNTS stay in exact BIGINT space end to end (seed
  *     substring counts, Viterbi-weighted EM counts, prune ordering).
  *   - Piece PROBABILITIES are IEEE binary64 quotients `c / T` of
  *     those counts (both engines: one division of exactly-converted
  *     integers — bit-identical).
  *   - The Viterbi DP multiplies doubles in the FIXED order the
  *     recurrence defines (cell(j) = cell(j-l).score · p(piece)) and
  *     compares with strict `>`, candidates visited in piece-length
  *     order 1..[[MaxPieceLen]], first maximum wins. Every operation
  *     is an IEEE-exact binary op in a deterministic order, so Spark
  *     and DuckDB produce the same lattice bit for bit — no float
  *     aggregate whose summation order an engine could choose.
  *   - EM is Viterbi-EM (hard assignment, the k-means analogue of
  *     q68's unrolled-Lloyd discipline): deterministic best paths →
  *     exact integer piece counts → quotient probabilities, for
  *     [[EmRounds]] unrolled rounds the oracle replays verbatim.
  *
  * Coverage guarantee: every single character of the corpus alphabet
  * stays in the vocabulary through every round (EM count floored at 1
  * — a pruned-to-zero character would make some word unsegmentable),
  * so the DP's l=1 candidate always exists and no word ever fails.
  *
  * Scale shape: training = one pass over the persisted word-TYPE
  * table per EM round (the DP is a per-row expression over a literal
  * probability map — bounded vocabulary, the k-means-centroid
  * discipline), each ending in a VOCABULARY-sized aggregate and a
  * bounded collect. Application joins the bounded per-TYPE
  * segmentation table back to word instances — one narrow shuffle —
  * so tokenizing 100 TB never runs the DP per instance.
  */
object Unigram {

  /** Longest piece considered (seed and DP lattice width). */
  val MaxPieceLen = 4

  /** Seed vocabulary: top multi-character pieces kept by seed count. */
  val SeedMulti = 192

  /** Final vocabulary: top multi-character pieces after EM. */
  val FinalMulti = 128

  /** Unrolled Viterbi-EM rounds (the oracle replays each). */
  val EmRounds = 2

  private val CellType = "struct<score:double,seg:string>"

  /** All substrings of length 1..[[MaxPieceLen]] of `w`, one entry
    * per occurrence position (the seed counting universe). Guarded
    * per length: Spark's `sequence(1, 0)` is the descending [1, 0]
    * (the q186 lesson); DuckDB's `range` is empty there. */
  def seedPieces(w: Column): Column =
    concat((1 to MaxPieceLen).map { l =>
      when(length(w) >= l,
        transform(sequence(lit(1), length(w) - l + 1),
          i => call_function("substring", w, i, lit(l))))
        .otherwise(array().cast("array<string>"))
    }: _*)

  /** One Viterbi DP cell: best (score, '|'-joined segmentation) over
    * pieces of length 1..[[MaxPieceLen]] ending at position `j`,
    * probabilities from the literal map `m`. Candidates materialize
    * ONCE into an array in length order, then a left-to-right reduce
    * with strict `>` keeps the first maximum — ties go to the
    * shortest piece, identical on both engines (the nested-CASE
    * spelling would re-evaluate each candidate 2^l times — the
    * no-CSE-in-lambdas rule). The l=1 candidate always resolves
    * (alphabet coverage), so the filtered array is never empty. */
  private def bestCell(acc: Column, j: Column, w: Column, m: Column): Column = {
    def cand(l: Int): Column = {
      val piece = call_function("substring", w, j - l + 1, lit(l))
      val prev = element_at(acc, j - l + 1)
      when(j >= l && element_at(m, piece).isNotNull,
        struct((prev("score") * element_at(m, piece)).as("score"),
          concat(prev("seg"), lit("|"), piece).as("seg")))
        .otherwise(lit(null).cast(CellType))
    }
    val valid = filter(array((1 to MaxPieceLen).map(cand): _*),
      c => c.isNotNull)
    aggregate(slice(valid, 2, MaxPieceLen), element_at(valid, 1),
      (b, c) => when(c("score") > b("score"), c).otherwise(b))
  }

  /** Viterbi segmentation of one word under probability map `m`:
    * returns the final cell (score, seg) where seg = "|p1|p2|…".
    * Expression-space lattice DP: aggregate over positions 1..len(w),
    * accumulator = the array of solved cells (cell for prefix length
    * p lives at index p+1; index 1 is the empty prefix at score 1). */
  def viterbiCell(w: Column, m: Column): Column =
    when(length(w) >= 1,
      aggregate(
        sequence(lit(1), length(w)),
        array(struct(lit(1.0).as("score"), lit("").as("seg"))),
        (acc, j) => concat(acc, array(bestCell(acc, j, w, m))),
        acc => element_at(acc, size(acc))))
      // Empty input (upstream-filtered in every caller, but Spark's
      // sequence(1, 0) is the descending [1, 0] — never risk it).
      .otherwise(struct(lit(1.0).as("score"), lit("").as("seg")))

  /** Probability map literal over a (piece, count) vocabulary:
    * p = c.toDouble / T.toDouble, T = Σ counts — ONE IEEE division of
    * exactly-converted integers per piece. */
  def probsLit(vocab: Seq[(String, Long)]): Column = {
    val t = vocab.map(_._2).sum.toDouble
    typedlit(vocab.map { case (p, c) => p -> c.toDouble / t }.toMap)
  }

  /** Append `(score, seg)` columns from a Viterbi pass over `wCol`
    * under the (piece, count) vocabulary. */
  def withSegmentation(types: DataFrame, wCol: String,
                       vocab: Seq[(String, Long)]): DataFrame = {
    val cell = viterbiCell(col(wCol), probsLit(vocab))
    types.withColumn("__cell", cell)
      .withColumn("seg", col("__cell")("seg"))
      .withColumn("n_pieces",
        (size(split(col("seg"), "\\|")) - 1).cast("bigint"))
      .drop("__cell")
  }

  /** word → (seg, nPieces) under `vocab` — the EXACT Scala mirror of
    * [[viterbiCell]] (same candidate order, same strict-`>` first-win
    * tie-break, same fixed-order IEEE double products), pinned
    * against it by UnigramSpec. Used on the APPLY path where a
    * per-word-type hash-map lookup beats the expression DP's literal-
    * map linear scan, wrapped in the same per-partition memo as
    * [[Bpe.withMergedReps]] (the sanctioned stateful map: a trained
    * vocabulary is bounded metadata). */
  def segmentFn(vocab: Seq[(String, Long)]): String => (String, Long) = {
    val t = vocab.map(_._2).sum.toDouble
    val probs = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, c) => probs.put(p, c.toDouble / t): Unit }
    w => {
      val n = w.length
      val score = new Array[Double](n + 1)
      val bp = new Array[Int](n + 1)
      score(0) = 1.0
      var j = 1
      while (j <= n) {
        var best = -1.0
        var bl = 0
        var l = 1
        while (l <= MaxPieceLen && l <= j) {
          val p = probs.get(w.substring(j - l, j))
          if (p != null) {
            val s = score(j - l) * p.doubleValue()
            if (s > best) { best = s; bl = l }
          }
          l += 1
        }
        // Coverage fail-fast: training guarantees every alphabet
        // character is a vocab piece, so bl == 0 means this vocab
        // does not cover this word (stale persisted index after a
        // corpus regeneration, or an external caller's vocab). The
        // backtrack below would otherwise loop on bp=0 and die as an
        // ArrayIndexOutOfBoundsException — or, worse, an uncovered
        // PREFIX would silently propagate a negative score into a
        // garbage segmentation. Surface it as a named contract error.
        if (bl == 0) throw new IllegalStateException(
          s"unigram vocab lacks alphabet coverage for '$w' at position $j")
        score(j) = best
        bp(j) = bl
        j += 1
      }
      val pieces = new Array[String](n)
      var np = 0
      var pos = n
      while (pos > 0) { np += 1; pieces(n - np) = w.substring(pos - bp(pos), pos); pos -= bp(pos) }
      val sb = new java.lang.StringBuilder(w.length + np)
      var k = n - np
      while (k < n) { sb.append('|').append(pieces(k)): Unit; k += 1 }
      (sb.toString, np.toLong)
    }
  }

  /** Append per-document unigram token count + segmented text from a
    * word-array column: ONE per-partition pass with a word-type →
    * segmentation memo (the [[Bpe.withMergedReps]] contract — the DP
    * runs once per word TYPE per partition; instances pay a hash
    * lookup). `textCol` renders each word as "p1|p2|…", words joined
    * by spaces — the full segmentation, so the oracle pins every DP
    * decision, not just counts. */
  def withSegmentedWords(df: DataFrame, wsCol: String,
                         vocab: Seq[(String, Long)],
                         nTokCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val idx = df.schema.fieldIndex(wsCol)
    val kept = df.schema.fields.indices.filter(_ != idx)
    val schema = StructType(kept.map(df.schema.fields))
      .add(nTokCol, LongType).add(textCol, StringType)
    df.mapPartitions { rows =>
      val seg = segmentFn(vocab)
      val memo = new java.util.HashMap[String, (String, Long)]()
      rows.map { r =>
        val ws = r.getSeq[String](idx)
        var n = 0L
        val sb = new java.lang.StringBuilder()
        ws.foreach { w =>
          var v = memo.get(w)
          if (v == null) {
            v = seg(w)
            if (memo.size < Bpe.RepMemoCap) memo.put(w, v): Unit
          }
          if (sb.length > 0) sb.append(' ')
          // Drop the leading '|' (empty-safe: an empty word — which
          // wordArray filters upstream — segments to "").
          if (v._1.nonEmpty) sb.append(v._1.substring(1)): Unit
          n += v._2
        }
        org.apache.spark.sql.Row.fromSeq(kept.map(r.get) :+ n :+ sb.toString)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Train the final (piece, count) vocabulary over a word-TYPE table
    * `(w, n)`: seed counts → [[SeedMulti]]+alphabet seed →
    * [[EmRounds]] Viterbi-EM rounds → [[FinalMulti]]+alphabet prune.
    * The returned counts are the LAST EM round's exact integer piece
    * counts (alphabet floored at 1), the numbers the application
    * probabilities derive from. Bounded: every collect here is
    * vocabulary-sized (≤ SeedMulti + alphabet). */
  def trainVocab(types: DataFrame): Seq[(String, Long)] = {
    val seed = types
      .select(explode(seedPieces(col("w"))).as("p"), col("n"))
      .groupBy("p").agg(sum(col("n")).as("c"))
    // The corpus alphabet: never pruned (coverage guarantee).
    val singles = seed.filter(length(col("p")) === 1)
      .orderBy("p").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    def topMulti(counts: DataFrame, k: Int): Seq[(String, Long)] =
      counts.filter(length(col("p")) > 1)
        .orderBy(col("c").desc, col("p").asc).limit(k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    var vocab: Seq[(String, Long)] = singles ++ topMulti(seed, SeedMulti)
    (1 to EmRounds).foreach { _ =>
      val counts = withSegmentation(types, "w", vocab)
        .select(explode(filter(split(col("seg"), "\\|"),
          x => x =!= "")).as("p"), col("n"))
        .groupBy("p").agg(sum(col("n")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // Multi pieces survive only if the E-step used them; alphabet
      // floors at count 1 so its probabilities never vanish.
      vocab = singles.map { case (ch, _) =>
        ch -> math.max(counts.getOrElse(ch, 0L), 1L) } ++
        vocab.collect { case (p, _) if p.length > 1 && counts.contains(p) =>
          p -> counts(p) }
    }
    val multiFinal = vocab.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(FinalMulti)
    vocab.filter(_._1.length == 1) ++ multiFinal
  }
}
