package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-cost curve for the batched BPE trainer — the measurement
  * behind the 32k-vocabulary claim (ROUND12_NOTES).
  *
  * The harness corpus cannot carry the measurement directly: its
  * `documents.text` vocabulary is 31 word types and greedy merging
  * EXHAUSTS at 89 rules (every type fused to one symbol) — the
  * declared "n512" registry tables hold 89 rows, a cap, not a count.
  * So the curve runs on a production-SHAPED vocabulary derived
  * deterministically from the same corpus: each doc's md5 hex split
  * into 8-char words (16-symbol alphabet, |types| ≈ |docs|·4 —
  * hundreds of thousands of short types, the Zipf-flat worst case for
  * a word-type trainer, upper-bounding any natural corpus's per-merge
  * cost at equal type count).
  *
  * Prints one JSON line per configuration:
  *   {"merges":N,"sec":t,"aggregates":a,"rules":r}
  * where `aggregates` counts the corpus-wide pair aggregates actually
  * run — the batching win is merges/aggregates (sequential = 1.0).
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Two derived corpus shapes (the natural harness vocabulary is 31
    // types and exhausts at 89 merges — it cannot carry the curve):
    //  - "uniform": md5-hex 8-grams as words. Near-uniform counts —
    //    the ADVERSARIAL case for batching (ubiquitous near-ties keep
    //    the spawn bound tight, batches degrade to 1–2 merges).
    //  - "zipf" (default): per-instance token id k = 2^20 div (h+1)
    //    with h a uniform 20-bit hash of (doc_id, position) — count of
    //    id v ∝ 1/v(v+1), a Zipf-like head-heavy vocabulary with a
    //    long rare tail (the natural-language shape), spelled in hex.
    //    Deterministic, derived only from the harness corpus.
    val shape = sys.env.getOrElse("SPARK_GRAFT_BPE_SHAPE", "zipf")
    val base = graft.io.Sources.tableRebalanced(spark, sfDir, "documents")
    val docs = (shape match {
      case "uniform" => base.select(concat_ws(" ",
        (0 until 4).map(i => substring(md5(col("text")), 1 + 8 * i, 8)): _*)
        .as("text"))
      case "zipf" =>
        // Token id j = floor(V^u), u uniform in [0,1) from a 30-bit
        // hash: P(j = v) ∝ 1/v — rank-frequency Zipf with exponent 1
        // (the natural-language shape; the v = C div (h+1) variant has
        // exponent 2 and realizes only ~2√N types from N instances).
        // V = 2^20 realizes tens of thousands of types at sf0.1.
        val C = 1073741824L
        base.select(array_join(
          transform(sequence(lit(0), size(split(col("text"), " ")) - 1),
            i => lower(hex(floor(pow(lit(1048576.0),
              pmod(xxhash64(col("doc_id"), i), lit(C)).cast("double") / lit(C.toDouble)))
              .cast("long")))),
          " ").as("text"))
      case other => throw new IllegalArgumentException(s"shape: $other")
    }).localCheckpoint(true)
    val nTypes = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    System.err.println(s"derived corpus: $nTypes word types")

    val counts = args.toSeq match {
      case Nil => Seq(512, 1024, 2048, 8192)
      case xs => xs.map(_.toInt)
    }
    val trainer = sys.env.getOrElse("SPARK_GRAFT_BPE_TRAINER", "inmemory")
    counts.foreach { n =>
      val t0 = System.nanoTime()
      val rules = trainer match {
        case "inmemory" => graft.ops.Bpe.trainMergesInMemory(docs, "text", n)
        case "batched" => graft.ops.Bpe.trainMergesBatched(docs, "text", n)
        case "sequential" => graft.ops.Bpe.trainMerges(docs, "text", n)
        case other => throw new IllegalArgumentException(s"trainer: $other")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"trainer":"$trainer","shape":"$shape","merges":$n,"sec":$sec%.1f,"rules":${rules.size}}""")
    }
    spark.stop()
  }
}
