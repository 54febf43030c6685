package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bpe
import graft.queries.Indexes

/** Phase decomposition of the trained-BPE apply pass — where do the
  * ~24 s/query sf10 tokenize passes actually go? Times, separately:
  * raw text scan, normalize only, wordArray (normalize+split+filter),
  * the full withMergedReps object pass, and the q129 vocab-derivation
  * job (corpus-wide distinct). Each phase repeated `REPS` times on a
  * warm session; first (warmup) timing discarded from judgment.
  */
object BpeApplyProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Sources.table(spark, d, "documents")
    val merges = Indexes.bpeMerges(spark, d, 512)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 0 until 2) {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count(): Unit
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 1) println(f"""{"phase":"$name","sec":$sec%.2f}""")
      }
    }
    time("scan_len")(docs.select(sum(length(col("text")))))
    time("normalize")(docs.select(
      sum(length(graft.ops.TextAnalysis.normalize(col("text"))))))
    time("word_array")(docs.select(
      sum(size(Bpe.wordArray(col("text"))))))
    time("merged_reps")(Bpe.withMergedReps(
      docs.select(col("doc_id"), Bpe.wordArray(col("text")).as("__ws")),
      "__ws", merges, "__reps", dropInput = true)
      .select(sum(size(col("__reps")))))
    time("vocab_distinct")(
      docs.select(explode(Bpe.wordArray(col("text"))).as("w")).distinct()
        .select(count(lit(1))))
    spark.stop()
  }
}
