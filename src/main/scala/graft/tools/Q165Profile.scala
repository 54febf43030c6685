package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Indexes

/** Phase-level timing for q165 (dev aid: where does the quota-fill
  * chain spend its sf10 time?). */
object Q165Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 4).foreach { round =>
      println(s"--- round $round")
      // The REAL scoring chain (private[graft]) — the profiler must
      // measure the plan q162/q165 actually run, not a hand-inlined
      // copy that silently diverges when the scoring changes.
      val scores = t("dsirScoreFrame construction")(
        graft.queries.CurationQueries.dsirScoreFrame(s, d))
      val doc = t("doc checkpoint (tokenize + score join)")(
        graft.io.Sources.table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(graft.ops.Dedup.tokens(col("text"))).cast("bigint").as("n_tok"))
          .join(scores, "doc_id")
          .localCheckpoint(true))
      val avail = doc.groupBy("source").agg(sum(col("n_tok")).as("avail"))
      val quota = t("waterFillQuota")(
        graft.ops.Sampling.waterFillQuota(avail, "source", "avail", 1L, 2L)
          .select(col("source"), col("quota")).localCheckpoint(true))
      val rk = t("rankAndCumsum construction")(
        graft.ops.Sampling.rankAndCumsum(doc, "source", "doc_id",
          -col("score"), col("n_tok")))
      val n = t("final join+filter count")(
        rk.join(broadcast(quota), "source")
          .filter(col("cw") < col("quota"))
          .queryExecution.toRdd.count())
      println(s"rows: $n")
      val persisted = s.sparkContext.getPersistentRDDs
      println(s"persistent RDDs at round end: ${persisted.size}")
      if (sys.env.contains("Q165_UNPERSIST")) {
        persisted.values.foreach(_.unpersist(blocking = true))
        println("unpersisted all")
      }
    }
    spark.stop()
  }
}
