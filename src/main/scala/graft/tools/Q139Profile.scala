package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Indexes

/** Phase-level timing for q139 (dev aid for the variance pin). */
object Q139Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = graft.io.Sources.table(s, d, "documents")
      val mx = t("max doc_id")(docs.agg(max(col("doc_id"))).collect()(0).getLong(0))
      val cutoff = (mx * 9) / 10
      val origins = t("origins read")(Indexes.shingleOrigins(s, d, cutoff))
      val cedges = t("cedges read")(Indexes.domainEdges(s, d, cutoff))
      val bsh = Indexes.shingles(s, d)
        .filter(col("doc_id") >= cutoff)
        .select(col("doc_id"), col("source"), explode(col("__hs")).as("h"))
      val probed = bsh.join(origins.select("h", "vsrc"), Seq("h"), "left")
      val known = probed
        .filter(col("vsrc").isNotNull && col("source") =!= col("vsrc"))
        .select(col("source").as("u"), col("vsrc").as("v"))
      val novelSh = probed.filter(col("vsrc").isNull)
        .select("doc_id", "source", "h")
      val osrcB = novelSh.groupBy("h").agg(min(col("doc_id")).as("odoc"))
        .join(docs.select(col("doc_id").as("odoc"),
          col("source").as("vsrcb")), Seq("odoc"))
      val novel = novelSh.join(osrcB.select("h", "vsrcb"), "h")
        .filter(col("source") =!= col("vsrcb"))
        .select(col("source").as("u"), col("vsrcb").as("v"))
      val delta = t("delta checkpoint")(known.union(novel)
        .groupBy("u", "v").agg(count(lit(1)).as("w"))
        .localCheckpoint(true))
      val att = t("att checkpoint")(cedges.union(delta)
        .groupBy("u", "v").agg(sum(col("w")).as("w"))
        .localCheckpoint(true))
      val din = delta.groupBy(col("v")).agg(sum(col("w")).as("new_in_w"))
      val out = graft.ops.Graph.pageRank(att,
          docs.select("source").distinct(), "source", 6)
        .join(din, Seq("v"), "left")
        .select(col("v").as("source"), col("r").as("rank_scaled"),
          coalesce(col("new_in_w"), lit(0L)).as("new_in_w"))
      t("pagerank+materialize")(out.queryExecution.toRdd.count())
      val out2 = graft.ops.Graph.pageRank(att,
          docs.select("source").distinct(), "source",
          6, validateEdges = false)
        .join(din, Seq("v"), "left")
      t("pagerank novalidate")(out2.queryExecution.toRdd.count())
      val out3 = graft.ops.Graph.pageRank(att.coalesce(1),
          docs.select("source").distinct().coalesce(1), "source",
          6, validateEdges = false)
        .join(din, Seq("v"), "left")
      t("pagerank coalesced")(out3.queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
