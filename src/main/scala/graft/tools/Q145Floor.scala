package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Indexes

/** Pair-count decomposition of q145's containment stage at a given
  * scale — the evidence behind its documented sf10 cost floor. The
  * containment candidate stage is an inverted-index self join whose
  * work is Σ_h min(df_h, cap)·(min(df_h, cap)−1)/2 candidate rows;
  * this prints that sum, the realized candidate/surviving pair
  * counts, and the isolated stage time. */
object Q145Floor {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hs = Indexes.shingles(spark, d)
    val cap = graft.ops.Dedup.DefaultHotShingleCap
    val inv = hs.select(col("doc_id"), explode(col("__hs")).as("__h"))
    val rows = inv.count()
    val pairWork = inv.groupBy("__h").agg(count(lit(1)).as("df"))
      .select(sum(least(col("df"), lit(cap)) * (least(col("df"), lit(cap)) - 1) / 2))
      .collect()(0).getDouble(0)
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.containmentPairsFromHashes(hs, "doc_id",
      thresholdPct = 80)
    val surviving = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"sf":"$d","index_rows":$rows,"candidate_pair_work":$pairWork%.0f,"surviving_pairs":$surviving,"containment_sec":$sec%.1f,"cap":$cap}""")
    spark.stop()
  }
}
