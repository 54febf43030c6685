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
    // The prefix-filtered stage's candidate volume: Σ_h df_pre(h)·df(h)
    // over the df-ordered prefix index — the number the AllPairs
    // rewrite pays instead of the self join's Σ df·(df−1)/2.
    val pre = Indexes.containmentPrefix(spark, d, 80)
    val preRows = pre.count()
    val df = inv.groupBy("__h").agg(count(lit(1)).as("df"))
    val prefixWork = pre.groupBy("__h").agg(count(lit(1)).as("dfp"))
      .join(df, "__h")
      .select(sum(col("dfp") * col("df"))).collect()(0).getLong(0)
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.containmentPairsFromHashes(hs, "doc_id",
      thresholdPct = 80)
    val surviving = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val survivingPre = graft.ops.Dedup.containmentPairsFromPrefix(
      pre, hs, "doc_id", thresholdPct = 80).count()
    val secPre = (System.nanoTime() - t1) / 1e9
    // Set-collapsed stage (the declared path): distinct-set count,
    // collapsed self-join work, end-to-end time.
    val members = Indexes.containmentGroups(spark, d)
    val reps = Indexes.containmentReps(spark, d)
    val nGroups = members.select("__gid").distinct().count()
    val collWork = reps
      .select(explode(col("__hs")).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("df"))
      .select(sum(col("df") * (col("df") - 1) / 2)).collect()(0).getDouble(0)
    val t2 = System.nanoTime()
    val survivingColl = graft.ops.Dedup.containmentPairsCollapsed(
      members, reps, "doc_id", thresholdPct = 80).count()
    val secColl = (System.nanoTime() - t2) / 1e9
    println(f"""{"sf":"$d","index_rows":$rows,"candidate_pair_work":$pairWork%.0f,"prefix_rows":$preRows,"prefix_candidate_work":$prefixWork,"n_set_groups":$nGroups,"collapsed_candidate_work":$collWork%.0f,"surviving_pairs":$surviving,"surviving_pairs_prefix":$survivingPre,"surviving_pairs_collapsed":$survivingColl,"containment_sec":$sec%.1f,"containment_prefix_sec":$secPre%.1f,"containment_collapsed_sec":$secColl%.1f,"cap":$cap}""")
    spark.stop()
  }
}
