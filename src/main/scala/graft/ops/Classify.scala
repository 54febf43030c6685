package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions.portableHash64

/** Model-based quality filtering: a nearest-centroid (Rocchio)
  * classifier DISTILLED from a rule heuristic — the production
  * pattern behind classifier-based corpus curation (a cheap rule
  * labels a seed set; a model trained on those labels generalizes
  * the judgment to every document, and replaces the rule as the
  * shipping filter).
  *
  * Determinism is the design driver (the graft oracle contract), so
  * the whole pipeline stays in exact scaled-integer space — the q68
  * k-means discipline applied to supervised classification:
  *
  *   - features are hashed-bucket token counts (md5-derived 64-bit
  *     hash mod [[NumBuckets]]) summed from the persisted
  *     term-frequency index — exact integers, fixed width;
  *   - class centroids are `floor(sum · Scale / n)` — bounded driver
  *     metadata (2 rows × [[NumBuckets]] longs), identical floor
  *     division in any engine on non-negative sums;
  *   - inference compares exact bigint squared distances in the
  *     scaled space, ties resolving to the positive class.
  *
  * Scale shape: features are ONE fixed-width aggregate over the tf
  * index (map-side combine; [[NumBuckets]] columns regardless of
  * vocabulary), training is one ≤2-row collect, inference is a pure
  * map expression over the feature row — classifying 100 TB costs
  * the feature aggregate plus a map pass. A production deployment
  * swaps in more buckets and richer per-doc signals; the dataflow
  * (aggregate → bounded fit → map-expression predict) is the part
  * that has to scale, and is what q103 pins under the oracle gate.
  */
object Classify {

  /** Fixed-point scale for centroid means (the q68 convention). */
  val Scale = 1000000L

  /** Feature width. Small by design — the oracle unrolls one SQL
    * term per bucket; production would widen this, not change shape. */
  val NumBuckets = 8

  /** The feature bucket of one token: portable 64-bit hash mod
    * [[NumBuckets]] (non-negative — mirrors the oracle's
    * `md5`-derived bigint `% 8`). */
  def tokenBucket(w: Column): Column =
    pmod(portableHash64(w), lit(NumBuckets.toLong))

  /** (idCol, f0..f{B-1}) hashed-bucket count features from a
    * term-frequency table `(idCol, w, tf)` — rides the persisted tf
    * index: one fixed-width aggregate, never a per-vocabulary pivot. */
  def bucketFeatures(tf: DataFrame, idCol: String): DataFrame = {
    val aggs = (0 until NumBuckets).map { b =>
      sum(when(tokenBucket(col("w")) === b, col("tf")).otherwise(0L)).as(s"f$b")
    }
    tf.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Scaled-integer class centroids over labeled feature rows:
    * `centroid_b = floor(sum(f_b) · Scale / n)` per class — one
    * fixed-width aggregate and a ≤ class-count row collect (bounded
    * metadata, the kmeansCentroids discipline). */
  def centroidFit(train: DataFrame, labelCol: String): Map[Int, Array[Long]] = {
    val aggs = (0 until NumBuckets).map(b => sum(col(s"f$b")).as(s"s$b")) :+
      count(lit(1)).as("n")
    train.groupBy(col(labelCol).cast("int").as("__cls"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val n = r.getLong(NumBuckets + 1)
        r.getInt(0) -> Array.tabulate(NumBuckets)(b => r.getLong(b + 1) * Scale / n)
      }.toMap
  }

  /** Exact squared distance of the (scaled) feature row to a centroid
    * literal. Magnitude bound: f_b ≤ tokens/doc (~10^3) → each term ≤
    * ~10^18·(tokens/10^3)² — inside int64 for any sane document. */
  private def dist(cent: Array[Long]): Column =
    (0 until NumBuckets).map { b =>
      val d = col(s"f$b") * Scale - lit(cent(b))
      d * d
    }.reduce(_ + _)

  /** Nearest-centroid prediction as a pure map expression over the
    * feature columns; ties resolve to class 1 (keep). Requires both
    * classes present in training (a one-class "classifier" is a
    * constant — fail loudly instead). */
  def centroidPredict(feats: DataFrame, cents: Map[Int, Array[Long]]): DataFrame = {
    require(cents.contains(0) && cents.contains(1),
      s"centroidPredict: need both classes trained, got ${cents.keys.toSeq.sorted}")
    feats.withColumn("label_model",
      when(dist(cents(1)) <= dist(cents(0)), 1).otherwise(0))
  }
}
