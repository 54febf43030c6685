package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal / as-of joins (SURVEY.md J6; reference `report.py:38-41`):
  * look up the dimension version valid at fact time.
  *
  * The reference's condition is an equi key plus a *strict* range:
  * `trans_date > effective_from AND trans_date < effective_to AND
  * deleted_flg = 'N'`. Spark-first mapping: keep the equi key so the
  * join hashes; the range terms become join residuals evaluated inside
  * the hash join — never a cartesian. No broadcast hint by default: a
  * hint overrides AQE's size check, and an SCD2 dimension grows with
  * the data — at 100 TB a forced broadcast OOMs. AQE converts to
  * broadcast at runtime when the dim really is small; callers may force
  * it only for provably bounded frames.
  */
object Temporal {

  /** Pure range (point-in-interval) join with NO equi key — the shape
    * Spark's planner can only execute as a broadcast-nested-loop or
    * cartesian product, both of which are O(points × intervals) and
    * die at scale. Bucketing turns it into an equi join: each interval
    * explodes into the fixed-width buckets it covers, each point keys
    * to its single containing bucket, the join hashes on the bucket
    * id, and the true range predicate `start <= point < end`
    * (half-open) evaluates as a join residual inside the hash join. A
    * matching (point, interval) pair surfaces EXACTLY once — the point
    * owns one bucket and the interval covers that bucket once — so no
    * distinct pass is needed.
    *
    * Scale shape: work ∝ |points| + Σ(span/width) over intervals +
    * |matches|; a 100 TB point side shuffles ONCE on the bucket id
    * (or not at all if AQE broadcasts the exploded interval side).
    * `bucketWidth` trades interval replication (≈ span/width rows per
    * interval) against bucket selectivity (points sharing a bucket) —
    * set it near the typical interval span. Inputs must be integer
    * spaces (epoch days/seconds; see the determinism notes on
    * integer-space math). Empty intervals (`end <= start`) match
    * nothing and are dropped before the explode — `sequence` would
    * otherwise generate a DESCENDING range for them. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                point: Column, start: Column, end: Column,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"rangeJoin: bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth.toDouble)
    // floor(x / w) on doubles is the mathematical floor for negative
    // values too (integer `div` truncates toward zero instead).
    def bucketOf(c: Column): Column = floor(c / w).cast("long")
    val iv = intervals
      .filter(end > start)
      .withColumn("__bucket", explode(sequence(bucketOf(start), bucketOf(end - 1))))
    val pt = points.withColumn("__bucket", bucketOf(point))
    pt.join(iv, pt("__bucket") === iv("__bucket") && point >= start && point < end)
      .drop("__bucket")
  }

  /** As-of join a fact to an SCD2 dimension. Strictness of the range
    * bounds is parameterized; reference parity = both strict
    * (`report.py:40-41`). */
  def asOfJoin(fact: DataFrame, dim: DataFrame,
               factKey: Column, dimKey: Column, factTs: Column,
               from: Column = null, to: Column = null,
               liveOnly: Boolean = true,
               strictFrom: Boolean = true, strictTo: Boolean = true,
               joinType: String = "left",
               broadcastDim: Boolean = false): DataFrame = {
    val f = Option(from).getOrElse(dim("effective_from"))
    val t = Option(to).getOrElse(dim("effective_to"))
    val lower = if (strictFrom) factTs > f else factTs >= f
    val upper = if (strictTo) factTs < t else factTs <= t
    val live = if (liveOnly) dim("deleted_flg") === "N" else lit(true)
    val cond = factKey === dimKey && lower && upper && live
    val dimSide = if (broadcastDim) broadcast(dim) else dim
    fact.join(dimSide, cond, joinType)
  }
}
