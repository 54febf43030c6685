package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: lay documents head-to-tail
  * into fixed-capacity token sequences (the standard "concat and
  * chunk" batching scheme) and report, per document, which sequence
  * it starts in and at what offset. Deterministic by construction:
  * documents are laid out in `idCol` order within each `groupCol`
  * partition, so the packing reproduces under retry/replay and on any
  * engine (the DuckDB oracle computes the identical prefix sums).
  *
  * A document longer than the remaining room in its sequence spills
  * into the next one(s) — contiguous-fill packing, zero padding waste,
  * exactly what attention-mask-aware trainers consume. (First-fit-
  * decreasing style bin packing is inherently sequential state; the
  * contiguous layout is the distributable formulation and the one
  * production packers use.)
  *
  * Scale shape: one window (prefix sum) per group partition — a
  * single shuffle by `groupCol`. The harness groups by language;
  * at 100 TB the group key is a composite shard (e.g. lang × date ×
  * shard-id from [[Sampling.sampleKey]]) so each partition's prefix
  * sum stays bounded — semantics are per-group identical, and
  * sequences never need to cross shard boundaries in a real packer.
  */
object Packing {

  /** Per-document packing positions: `n_tok` (token count), `seq_id`
    * (0-based index of the capacity-`capacity` sequence the document
    * STARTS in, within its group) and `seq_off` (token offset inside
    * that sequence). */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    tokCol: Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"packSequences: capacity must be positive, got $capacity")
    // Explicit ROWS frame: the default RANGE frame includes all peers
    // tied on idCol in the running sum, which would give tied docs
    // identical inflated __start values (overlapping placements). The
    // oracle pins ROWS; match it regardless of idCol uniqueness.
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokCol.cast("bigint"))
      .withColumn("__start", sum(col("n_tok")).over(w) - col("n_tok"))
      // `div`, not floor(`/`): the slash is double division, and past
      // ~2^43·capacity the float quotient can land an ulp under an
      // integer and floor one lower — disagreeing with the oracle's
      // exact `//` AND with seq_off's exact integer pmod.
      .withColumn("seq_id", expr(s"__start div CAST($capacity AS BIGINT)"))
      .withColumn("seq_off", pmod(col("__start"), lit(capacity.toLong)))
      .drop("__start")
  }
}
