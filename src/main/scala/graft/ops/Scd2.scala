package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** SCD Type-2 merge as a pure snapshot recompute (SURVEY.md §7.4;
  * reference `cards.py:86-176` / `terminals.py:83-194`).
  *
  * The reference mutates the dimension in place (UPDATE to close
  * versions, INSERT to open them). Parquet is immutable, so the merge
  * is re-expressed functionally: the new snapshot is the union of
  *
  *   history ∪ untouchedCurrent ∪ closed ∪ opened
  *
  * with identical observable semantics, including the
  * `- INTERVAL '1 second'` closure timestamps (`cards.py:126`), the
  * `deleted_flg='Y'` marker rows carrying the last known attribute
  * values (`cards.py:145-162`), and resurrect-on-reappear (a key whose
  * current version is 'Y' that shows up in the batch opens a fresh 'N'
  * version).
  *
  * Scale notes: one equi-shuffle on the key feeds every join here; all
  * five legs (new/changed/closed/deleted/untouched) derive from the
  * same `current` frame, so Catalyst reuses the exchange. The batch
  * side is typically small → AQE broadcasts it. No driver-side
  * collection, no per-row updates — this is a set-based MERGE that
  * scales with the dimension's partition count.
  *
  * Dimension frame contract: `key` columns + `tracked` columns +
  * `effective_from`, `effective_to` (timestamp, 9999-12-31 = open) +
  * `deleted_flg` ('N'/'Y'). Batch frame: `key` + `tracked` columns.
  */
object Scd2 {

  /** Merge one batch into a dimension snapshot.
    *
    * @param dim        current dimension snapshot (all versions)
    * @param batch      incoming rows (key + tracked attribute columns)
    * @param keys       natural-key column names
    * @param tracked    change-tracked attribute column names
    * @param batchTs    effective_from for newly opened versions (the
    *                   reference uses the source `update_dt` or the
    *                   file date — parameterized, pinned for parity)
    * @param deleteKeys full key snapshot of the source; keys of `dim`'s
    *                   live current versions absent here are marked
    *                   deleted (reference `*_del` staging tables,
    *                   `cards.py:74-82,145-176`). None = skip delete
    *                   detection.
    * @param deleteTs   effective_from for 'Y' marker rows (terminals
    *                   uses the file date, cards/clients/accounts use
    *                   now() — `terminals.py:172` vs `cards.py:154`;
    *                   parameterized, pinned for parity)
    */
  def merge(dim: DataFrame, batch: DataFrame, keys: Seq[String],
            tracked: Seq[String], batchTs: Column,
            deleteKeys: Option[DataFrame] = None,
            deleteTs: Option[Column] = None): DataFrame = {
    val delTs = deleteTs.getOrElse(batchTs)
    val dimCols = dim.columns.toSeq
    def proj(df: DataFrame): DataFrame = df.select(dimCols.map(col): _*)

    val current = dim.filter(col("effective_to") === InfinityTs)
    val history = dim.filter(col("effective_to") =!= InfinityTs)

    // J1: keys never seen in ANY version of the dimension → first version.
    val newRows = proj(
      batch.join(dim.select(keys.map(col): _*), keys, "left_anti")
        .withColumn("effective_from", batchTs)
        .withColumn("effective_to", InfinityTs)
        .withColumn("deleted_flg", lit("N")))

    // J2 + P4: batch rows whose current version differs on any tracked
    // attribute (null-safe), or whose current version is a 'Y' marker
    // (reappearing key) → new open version.
    val curForCompare = current.select(
      keys.map(col) ++
        tracked.map(c => col(c).as(s"__cur_$c")) :+
        col("deleted_flg").as("__cur_deleted_flg"): _*)
    val changedPred = tracked
      .map(c => !(col(c) <=> col(s"__cur_$c")))
      .foldLeft(col("__cur_deleted_flg") === "Y")(_ || _)
    val changedBatch = batch.join(curForCompare, keys, "inner")
      .filter(changedPred)
    val changedKeys = changedBatch.select(keys.map(col): _*)
    val changedRows = proj(
      changedBatch.select(batch.columns.map(col).toSeq: _*)
        .withColumn("effective_from", batchTs)
        .withColumn("effective_to", InfinityTs)
        .withColumn("deleted_flg", lit("N")))

    // J4: live current keys missing from the source's full key snapshot
    // → 'Y' marker rows carrying the last known attribute values.
    val deletedCurrent = deleteKeys match {
      case Some(dk) =>
        current.filter(col("deleted_flg") === "N")
          .join(dk.select(keys.map(col): _*), keys, "left_anti")
      case None => current.limit(0)
    }
    val deletedRows = proj(
      deletedCurrent
        .withColumn("effective_from", delTs)
        .withColumn("effective_to", InfinityTs)
        .withColumn("deleted_flg", lit("Y")))

    // J5 + F10: close the superseded current versions one second before
    // their replacement opens.
    val closedForChange = proj(
      current.join(changedKeys, keys, "left_semi")
        .withColumn("effective_to", minusOneSecond(batchTs)))
    val closedForDelete = proj(
      deletedCurrent
        .withColumn("effective_to", minusOneSecond(delTs)))

    // Current versions not superseded by anything this batch.
    val untouched = current
      .join(changedKeys, keys, "left_anti")
      .join(deletedCurrent.select(keys.map(col): _*), keys, "left_anti")

    proj(history)
      .unionByName(proj(untouched))
      .unionByName(closedForChange)
      .unionByName(closedForDelete)
      .unionByName(newRows)
      .unionByName(changedRows)
      .unionByName(deletedRows)
  }
}
