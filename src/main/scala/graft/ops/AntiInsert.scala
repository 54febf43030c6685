package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Idempotent append — the reference's "insert only rows whose key is
  * absent from the target" pattern (SURVEY.md J1/P3; reference
  * `transaction.py:80-84`: `LEFT JOIN tgt … WHERE tgt.key IS NULL`).
  *
  * Spark-first: a single `left_anti` join on the key columns only —
  * the target side is pruned to its key columns so the scan reads just
  * those (column pruning reaches the parquet footer). At 100 TB the
  * anti join shuffles both sides on the key; AQE converts to broadcast
  * when the incoming batch is small.
  */
object AntiInsert {

  /** Rows of `batch` whose `keys` don't appear in `target`. */
  def newRows(batch: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    batch.join(target.select(keys.map(col): _*), keys, "left_anti")

  /** Idempotent append: union of target and the not-yet-present batch
    * rows (pure-recompute equivalent of the reference's
    * `INSERT … SELECT … WHERE tgt.key IS NULL`). */
  def append(batch: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(
      newRows(batch, target, keys).select(target.columns.map(col).toSeq: _*))
}
