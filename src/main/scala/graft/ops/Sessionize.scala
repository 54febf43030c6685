package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Functions.epochUs

/** Gap-based sessionization: contiguous per-key activity separated by
  * quiet gaps longer than `gapSeconds` becomes a session. The batch
  * formulation is the standard two-window composition — a lag marks
  * session starts, a running sum over the marks numbers them — i.e.
  * ONE shuffle on the key feeding two stacked window execs with the
  * same partitioning (no second exchange). The streaming counterpart
  * is `session_window` in [[graft.streaming.Streaming]]'s domain; this
  * is the replayable batch path.
  */
object Sessionize {

  /** Add `session_seq` (1-based per key) and `is_session_start` to an
    * event frame. Deterministic total order via `tieBreak` for equal
    * timestamps. */
  def withSessions(events: DataFrame, keyCol: String, tsCol: String,
                   tieBreak: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), tieBreak)
    val gap = epochUs(col(tsCol)) - epochUs(lag(col(tsCol), 1).over(w))
    val isStart = when(
      gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("is_session_start", isStart)
      .withColumn("session_seq",
        sum(col("is_session_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Roll sessions up to one row each: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieBreak: Column, gapSeconds: Long,
                   valueCol: String): DataFrame =
    withSessions(events, keyCol, tsCol, tieBreak, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
}
