package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT/chat training-data assembly: turn event streams into rendered
  * conversation strings (the chat-template text a fine-tuning job
  * reads) and per-turn loss-mask spans (train on assistant turns,
  * mask user turns — the span arithmetic every SFT dataloader needs
  * precomputed).
  *
  * Scale shape: conversations build on [[Sessionize]]'s one key
  * shuffle; the per-conversation assembly is ONE hash aggregate
  * (`sort_array(collect_list(struct))` — the q174 reassembly
  * discipline) whose state is bounded by conversation length, never
  * corpus length, and the groupBy's (key, session) clustering is
  * satisfied by the window's existing hash partitioning on the key —
  * no second exchange. Rendering and span offsets are then pure array
  * expressions per conversation (role parity and prefix sums from the
  * sorted array's own indexes — no third window, no re-shuffle).
  *
  * Role assignment here is deterministic turn parity (first turn
  * user, alternating) — a HARNESS fixture: real chat logs carry
  * roles; the operator's value is the assembly/template/mask
  * machinery, which is role-source-agnostic. */
object Chat {

  /** Session gap: same dial as q23's sessionization. */
  val GapSeconds = 86400L

  /** Per-conversation frame: (key, session_seq, turns) where `turns`
    * is the rendered turn array in (ts, tieBreak) order. Turn i
    * renders as `<|role|>content` with role from parity. */
  def conversations(events: DataFrame, keyCol: String, tsCol: String,
                    tieBreak: Column, content: Column): DataFrame = {
    val sess = Sessionize.withSessions(
      events.withColumn("__content", content), keyCol, tsCol, tieBreak,
      GapSeconds)
    sess.groupBy(col(keyCol), col("session_seq"))
      .agg(sort_array(collect_list(struct(
        col(tsCol), tieBreak, col("__content")))).as("__sorted"))
      .withColumn("turns",
        transform(col("__sorted"), (x, i) => concat(
          lit("<|"),
          when(i % 2 === 0, "user").otherwise("assistant"),
          lit("|>"), x.getField("__content"))))
      .drop("__sorted")
  }

  /** q190's shape: one row per conversation with the rendered text. */
  def renderChat(conv: DataFrame, keyCol: String): DataFrame =
    conv.select(col(keyCol), col("session_seq").cast("long"),
      size(col("turns")).cast("long").as("n_turns"),
      array_join(col("turns"), "").as("chat_text"))

  /** q191's shape: one row per TURN with its character span in the
    * rendered text and the loss mask (assistant turns train). Offsets
    * are in-array prefix sums — O(T²) in the conversation's OWN turn
    * count (bounded: a conversation is a session, not a corpus), zero
    * extra shuffles. 1-based `pos` matches the oracle's row_number. */
  def lossSpans(conv: DataFrame, keyCol: String): DataFrame = {
    val withLens = conv.withColumn("__lens",
      transform(col("turns"), t => length(t).cast("long")))
    withLens.select(col(keyCol), col("session_seq").cast("long"),
        col("__lens"), posexplode(col("turns")).as(Seq("i0", "turn")))
      .select(col(keyCol), col("session_seq"),
        (col("i0") + 1).cast("long").as("pos"),
        when(col("i0") % 2 === 0, "user").otherwise("assistant").as("role"),
        aggregate(slice(col("__lens"), lit(1), col("i0")), lit(0L),
          (a, x) => a + x).as("char_start"),
        length(col("turn")).cast("long").as("char_len"),
        when(col("i0") % 2 === 1, 1).otherwise(0).cast("int").as("mask"))
  }
}
