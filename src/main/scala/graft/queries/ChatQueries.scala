package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Functions.cents
import graft.io.Sources.table
import graft.ops.Chat

/** SFT / post-training data prep over the event stream: conversation
  * assembly + chat-template rendering (q190), per-turn loss-mask
  * spans (q191), and preference-pair construction for DPO/RLHF-style
  * training (q192). The upstream curation families clean a pretraining
  * corpus; these build the post-training datasets — the other half of
  * what an LLM data pipeline ships.
  *
  * Shared session CTEs are q23's lag/cumsum sessionization verbatim
  * (same gap), so "a conversation" means the same thing across the
  * engine's batch, streaming, and chat views of the event stream. */
object ChatQueries {

  /** q23's sessionize CTEs + the rendered turn: `t2` = one row per
    * turn with (user_id, session_seq, pos, turn). Turn text is
    * `<|role|>event_type#event_id`, role from 1-based turn parity. */
  private val turnCtes: String =
    s"""marked AS (
       |  SELECT user_id, ts, event_id, event_type,
       |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
       |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${Chat.GapSeconds}000000
       |              THEN 1 ELSE 0 END AS is_start
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM marked),
       |t1 AS (
       |  SELECT user_id, session_seq, ts, event_id, event_type,
       |         row_number() OVER (PARTITION BY user_id, session_seq
       |                            ORDER BY ts, event_id) AS pos
       |  FROM sess),
       |t2 AS (
       |  SELECT *, concat('<|',
       |    CASE WHEN pos % 2 = 1 THEN 'user' ELSE 'assistant' END,
       |    '|>', event_type, '#', CAST(event_id AS VARCHAR)) AS turn
       |  FROM t1)""".stripMargin

  /** The rendered turn content, Spark side (must mirror t2). */
  private def contentCol =
    concat(col("event_type"), lit("#"), col("event_id").cast("string"))

  val all: Seq[Q] = Seq(

    // Conversation assembly + chat-template render: sessions become
    // conversations, events become turns, and each conversation ships
    // as ONE training example string. Plan: Sessionize's single
    // user_id shuffle → one collect_list hash aggregate (clustering
    // satisfied by the window's partitioning — no second exchange) →
    // pure array render. The collected state is a conversation, never
    // a user's full history across sessions.
    Q("q190_sft_render",
      s"""WITH $turnCtes
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |       CAST(count(*) AS BIGINT) AS n_turns,
         |       string_agg(turn, '' ORDER BY pos) AS chat_text
         |FROM t2 GROUP BY user_id, session_seq""".stripMargin) {
      (s, d) =>
        Chat.renderChat(
          Chat.conversations(table(s, d, "events"), "user_id", "ts",
            tieBreak = col("event_id"), content = contentCol),
          "user_id")
    },

    // Per-turn loss-mask spans: each turn's character range inside
    // q190's rendered string plus the train/mask flag (assistant
    // turns train — the SFT objective). Offsets are prefix sums over
    // the conversation's own turn array (no third window, no second
    // shuffle); 1-based pos matches the oracle's row_number, and
    // char_start + char_len tile the rendered string exactly — a
    // downstream tokenizer can slice without re-rendering.
    Q("q191_loss_mask_spans",
      s"""WITH $turnCtes,
         |t3 AS (SELECT *, CAST(coalesce(sum(length(turn))
         |           OVER (PARTITION BY user_id, session_seq ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS BIGINT) AS char_start
         |       FROM t2)
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |       CAST(pos AS BIGINT) AS pos,
         |       CASE WHEN pos % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
         |       char_start,
         |       CAST(length(turn) AS BIGINT) AS char_len,
         |       CAST(CASE WHEN pos % 2 = 0 THEN 1 ELSE 0 END AS INT) AS mask
         |FROM t3""".stripMargin) {
      (s, d) =>
        Chat.lossSpans(
          Chat.conversations(table(s, d, "events"), "user_id", "ts",
            tieBreak = col("event_id"), content = contentCol),
          "user_id")
    },

    // Preference-pair construction (DPO/RLHF reward data): per user,
    // the highest-value purchase is "chosen" and the lowest "rejected"
    // (ties to the smaller event_id on both sides), with the margin as
    // the preference strength — users with fewer than two candidates
    // or a zero margin yield no pair. ONE hash aggregate via the q177
    // max(struct)/min(struct) argmax discipline: no window sort, no
    // self-join; a user with 10⁹ events contributes one candidate row
    // per partition to the shuffle. Money as integer cents.
    Q("q192_preference_pairs",
      """WITH p AS (SELECT user_id, event_id,
        |            CAST(round(value * 100) AS BIGINT) AS c FROM events
        |          WHERE event_type = 'purchase'),
        |agg AS (SELECT user_id, count(*) AS n, max(c) AS mxc, min(c) AS mnc
        |        FROM p GROUP BY user_id),
        |ch AS (SELECT p.user_id, min(p.event_id) AS chosen_id
        |       FROM p JOIN agg USING (user_id) WHERE p.c = agg.mxc GROUP BY p.user_id),
        |rj AS (SELECT p.user_id, min(p.event_id) AS rejected_id
        |       FROM p JOIN agg USING (user_id) WHERE p.c = agg.mnc GROUP BY p.user_id)
        |SELECT agg.user_id, chosen_id, rejected_id,
        |       mxc - mnc AS margin_cents,
        |       CAST(n AS BIGINT) AS n_candidates
        |FROM agg JOIN ch USING (user_id) JOIN rj USING (user_id)
        |WHERE n >= 2 AND mxc > mnc""".stripMargin) {
      (s, d) =>
        table(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), cents(col("value")).as("c"))
          .groupBy("user_id")
          .agg(
            max(struct(col("c"), (-col("event_id")).as("ni"))).as("mx"),
            min(struct(col("c"), col("event_id"))).as("mn"),
            count(lit(1)).as("n_candidates"))
          .filter(col("n_candidates") >= 2 &&
            col("mx.c") > col("mn.c"))
          .select(col("user_id"),
            (-col("mx.ni")).as("chosen_id"),
            col("mn.event_id").as("rejected_id"),
            (col("mx.c") - col("mn.c")).as("margin_cents"),
            col("n_candidates"))
    }
  )
}
