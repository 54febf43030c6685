package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Assembly/render/mask pins for [[Chat]]: template shape, role
  * parity, session splitting, and the structural span property (the
  * per-turn spans tile the rendered string exactly). */
class ChatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Two sessions for user 1 (gap > 1 day), one for user 2.
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 10L, "ask"),
    (1L, ts("2024-01-01 10:05:00"), 11L, "answer"),
    (1L, ts("2024-01-01 10:06:00"), 12L, "followup"),
    (1L, ts("2024-01-03 09:00:00"), 13L, "ask"),
    (2L, ts("2024-01-01 08:00:00"), 20L, "hello")
  ).toDF("user_id", "ts", "event_id", "event_type")

  private lazy val conv = Chat.conversations(events, "user_id", "ts",
    tieBreak = col("event_id"),
    content = concat(col("event_type"), lit("#"), col("event_id")))

  test("render: roles alternate from user, turns in time order, sessions split") {
    val r = Chat.renderChat(conv, "user_id")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(r((1L, 1L)).getAs[String]("chat_text") ===
      "<|user|>ask#10<|assistant|>answer#11<|user|>followup#12")
    assert(r((1L, 2L)).getAs[String]("chat_text") === "<|user|>ask#13")
    assert(r((2L, 1L)).getAs[Long]("n_turns") === 1L)
  }

  test("loss spans tile the rendered string exactly; assistant turns train") {
    val rendered = Chat.renderChat(conv, "user_id")
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        x.getAs[String]("chat_text")).toMap
    val spans = Chat.lossSpans(conv, "user_id").collect()
    assert(spans.length === 5)
    spans.groupBy(x => (x.getLong(0), x.getLong(1))).foreach {
      case (key, turns) =>
        val text = rendered(key)
        val sorted = turns.sortBy(_.getAs[Long]("pos"))
        // spans are contiguous from 0 and cover the whole text
        var off = 0L
        sorted.foreach { t =>
          assert(t.getAs[Long]("char_start") === off, s"$key pos ${t.getAs[Long]("pos")}")
          val len = t.getAs[Long]("char_len")
          val slice = text.substring(off.toInt, (off + len).toInt)
          assert(slice.startsWith("<|" + t.getAs[String]("role") + "|>"))
          assert(t.getAs[Int]("mask") ===
            (if (t.getAs[String]("role") == "assistant") 1 else 0))
          off += len
        }
        assert(off === text.length.toLong, s"$key spans do not tile")
    }
  }
}
