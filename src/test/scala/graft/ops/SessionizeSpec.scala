package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val events = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00"), 10L),
    (2L, "u1", ts("2024-01-01 10:20:00"), 20L), // same session (gap 20m)
    (3L, "u1", ts("2024-01-01 12:00:00"), 30L), // new session (gap 100m)
    (4L, "u2", ts("2024-01-01 10:05:00"), 40L))
    .toDF("event_id", "user", "ts", "v")

  test("withSessions: numbering restarts per key, increments on gap > threshold") {
    val out = Sessionize.withSessions(events, "user", "ts", col("event_id"), 3600L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionStats: bounds and aggregates per session") {
    val out = Sessionize.sessionStats(events, "user", "ts", col("event_id"), 3600L, "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getLong(5))).toSet
    assert(out === Set(
      ("u1", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 2L, 30L),
      ("u1", 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1L, 30L),
      ("u2", 1L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L, 40L)))
  }

  test("invariant: within-session gaps <= threshold, cross-session gaps > threshold") {
    val gap = 3600L
    val rows = Sessionize.withSessions(events, "user", "ts", col("event_id"), gap)
      .select("user", "session_seq", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))
      .groupBy(_._1)
    rows.values.foreach { perUser =>
      val ordered = perUser.sortBy(_._3.getTime)
      ordered.zip(ordered.tail).foreach { case ((_, s1, t1), (_, s2, t2)) =>
        val gapSec = (t2.getTime - t1.getTime) / 1000
        if (s1 == s2) assert(gapSec <= gap) else assert(gapSec > gap)
      }
    }
  }
}
