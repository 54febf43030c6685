package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.Sources

/** The flagship report (driver t1 smoke target) pinned by tests:
  * deterministic row counts per rule at sf0.001, correct shape, pinned
  * report_dt (never now()). */
class FraudSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val report = Fraud.report(
    Sources.table(spark, "/root/testdata/sf0.001", "events"),
    Sources.table(spark, "/root/testdata/sf0.001", "customer")).cache()

  test("shape: the five report columns with pinned report_dt") {
    assert(report.columns.toSeq ===
      Seq("event_dt", "user_id", "fio", "fraud_type", "report_dt"))
    val dts = report.select("report_dt").distinct().collect()
    assert(dts.length === 1)
    assert(dts.head.getTimestamp(0) === java.sql.Timestamp.valueOf(Fraud.ReportDt))
  }

  test("rules 1-3 fire on the smoke dataset and counts are stable") {
    // Rule 4 (3 decreasing REJECTs then a SUCCESS inside 20 minutes)
    // needs 4 same-user events in a 20-minute span — the sparse smoke
    // set has none, so it is exercised on a constructed frame below.
    val byRule = report.groupBy("fraud_type").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(Set(1, 2, 3).subsetOf(byRule.keySet), s"rules firing: $byRule")
    val again = Fraud.report(
      Sources.table(spark, "/root/testdata/sf0.001", "events"),
      Sources.table(spark, "/root/testdata/sf0.001", "customer"))
      .groupBy("fraud_type").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again === byRule)
  }

  test("rule 4 fires on a 3-REJECT decreasing run closed by a SUCCESS in 20 min") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // k % 3 == 0 → REJECT; values strictly decreasing toward the
    // SUCCESS; all inside 20 minutes; closing event_type in-scope.
    val events = Seq(
      (1L, 7L, ts("2024-01-05 10:00:00"), "click", 40.0, """{"k": 3}"""),
      (2L, 7L, ts("2024-01-05 10:05:00"), "click", 30.0, """{"k": 3}"""),
      (3L, 7L, ts("2024-01-05 10:10:00"), "click", 20.0, """{"k": 3}"""),
      (4L, 7L, ts("2024-01-05 10:15:00"), "click", 10.0, """{"k": 1}"""))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val customer = Seq((7L, "Name#7", "SEG"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val out = Fraud.report(events, customer)
      .filter($"fraud_type" === 4).collect()
    assert(out.length === 1)
    assert(out.head.getTimestamp(0) === ts("2024-01-05 10:15:00"))
  }
}
