package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val dim = Seq(
    ("T1", "v1", ts("2024-01-01 00:00:00"), ts("2024-01-15 00:00:00"), "N"),
    ("T1", "v2", ts("2024-01-15 00:00:00"), ts("9999-12-31 00:00:00"), "N"),
    ("T2", "dead", ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"), "Y"))
    .toDF("terminal_id", "v", "effective_from", "effective_to", "deleted_flg")

  private def lookup(factTs: String, strictFrom: Boolean = true,
                     strictTo: Boolean = true, liveOnly: Boolean = true,
                     key: String = "T1"): Seq[String] = {
    val fact = Seq((key, ts(factTs))).toDF("terminal", "trans_date")
    Temporal.asOfJoin(fact, dim, fact("terminal"), dim("terminal_id"),
        fact("trans_date"), strictFrom = strictFrom, strictTo = strictTo,
        liveOnly = liveOnly)
      .select("v").collect().toSeq.map(r => Option(r.getString(0)).orNull)
  }

  test("strict bounds: boundary instants match NO version (reference parity)") {
    // At exactly the v1→v2 boundary, strict > and < exclude both
    // versions — the modeled system's observable (odd) semantics.
    assert(lookup("2024-01-15 00:00:00") === Seq(null))
    assert(lookup("2024-01-14 23:59:59") === Seq("v1"))
    assert(lookup("2024-01-15 00:00:01") === Seq("v2"))
  }

  test("inclusive bounds: boundary resolves to both adjacent versions") {
    assert(lookup("2024-01-15 00:00:00", strictFrom = false, strictTo = false)
      .toSet === Set("v1", "v2"))
  }

  test("liveOnly excludes 'Y' versions; left join preserves the fact row") {
    assert(lookup("2024-01-10 00:00:00", key = "T2") === Seq(null))
    assert(lookup("2024-01-10 00:00:00", key = "T2", liveOnly = false) === Seq("dead"))
  }
}
