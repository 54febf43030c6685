package graft.functions

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Functions._

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseEuroDecimal truth table (reference transaction.py:77)") {
    val in = Seq("1.234,56", "0,99", "1.000.000,00", "42", null)
    val out = in.toDF("s")
      .select(parseEuroDecimal(col("s")).cast("string"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("1234.56"), Some("0.99"),
      Some("1000000.00"), Some("42.00"), None))
  }

  test("toEuroString inverts parseEuroDecimal for plain decimals") {
    val out = Seq("12,34").toDF("s")
      .select(toEuroString(parseEuroDecimal(col("s"))))
      .collect().head.getString(0)
    assert(out === "12,34")
  }

  test("fio skips NULLs like Postgres concat (report.py:23)") {
    val out = Seq(("Ivanov", null: String, "Ivanovich"))
      .toDF("l", "f", "p")
      .select(fio(col("l"), col("f"), col("p")))
      .collect().head.getString(0)
    assert(out === "Ivanov Ivanovich")
  }

  test("roundToLong is bit-exact with round() incl. ties and negatives") {
    // Adversarial cases: exact .5 ties both signs, representation-error
    // neighbors of ties, large magnitudes near the 2^51 bound, and a
    // money-cents random sweep. round() is the BigDecimal HALF_UP
    // reference being replaced in the hot paths.
    val adversarial = Seq(
      0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 2.675, -2.675,
      2.4999999999999996, 2.5000000000000004, -2.4999999999999996,
      0.49999999999999994, 1e15 + 0.5, -(1e15 + 0.5),
      2251799813685247.5, // 2^51 - 0.5: largest guaranteed-exact tie
      123456.78901, -98765.43210, 1.0e-12, -1.0e-12)
    val rng = new scala.util.Random(42)
    val money = Seq.fill(2000)((rng.nextDouble() - 0.5) * 2e7)
    val rows = (adversarial ++ money).toDF("x")
      .select(col("x"), roundToLong(col("x")).as("fast"),
        round(col("x")).cast("bigint").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"mismatch at x=${r.getDouble(0)}")
    }
  }

  test("roundFrac propagates NaN and infinities like round()") {
    val in = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1.2345678, -1.2345678)
    val rows = in.toDF("x")
      .select(col("x"), roundFrac(col("x"), 6).as("fast"),
        round(col("x"), 6).as("ref"))
      .collect()
    rows.foreach { r =>
      val (fast, ref) = (r.getDouble(1), r.getDouble(2))
      assert(fast == ref || (fast.isNaN && ref.isNaN),
        s"mismatch at x=${r.getDouble(0)}: fast=$fast ref=$ref")
    }
    // NULL stays NULL through the guard.
    val n = Seq[Option[Double]](None).toDF("x")
      .select(roundFrac(col("x"), 6)).collect().head
    assert(n.isNullAt(0))
  }

  test("changed: null-safe inequality truth table (terminals.py:128-131)") {
    val cases = Seq(
      ("a", "a", false), ("a", "b", true),
      (null, "a", true), ("a", null, true), (null, null, false))
    val out = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(changed(col("x"), col("y"))).collect().map(_.getBoolean(0))
    assert(out.toSeq === cases.map(_._3))
  }

  test("anyChanged ORs across tracked pairs (clients.py:156-163)") {
    val df = Seq(("a", "a", "b", "b"), ("a", "z", "b", "b"), ("a", "a", "b", "z"))
      .toDF("a1", "a2", "b1", "b2")
    val out = df.select(anyChanged(Seq(col("a1") -> col("a2"), col("b1") -> col("b2"))))
      .collect().map(_.getBoolean(0))
    assert(out.toSeq === Seq(false, true, true))
  }

  test("withinSeconds is inclusive epoch arithmetic (report.py:99,112)") {
    val a = Timestamp.valueOf("2024-01-01 01:00:00")
    val in = Seq(
      (a, Timestamp.valueOf("2024-01-01 00:00:00")), // exactly 3600s
      (a, Timestamp.valueOf("2024-01-01 00:00:01")), // 3599s
      (a, Timestamp.valueOf("2023-12-31 23:59:59"))) // 3601s
    val out = in.toDF("a", "b")
      .select(withinSeconds(col("a"), col("b"), 3600))
      .collect().map(_.getBoolean(0))
    assert(out.toSeq === Seq(true, true, false))
  }

  test("minusOneSecond closes versions an instant before the successor (cards.py:126)") {
    val out = Seq(Timestamp.valueOf("2024-02-01 00:00:00")).toDF("t")
      .select(minusOneSecond(col("t"))).collect().head.getTimestamp(0)
    assert(out === Timestamp.valueOf("2024-01-31 23:59:59"))
  }

  test("portableHash64 equals the first 15 md5 hex digits as int64") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72 → first 15 hex digits.
    val expected = java.lang.Long.parseLong("900150983cd24fb", 16)
    val out = Seq("abc").toDF("s")
      .select(portableHash64(col("s"))).collect().head.getLong(0)
    assert(out === expected)
  }

  test("minhashFn family: deterministic, within [0, p)") {
    val p = 2147483647L
    val base = Seq(1234567890123L, 0L, p - 1).toDF("h")
    (0 until 12).foreach { i =>
      val vals = base.select(minhashFn(col("h"), i)).collect().map(_.getLong(0))
      assert(vals.forall(v => v >= 0 && v < p), s"fn $i out of range")
    }
    // Distinct functions must disagree somewhere.
    val v0 = base.select(minhashFn(col("h"), 0)).collect().map(_.getLong(0)).toSeq
    val v1 = base.select(minhashFn(col("h"), 1)).collect().map(_.getLong(0)).toSeq
    assert(v0 !== v1)
  }

  test("cosineSim: orthogonal = 0, identical = 1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(round(cosineSim(col("a"), col("b")), 9))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(0.0, 1.0))
  }

  test("zorderKey interleaves bits MSB-first; SQL twin agrees term-for-term") {
    // x=1010b, y=0101b at 4 bits → z bits x3 y3 x2 y2 x1 y1 x0 y0 =
    // 10011001b = 153. Hand-derived, pins both the bit order and the
    // column order (first column takes the higher bit of each pair).
    val z = Seq((10L, 5L)).toDF("x", "y")
      .select(zorderKey(4, col("x"), col("y"))).collect().head.getLong(0)
    assert(z === 153L)
    // Adjacent keys in z-space are neighbors in BOTH dims: the four
    // cells of a 2×2 block share the same z prefix.
    val block = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
      .toDF("x", "y")
      .select(zorderKey(4, col("x"), col("y"))).collect().map(_.getLong(0))
    assert(block.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // The generated SQL computes the identical key (run through Spark
    // SQL here; DuckDB executes the same operators in the oracle).
    val viaSql = Seq((10L, 5L)).toDF("x", "y")
      .selectExpr(zorderKeySql(4, Seq("x", "y"))).collect().head.getLong(0)
    assert(viaSql === 153L)
  }
}
