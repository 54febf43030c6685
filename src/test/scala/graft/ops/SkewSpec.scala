package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fact = Seq(
    (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
    (4L, "cold", 40.0), (5L, "missing", 50.0))
    .toDF("id", "k", "v")
  private val dim = Seq(("hot", "H"), ("cold", "C"), ("unused", "U"))
    .toDF("k", "label")

  test("salted inner join equals the plain join row-for-row") {
    val plain = fact.join(dim, Seq("k"), "inner")
      .select("id", "k", "v", "label").collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", col("id"), salts = 4)
      .select("id", "k", "v", "label").collect().toSet
    assert(salted === plain)
  }

  test("salted left join preserves unmatched fact rows exactly once") {
    val out = Skew.saltedJoin(fact, dim, "k", col("id"), salts = 4, joinType = "left")
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "H"), (2L, "H"), (3L, "H"), (4L, "C"), (5L, null)))
  }

  test("salting is deterministic across evaluations (retry/replay safety)") {
    val a = Skew.saltedJoin(fact, dim, "k", col("id"), salts = 8).collect().toSet
    val b = Skew.saltedJoin(fact, dim, "k", col("id"), salts = 8).collect().toSet
    assert(a === b)
  }
}
