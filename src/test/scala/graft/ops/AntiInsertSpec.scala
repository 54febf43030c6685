package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AntiInsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("newRows keeps only keys absent from the target (transaction.py:80-84)") {
    val target = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val batch = Seq((2, "b2"), (3, "c")).toDF("id", "v")
    val got = AntiInsert.newRows(batch, target, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got === Set((3, "c")))
  }

  test("append is idempotent: replaying the same batch adds nothing") {
    val target = Seq((1, "a")).toDF("id", "v")
    val batch = Seq((1, "dup"), (2, "b")).toDF("id", "v")
    val once = AntiInsert.append(batch, target, Seq("id"))
    val twice = AntiInsert.append(batch, once, Seq("id"))
    val snap = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    assert(snap(once) === Seq((1, "a"), (2, "b")))
    assert(snap(twice) === snap(once))
  }
}
