package graft

import java.sql.Timestamp
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The dump-side timestamp canonicalization is what keeps every
  * timestamp-bearing query schema-matched against the oracle (round 2
  * failed 9 queries on exactly this) — pin it. */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonTimestamps rewrites TimestampType to NTZ, preserves values and other columns") {
    val df = Seq((1L, Timestamp.valueOf("2024-01-15 10:30:00"), "x"))
      .toDF("id", "ts", "v")
    assert(df.schema("ts").dataType === TimestampType)
    val out = Verify.canonTimestamps(df)
    assert(out.schema("ts").dataType === TimestampNTZType)
    assert(out.schema("id").dataType === df.schema("id").dataType)
    assert(out.columns.toSeq === df.columns.toSeq)
    // UTC session ⇒ the wall-clock value is unchanged.
    assert(out.collect().head.getAs[java.time.LocalDateTime]("ts").toString
      === "2024-01-15T10:30")
  }

  test("canonTimestamps holds the 9999-12-31 SCD2 sentinel") {
    val df = Seq(Tuple1(Timestamp.valueOf("9999-12-31 00:00:00"))).toDF("effective_to")
    val got = Verify.canonTimestamps(df).collect().head
      .getAs[java.time.LocalDateTime](0)
    assert(got.getYear === 9999)
  }

  test("canonTimestamps is a no-op for frames without TimestampType") {
    val df = Seq((1L, "a")).toDF("id", "v")
    assert(Verify.canonTimestamps(df) eq df)
  }

  test("the driver contract holds: entry returns rows; registries align") {
    // t1 smoke, locally pinned (driver checks rows > 0 at sf0.001).
    if (new java.io.File("/root/testdata/sf0.001").isDirectory)
      assert(SparkEntry.entry(spark).limit(1).count() === 1L)
    // Every oracle key names a declared query; names are unique.
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    assert(names.size === SparkEntry.queries.size)
  }
}
