package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Structural properties of the relational bloom filter: zero false
  * negatives (the property the q188 routing leans on), a live but
  * bounded false-positive tail, and width sizing. */
class PortableBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val seen = Seq.fill(400)(rnd.nextLong().abs % (1L << 60)).distinct
  private val fresh = Seq.fill(400)(rnd.nextLong().abs % (1L << 60))
    .distinct.filterNot(seen.toSet)

  test("nextPow2 is the smallest power of two >= x") {
    assert(PortableBloom.nextPow2(1) === 1L)
    assert(PortableBloom.nextPow2(2) === 2L)
    assert(PortableBloom.nextPow2(3) === 4L)
    assert(PortableBloom.nextPow2(2048) === 2048L)
    assert(PortableBloom.nextPow2(2049) === 4096L)
  }

  test("no false negatives: every inserted key probes maybe=1") {
    val m = PortableBloom.nextPow2(4L * seen.size)
    val keys = seen.toDF("fp")
    val words = PortableBloom.bitTable(keys, "fp", 3, m)
    val probed = PortableBloom.withMaybe(keys, "fp", 3, m, words)
    assert(probed.filter(col("bloom_maybe") === 0).count() === 0L)
  }

  test("false positives exist at 4 bits/key but stay a bounded tail") {
    val m = PortableBloom.nextPow2(4L * seen.size)
    val words = PortableBloom.bitTable(seen.toDF("fp"), "fp", 3, m)
    val fp = PortableBloom.withMaybe(fresh.toDF("fp"), "fp", 3, m, words)
      .filter(col("bloom_maybe") === 1).count()
    // (1 - e^(-3/4))^3 ≈ 0.15; allow a wide band, but the filter must
    // neither pass everything nor (at this load) reject everything.
    assert(fp > 0 && fp < fresh.size / 2, s"fp count $fp of ${fresh.size}")
  }

  test("a wider filter prunes harder (the production dial)") {
    val m16 = PortableBloom.nextPow2(16L * seen.size)
    val words = PortableBloom.bitTable(seen.toDF("fp"), "fp", 3, m16)
    val fp = PortableBloom.withMaybe(fresh.toDF("fp"), "fp", 3, m16, words)
      .filter(col("bloom_maybe") === 1).count()
    assert(fp < fresh.size / 10, s"fp count $fp of ${fresh.size}")
  }
}
