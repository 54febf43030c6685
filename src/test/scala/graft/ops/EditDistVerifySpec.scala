package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the q74 verify-stage rewrite: the length prefilter + 3-arg
  * thresholded levenshtein must select EXACTLY the pairs (with exactly
  * the values) the full-DP 5·lev <= max_len policy selects — the
  * prefilter is lossless because lev >= |len(a) − len(b)|, and the
  * threshold floor(max_len/5) is exact because lev is an integer. */
class EditDistVerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefilter + thresholded levenshtein ≡ full DP + policy filter") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcde"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    // Mix of near-identical pairs (survivors), mid-distance pairs
    // (killed by the DP, not the prefilter), and length-skewed pairs
    // (killed by the prefilter alone).
    val pairs = (0 until 400).map { i =>
      val a = word(3 + rnd.nextInt(40))
      val b = i % 3 match {
        case 0 => // small edit of a
          val chars = a.toCharArray
          if (chars.nonEmpty)
            chars(rnd.nextInt(chars.length)) = alpha(rnd.nextInt(alpha.length))
          new String(chars) + (if (i % 6 == 0) "x" else "")
        case 1 => word(a.length + rnd.nextInt(3)) // same scale, random
        case _ => word(1 + rnd.nextInt(80))       // arbitrary length gap
      }
      (i.toLong, a, b)
    }
    val df = pairs.toDF("id", "t1", "t2")
      .withColumn("max_len",
        greatest(length(col("t1")), length(col("t2"))).cast("bigint"))

    val full = df
      .withColumn("lev", levenshtein(col("t1"), col("t2")).cast("bigint"))
      .filter(col("lev") * 5 <= col("max_len"))
      .select("id", "lev").as[(Long, Long)].collect().toMap

    val fast = df
      .filter(abs(length(col("t1")) - length(col("t2")))
        .cast("bigint") * 5 <= col("max_len"))
      .withColumn("lev",
        call_function("levenshtein", col("t1"), col("t2"),
          expr("cast(max_len div 5 as int)")).cast("bigint"))
      .filter(col("lev") >= 0)
      .select("id", "lev").as[(Long, Long)].collect().toMap

    assert(fast === full)
    assert(full.nonEmpty, "fixture must produce survivors")
    // The prefilter must actually cut something in this fixture (the
    // length-skewed third), or the test isn't exercising it.
    val preCut = df.filter(abs(length(col("t1")) - length(col("t2")))
      .cast("bigint") * 5 > col("max_len")).count()
    assert(preCut > 0, "fixture must produce prefilter-killed pairs")
  }
}
