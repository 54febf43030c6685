package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (1L to 4000L).map { i =>
    (i, if (i % 2 == 0) "en" else if (i % 5 == 0) "zh" else "de")
  }.toDF("doc_id", "lang")

  test("stratified sample is deterministic across evaluations") {
    def run() = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.25, "zh" -> 0.9), defaultRate = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(run() === run())
  }

  test("per-stratum keep rates land near their targets; rate 0/1 are exact") {
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.25, "zh" -> 1.0, "de" -> 0.0), defaultRate = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = sampled.getOrElse("en", 0L).toDouble / 2000
    assert(en > 0.18 && en < 0.32, s"en rate $en far from 0.25")
    assert(sampled.getOrElse("zh", 0L) === 400L) // every i%5==0 odd id kept
    assert(!sampled.contains("de")) // rate 0 keeps nothing
  }

  test("unlisted strata fall back to the default rate") {
    val kept = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.0), defaultRate = 1.0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(kept === Set("zh", "de"))
  }

  test("membership is a pure function of the id (stratum-independent hash)") {
    // The same id sampled under different strata labels keeps or drops
    // identically when the rates agree — the hash ignores the stratum.
    val relabeled = docs.withColumn("lang", lit("xx"))
    val a = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, defaultRate = 0.4).collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(relabeled, "lang", "doc_id",
      Map.empty, defaultRate = 0.4).collect().map(_.getLong(0)).toSet
    assert(a === b)
  }
}
