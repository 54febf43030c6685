package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions.portableHash64

/** Deterministic sampling for training-data pipelines.
  *
  * Corpus curation constantly re-balances strata (downsample the
  * dominant language/source, keep the rare ones) — and at 100 TB the
  * sample must be DETERMINISTIC: `rand()`-based sampling changes under
  * task retry and replay, which silently breaks dataset lineage and
  * dedup-against-previous-runs. Membership here is a pure function of
  * the row's id: keep a row iff its portable 64-bit hash, reduced mod
  * [[Sampling.Denom]], falls under the stratum's rate threshold.
  *
  * Scale shape: a map-side filter — no shuffle, no count pass, no
  * per-stratum state. The rate table is a literal CASE chain (bounded
  * by construction: strata are languages/sources, not keys). The same
  * hash runs on any engine, so samples reproduce bit-for-bit off-Spark
  * (the q53 DuckDB oracle computes the identical membership).
  */
object Sampling {

  /** Rate denominator: rates are applied as integer thresholds out of
    * 10^6 (exact — no float comparison at the keep/drop boundary). */
  val Denom = 1000000L

  private def threshold(strataCol: String, rates: Map[String, Double],
                        defaultRate: Double): Column =
    rates.toSeq.sortBy(_._1).foldLeft(lit((defaultRate * Denom).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * Denom).toLong)).otherwise(acc)
    }

  /** The sampling hash: uniform in [0, Denom), deterministic in the id. */
  def sampleKey(idCol: Column): Column =
    pmod(portableHash64(idCol.cast("string")), lit(Denom))

  /** Keep each row with its stratum's probability, deterministically.
    * `rates` maps stratum value → keep rate in [0, 1]; unlisted strata
    * use `defaultRate`. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    df.filter(sampleKey(col(idCol)) < threshold(strataCol, rates, defaultRate))
  }

  /** Temperature-style resampling: each row is emitted
    * `⌊factor⌋ + (0 or 1)` times, where the fractional extra copy is
    * decided by the same deterministic hash as [[stratifiedSample]] —
    * factor 2.5 yields 2 or 3 copies, factor 0.4 yields 0 or 1 (so
    * this generalizes downsampling), and expected multiplicity equals
    * the factor exactly. Copies carry a `copy_idx` (1-based) so
    * downstream shuffles/splits treat them as distinct rows.
    *
    * The integer copy floors and fractional thresholds are computed
    * DRIVER-SIDE and embedded as literals, so an oracle on another
    * engine reproduces membership with integer comparisons only — no
    * cross-engine float arithmetic at the keep/drop boundary. Still a
    * pure map pass (explode of a bounded sequence, no shuffle). */
  def resample(df: DataFrame, strataCol: String, idCol: String,
               factors: Map[String, Double],
               defaultFactor: Double): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(f => f >= 0 && f <= 100),
      "factors must be within [0, 100]")
    def parts(f: Double): (Long, Long) =
      (math.floor(f).toLong, ((f - math.floor(f)) * Denom).round)
    val (defBase, defFrac) = parts(defaultFactor)
    val (baseCol, fracCol) = factors.toSeq.sortBy(_._1)
      .foldLeft((lit(defBase), lit(defFrac))) {
        case ((b, fr), (stratum, f)) =>
          val (fb, ff) = parts(f)
          (when(col(strataCol) === stratum, lit(fb)).otherwise(b),
            when(col(strataCol) === stratum, lit(ff)).otherwise(fr))
      }
    val copies = baseCol + when(sampleKey(col(idCol)) < fracCol, 1L).otherwise(0L)
    // sequence(1, 0) would generate a DESCENDING range — guard empties.
    df.withColumn("copy_idx",
      explode(when(copies >= 1, sequence(lit(1L), copies))
        .otherwise(array().cast("array<bigint>"))))
  }
}
