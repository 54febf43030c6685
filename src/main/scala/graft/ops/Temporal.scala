package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal / as-of joins (SURVEY.md J6; reference `report.py:38-41`):
  * look up the dimension version valid at fact time.
  *
  * The reference's condition is an equi key plus a *strict* range:
  * `trans_date > effective_from AND trans_date < effective_to AND
  * deleted_flg = 'N'`. Spark-first mapping: keep the equi key so the
  * join hashes; the range terms become join residuals evaluated inside
  * the hash join — never a cartesian. No broadcast hint by default: a
  * hint overrides AQE's size check, and an SCD2 dimension grows with
  * the data — at 100 TB a forced broadcast OOMs. AQE converts to
  * broadcast at runtime when the dim really is small; callers may force
  * it only for provably bounded frames.
  */
object Temporal {

  /** As-of join a fact to an SCD2 dimension. Strictness of the range
    * bounds is parameterized; reference parity = both strict
    * (`report.py:40-41`). */
  def asOfJoin(fact: DataFrame, dim: DataFrame,
               factKey: Column, dimKey: Column, factTs: Column,
               from: Column = null, to: Column = null,
               liveOnly: Boolean = true,
               strictFrom: Boolean = true, strictTo: Boolean = true,
               joinType: String = "left",
               broadcastDim: Boolean = false): DataFrame = {
    val f = Option(from).getOrElse(dim("effective_from"))
    val t = Option(to).getOrElse(dim("effective_to"))
    val lower = if (strictFrom) factTs > f else factTs >= f
    val upper = if (strictTo) factTs < t else factTs <= t
    val live = if (liveOnly) dim("deleted_flg") === "N" else lit(true)
    val cond = factKey === dimKey && lower && upper && live
    val dimSide = if (broadcastDim) broadcast(dim) else dim
    fact.join(dimSide, cond, joinType)
  }
}
