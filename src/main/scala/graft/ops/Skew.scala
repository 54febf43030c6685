package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * A shuffle join hashes rows to partitions BY KEY, so one hot key
  * (the null-ish customer, the default terminal, the empty passport)
  * lands its entire row set on one task — the straggler that decides
  * the job's wall clock at 100 TB. AQE's skew-join split handles this
  * at runtime for sort-merge joins; salting is the plan-level fix
  * that also works where AQE cannot (aggregations feeding the join,
  * deterministic tests, static planning).
  *
  * [[saltedJoin]] splits each fact key into `salts` sub-keys using a
  * DETERMINISTIC salt (hash of the whole fact row's join-irrelevant
  * id, mod `salts`) — never `rand()`, which breaks retry/replay
  * determinism (a retried task must re-produce identical output) —
  * and replicates each dim row `salts` ways so every sub-key still
  * finds its match. Join semantics are provably unchanged: the salt
  * matches by construction, so the result equals the unsalted join
  * row-for-row (the oracle for q19 verifies exactly that).
  */
object Skew {

  /** Inner/left equi join on `key`, salted `salts` ways. `saltBy` must
    * be a deterministic per-row expression (e.g. a row id) — it only
    * spreads rows, it never affects matching. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    val out = saltedFact.join(saltedDim, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }
}
