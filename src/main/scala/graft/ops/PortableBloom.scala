package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable Bloom filter as a RELATIONAL bit table — the
  * auditable complement of [[RuntimeFilter]] (which wraps Spark's own
  * `bloom_filter_agg` sketch: faster, but an opaque binary no other
  * engine can recompute). Here every piece is plain integer
  * arithmetic — positions from the [[graft.functions.Functions
  * .minhashFn]] hash family, the filter itself a `(word_index, bits)`
  * table built by one `bit_or` hash aggregate — so a DuckDB oracle
  * (or any future engine reading the ledger) derives the identical
  * membership verdict bit-for-bit, which is what lets a query PIN its
  * bloom routing decisions in the correctness gate instead of hiding
  * them behind an exact join.
  *
  * Scale shape: the bit table is bounded by `m/32` rows REGARDLESS of
  * key count (10⁹ seen keys at 16 bits/key → ~5 GB of words spread
  * over the cluster, or broadcast when small); it builds in one
  * partial-aggregated `groupBy` (bit_or partials merge map-side), and
  * probing is an equi join against that bounded table — never a scan
  * of the seen set. The no-false-negative property is structural
  * (every inserted key's bits are or-ed in), so "not in the filter"
  * rows may skip the exact seen-set join entirely; only the maybe
  * fraction (true dups + the fp tail, ~(1−e^(−k·n/m))^k) pays it.
  */
object PortableBloom {

  /** Hash-family modulus (Mersenne prime 2^31−1, the minhashFn P). */
  val P: Long = 2147483647L

  /** (a_i, b_i) of probe function i — the minhashFn family constants,
    * reused so both engines share one documented hash family. */
  def coeffs(i: Int): (Long, Long) =
    ((1103515245L * (i + 1)) % P, (12345L * (i.toLong * i + 1)) % P)

  /** Smallest power of two ≥ x (the filter width dial: sizing m from
    * the SEEN-set count keeps the fp fraction corpus-size-invariant —
    * a fixed m would saturate at 100× the keys and stop pruning). */
  def nextPow2(x: Long): Long = {
    require(x >= 1 && x <= (1L << 62), s"nextPow2 domain: $x")
    java.lang.Long.highestOneBit(math.max(1L, 2 * x - 1))
  }

  /** Bit position of probe i for a (nonnegative) 64-bit key. */
  def position(fp: Column, i: Int, m: Long): Column = {
    val (a, b) = coeffs(i)
    ((lit(a) * (fp % P) + lit(b)) % P) % m
  }

  /** The DuckDB spelling of [[position]] (must mirror it exactly). */
  def positionSql(fpExpr: String, i: Int, mExpr: String): String = {
    val (a, b) = coeffs(i)
    s"(($a * ($fpExpr % $P) + $b) % $P) % $mExpr"
  }

  /** The filter: one row per 32-bit word that has any bit set —
    * (widx, bits). 32-bit words inside BIGINTs keep every shift off
    * the sign bit on both engines. */
  def bitTable(keys: DataFrame, fpCol: String, k: Int, m: Long): DataFrame =
    keys.select(explode(array((0 until k).map(i =>
        position(col(fpCol), i, m)): _*)).as("pos"))
      .groupBy(expr("pos div 32").as("widx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 32 as int)))")
        .as("bits"))

  /** Membership probe: appends `bloom_maybe` (int 0/1) to `batch`.
    * The word table joins by widx — bounded by m/32 rows, so AQE
    * broadcasts it; a missing word row means no bits set there.
    *
    * CONTRACT: `batch`'s columns must form a unique key (one row per
    * value combination). The probe explodes k positions per row and
    * re-aggregates by ALL of batch's columns, so duplicate input rows
    * collapse to ONE output row — callers that need duplicate
    * preservation must thread a distinct id column through (every
    * current caller keys by doc_id). An internally-generated row id
    * (monotonically_increasing_id) was considered and rejected: its
    * values depend on partition layout, so a stage retry after an
    * upstream shuffle could regroup rows differently mid-query. */
  def withMaybe(batch: DataFrame, fpCol: String, k: Int, m: Long,
                words: DataFrame): DataFrame = {
    val probe = batch.select(col("*"),
        explode(array((0 until k).map(i =>
          position(col(fpCol), i, m)): _*)).as("pos"))
      .select(col("*"), expr("pos div 32").as("widx"),
        expr("cast(pos % 32 as int)").as("bit"))
    val hit = expr("(shiftright(coalesce(bits, cast(0 as bigint)), bit) & 1) = 1")
    probe.join(broadcast(words), Seq("widx"), "left")
      .groupBy(batch.columns.map(col).toIndexedSeq: _*)
      .agg(sum(when(hit, 1).otherwise(0)).as("__hits"))
      .withColumn("bloom_maybe", (col("__hits") === k).cast("int"))
      .drop("__hits")
  }
}
