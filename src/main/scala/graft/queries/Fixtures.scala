package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions._
import graft.io.Sources

/** Deterministic SCD2 / temporal-join fixtures derived from the harness
  * `customer` table (SURVEY.md §7.2 entity mapping). The same
  * constructions are written as CTEs in the DuckDB oracles, so the
  * Spark side and the oracle agree bit-for-bit on inputs.
  */
object Fixtures {

  /** customer → (k, seg, bal_cents): money as exact integer cents to
    * keep tracked-attribute comparison and output hashing engine-exact
    * (SURVEY.md §7.6 double-vs-decimal risk). */
  def custBase(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "customer").select(
      col("c_custkey").as("k"),
      col("c_mktsegment").as("seg"),
      graft.functions.Functions.cents(col("c_acctbal")).as("bal_cents"))

  /** SCD2 dimension snapshot: keys k%10≠0 get one open version; of
    * those, keys k%9=0 also carry one closed historical version. */
  def scd2Dim(spark: SparkSession, sfDir: String): DataFrame = {
    val base = custBase(spark, sfDir)
    val cur = base.filter(col("k") % 10 =!= 0)
      .withColumn("effective_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("effective_to", InfinityTs)
      .withColumn("deleted_flg", lit("N"))
    val hist = base.filter(col("k") % 10 =!= 0 && col("k") % 9 === 0)
      .withColumn("seg", lit("OLD"))
      .withColumn("effective_from", to_timestamp(lit("2023-01-01 00:00:00")))
      .withColumn("effective_to", to_timestamp(lit("2023-12-31 23:59:59")))
      .withColumn("deleted_flg", lit("N"))
    cur.unionByName(hist)
  }

  /** Incoming SCD2 batch: keys k%7≠0; every 5th key's balance moved by
    * +100 cents (a tracked-attribute change). */
  def scd2Batch(spark: SparkSession, sfDir: String): DataFrame =
    custBase(spark, sfDir).filter(col("k") % 7 =!= 0)
      .withColumn("bal_cents",
        when(col("k") % 5 === 0, col("bal_cents") + 100).otherwise(col("bal_cents")))

  /** Two-version temporal dimension over the event user-id space:
    * v1 valid (2024-01-01, 2024-01-15), v2 valid (2024-01-15, ∞) with
    * every 17th key's v2 dead ('Y'). */
  def temporalDim(spark: SparkSession, sfDir: String): DataFrame = {
    val base = custBase(spark, sfDir).filter(col("k") <= 150)
      .select("k", "seg")
    val v1 = base
      .withColumn("effective_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("effective_to", to_timestamp(lit("2024-01-15 00:00:00")))
      .withColumn("deleted_flg", lit("N"))
    val v2 = base
      .withColumn("seg", concat(col("seg"), lit("_V2")))
      .withColumn("effective_from", to_timestamp(lit("2024-01-15 00:00:00")))
      .withColumn("effective_to", InfinityTs)
      .withColumn("deleted_flg",
        when(col("k") % 17 === 0, lit("Y")).otherwise(lit("N")))
    v1.unionByName(v2)
  }

  /** The same fixtures as SQL CTE bodies for the DuckDB oracles. */
  val custBaseSql: String =
    "SELECT c_custkey AS k, c_mktsegment AS seg, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer"

  val scd2DimSql: String =
    s"""SELECT k, seg, bal_cents, TIMESTAMP '2024-01-01 00:00:00' AS effective_from, TIMESTAMP '9999-12-31 00:00:00' AS effective_to, 'N' AS deleted_flg FROM base WHERE k % 10 <> 0
       |UNION ALL
       |SELECT k, 'OLD', bal_cents, TIMESTAMP '2023-01-01 00:00:00', TIMESTAMP '2023-12-31 23:59:59', 'N' FROM base WHERE k % 10 <> 0 AND k % 9 = 0""".stripMargin

  val scd2BatchSql: String =
    "SELECT k, seg, CASE WHEN k % 5 = 0 THEN bal_cents + 100 ELSE bal_cents END AS bal_cents FROM base WHERE k % 7 <> 0"

  val temporalDimSql: String =
    s"""SELECT k, seg, TIMESTAMP '2024-01-01 00:00:00' AS effective_from, TIMESTAMP '2024-01-15 00:00:00' AS effective_to, 'N' AS deleted_flg FROM base WHERE k <= 150
       |UNION ALL
       |SELECT k, seg || '_V2', TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '9999-12-31 00:00:00', CASE WHEN k % 17 = 0 THEN 'Y' ELSE 'N' END FROM base WHERE k <= 150""".stripMargin
}
