package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-load watermark state machine (SURVEY.md §2.10; reference
  * `vean_meta_date`, `main.ddl:133-137`): per-target `max_update_dt`
  * read at start, advanced after a successful load, upserted with an
  * insert-if-absent guard (`transaction.py:95-108`, P11/J9).
  *
  * The meta table is tiny (one row per target) — reading the watermark
  * is a driver-side scalar (`J9`: scalar subquery ≡ `.first()` on a
  * filtered one-row frame); the upsert is a pure recompute of the tiny
  * table (anti-join insert + overwritten max), never a per-row update.
  */
object Incremental {

  val metaSchema = "schema_name STRING, table_name STRING, max_update_dt TIMESTAMP"

  /** Read the watermark for (schemaName, tableName), with the
    * reference's coalesce-to-default fallback (`transaction.py:31-43`:
    * `coalesce((SELECT max_update_dt …), to_timestamp('1900-01-01'))`). */
  def readWatermark(meta: DataFrame, schemaName: String, tableName: String,
                    default: Timestamp = Timestamp.valueOf("1900-01-01 00:00:00")): Timestamp = {
    val row = meta
      .filter(col("schema_name") === schemaName && col("table_name") === tableName)
      .agg(max("max_update_dt"))
      .first()
    if (row.isNullAt(0)) default else row.getTimestamp(0)
  }

  /** Advance the watermark: upsert (schemaName, tableName) → newMax.
    * Reference semantics = INSERT-if-absent (P11 `NOT EXISTS` guard,
    * `transaction.py:103`) then UPDATE to the max over staging
    * (`transaction.py:95-108`). Pure recompute of the tiny meta table. */
  def advance(meta: DataFrame, schemaName: String, tableName: String,
              newMax: Timestamp): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    val incoming = Seq((schemaName, tableName, newMax))
      .toDF("schema_name", "table_name", "max_update_dt")
    val untouched = meta.filter(
      !(col("schema_name") === schemaName && col("table_name") === tableName))
    // greatest(old, new): the reference only ever moves forward because
    // it takes max() over the just-loaded batch; keep monotonicity explicit.
    val existing = meta.filter(
      col("schema_name") === schemaName && col("table_name") === tableName)
    val merged = incoming.join(existing.select(col("schema_name"), col("table_name"),
        col("max_update_dt").as("old_max")), Seq("schema_name", "table_name"), "left")
      .select(col("schema_name"), col("table_name"),
        greatest(col("max_update_dt"), coalesce(col("old_max"), col("max_update_dt")))
          .as("max_update_dt"))
    untouched.unionByName(merged)
  }

  /** Seed an empty meta table (reference `main.ddl:139-145`). */
  def seed(spark: SparkSession, rows: Seq[(String, String, Timestamp)]): DataFrame = {
    import spark.implicits._
    rows.toDF("schema_name", "table_name", "max_update_dt")
  }
}
