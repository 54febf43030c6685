package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Functions._
import graft.io.Sources

/** The flagship analytical query — the reference's fraud report
  * (`report.py:12-113`) re-expressed over the harness tables
  * (SURVEY.md §3.3, §7.2): `events` stands in for
  * `fact_transactions` (user_id ≈ card_num, ts ≈ trans_date,
  * value ≈ amt), `customer` for the client dimension, and a
  * deterministic key-derived subset of `customer` for the passport
  * blacklist.
  *
  * Shape preserved from the reference:
  *   - CTE `cl`: enrichment star join (left joins, NULL-skipping name
  *     concat F7, coalesce'd blacklist entry date `report.py:29`)
  *   - CTE `lg`: 9 lag columns over one window
  *     (PARTITION BY card ORDER BY ts, `report.py:50-62`) — Spark
  *     evaluates all lags in a single WindowExec after one shuffle
  *   - 4 rule branches UNION ALL'd with `fraud_type` literals 1–4 and a
  *     pinned `report_dt` (the reference's `now()` is nondeterministic;
  *     parity queries pin it — SURVEY.md §5.2)
  *
  * Scale notes: the only wide exchange is the window shuffle on
  * user_id; the dimension joins broadcast. Rules 1–2 branch from `cl`
  * and 3–4 from `lg`; both reuse the same scan + joins (exchange
  * reuse), and all four filters run over the one Window output.
  */
object Fraud {

  val ReportDt = "2024-02-01 00:00:00"

  /** Enrichment: events left-joined to the customer dim and the
    * derived blacklist (`report.py:12-49`). */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame = {
    // Blacklist analog: every 13th customer, entered 2024-01-10
    // (deterministic stand-in for fact_passport_blacklist).
    val blacklist = customer
      .filter(col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("bl_key"),
        to_timestamp(lit("2024-01-10 00:00:00")).as("entry_dt"))
    // Account-expiry analog (report.py rule 2's valid_to): every 4th
    // user expires 2024-01-20, everyone else end-of-year.
    // No broadcast hints: customer (and the blacklist derived from it)
    // scales with the data; AQE broadcasts at runtime when small.
    events
      .join(customer, events("user_id") === customer("c_custkey"), "left")
      .join(blacklist, events("user_id") === col("bl_key"), "left")
      .withColumn("fio", fio(lit("Customer"), col("c_name"), col("c_mktsegment")))
      .withColumn("valid_to",
        when(col("user_id") % 4 === 0, to_timestamp(lit("2024-01-20 00:00:00")))
          .otherwise(to_timestamp(lit("2024-12-31 00:00:00"))))
      .withColumn("bl_entry_dt", coalesce(col("entry_dt"), InfinityTs))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("city", (col("k") % 10).cast("string"))
      .withColumn("oper_result",
        when(col("k") % 3 === 0, lit("REJECT")).otherwise(lit("SUCCESS")))
  }

  /** The `lg` CTE: all lag columns in one window
    * (`report.py:50-62`). */
  def withLags(cl: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    cl.withColumn("lag_city", lag(col("city"), 1).over(w))
      .withColumn("gap_us", epochUs(col("ts")) - epochUs(lag(col("ts"), 1).over(w)))
      .withColumn("res1", lag(col("oper_result"), 1).over(w))
      .withColumn("res2", lag(col("oper_result"), 2).over(w))
      .withColumn("res3", lag(col("oper_result"), 3).over(w))
      .withColumn("amt1", lag(col("value"), 1).over(w))
      .withColumn("amt2", lag(col("value"), 2).over(w))
      .withColumn("amt3", lag(col("value"), 3).over(w))
      .withColumn("ts3", lag(col("ts"), 3).over(w))
  }

  /** Rules 1–4 (`report.py:63-113`). Same multiset as the reference's
    * four UNION ALL branches, computed in ONE pass: per row, the array
    * of fired rule ids explodes into 0–4 output rows, so the
    * enrichment star and the window evaluate exactly once instead of
    * once per window-referencing branch. */
  def report(events: DataFrame, customer: DataFrame): DataFrame = {
    val lg = withLags(enrich(events, customer))
    // Rule 1 (report.py:70-78): expired/blacklisted passport analog —
    // blacklisted user active on/after the blacklist entry date.
    val rule1 = col("bl_key").isNotNull && col("ts") >= col("bl_entry_dt")
    // Rule 2 (report.py:80-88): activity on/after account expiry.
    val rule2 = col("ts") >= col("valid_to")
    // Rule 3 (report.py:90-99): city hop within one hour.
    val rule3 = col("lag_city").isNotNull && col("city") =!= col("lag_city") &&
      col("gap_us") <= 3600L * 1000000L
    // Rule 4 (report.py:101-113): three strictly-decreasing REJECTs then
    // a SUCCESS within 20 minutes, restricted operation types.
    val rule4 = col("oper_result") === "SUCCESS" &&
      col("res1") === "REJECT" && col("res2") === "REJECT" && col("res3") === "REJECT" &&
      col("value") < col("amt1") && col("amt1") < col("amt2") && col("amt2") < col("amt3") &&
      withinSeconds(col("ts"), col("ts3"), 20 * 60) &&
      col("event_type").isin("click", "view")
    lg.withColumn("fraud_type", explode(filter(array(
        when(rule1, lit(1)), when(rule2, lit(2)),
        when(rule3, lit(3)), when(rule4, lit(4))), v => v.isNotNull)))
      .select(
        col("ts").as("event_dt"),
        col("user_id"),
        col("fio"),
        col("fraud_type").cast("int").as("fraud_type"),
        to_timestamp(lit(ReportDt)).as("report_dt"))
  }

  /** Flagship entry for the driver smoke test (sf0.001). */
  def flagship(spark: SparkSession, sfDir: String): DataFrame =
    report(Sources.table(spark, sfDir, "events"),
      Sources.table(spark, sfDir, "customer"))
}
