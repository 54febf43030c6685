package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table

/** Beyond-reference capabilities (filled in by the dedup / similarity /
  * text-analysis / multimodal modules). Start: grouped aggregation —
  * the reference has no GROUP BY (SURVEY.md §2.5) but any analytics
  * engine needs it; TPC-H Q1 shape with money as exact integer cents.
  */
object ExtensionQueries {

  val all: Seq[Q] = Seq(

    Q("q20_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, d) =>
        table(s, d, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(round(col("l_quantity") * 100).cast("bigint")).cast("bigint")
              .as("sum_qty_cents"),
            sum(round(col("l_extendedprice") * 100).cast("bigint")).cast("bigint")
              .as("sum_base_cents"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
              .cast("bigint")).cast("bigint").as("sum_disc_cents"),
            count(lit(1)).as("count_order"))
    }
  )
}
