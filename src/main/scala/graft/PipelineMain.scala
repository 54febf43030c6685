package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.io.TableStore
import graft.ops.Pipeline

/** CLI entry for the full pipeline run — the `main.py` analog: one
  * session, stages in dependency order, one exit code.
  *
  * Usage: PipelineMain <srcDir> <warehouseDir> [reportDtIso] [--archive]
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PipelineMain <srcDir> <warehouseDir> [reportDtIso] [--archive]")
    val srcDir = args(0)
    val whDir = args(1)
    val reportDt = args.lift(2).filterNot(_.startsWith("--"))
      .map(s => Timestamp.valueOf(s + " 00:00:00"))
      .getOrElse(new Timestamp(System.currentTimeMillis()))
    val archive = args.contains("--archive")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Pipeline.run(spark, new TableStore(spark, whDir), srcDir, reportDt, archive)
    finally spark.stop()
  }
}
