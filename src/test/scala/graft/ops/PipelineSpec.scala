package graft.ops

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.TableStore

/** End-to-end pipeline test (VERDICT r1 item 4): two consecutive runs
  * must leave the warehouse state identical (watermark gate + anti-join
  * idempotence) while the report — faithfully non-idempotent, like the
  * reference (`report.py:63-69`) — appends per run; a day-2 delivery
  * exercises late-duplicate suppression and the SCD2 close/open/delete
  * lifecycle through the full stage chain. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val reportDt = Timestamp.valueOf("2024-02-01 00:00:00")
  private val INF = Timestamp.valueOf("9999-12-31 00:00:00")

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n") + "\n"): Unit

  private def day1(src: Path): Unit = {
    write(src, "transactions_01012024.txt",
      "transaction_id;transaction_date;amount;card_num;terminal",
      "1;2024-01-01 10:00:00;1.234,56;C1;T1",
      "2;2024-01-01 10:30:00;0,99;C1;T2", // C1 hops T1→T2 in 30 min
      "3;2024-01-01 11:00:00;5,00;C3;T1")
    write(src, "terminals_01012024.txt",
      "terminal_id;terminal_type;terminal_city",
      "T1;ATM;Moscow",
      "T2;POS;Perm")
    // Excel blacklist: dummy .xlsx (no connector offline) + the
    // pre-converted sheet sibling the shim reads.
    Files.createFile(src.resolve("black_list_01012024.xlsx"))
    write(src, "black_list_01012024.blacklist.csv",
      "card_num;entry_dt",
      "C3;2024-01-01")
  }

  private def day2(src: Path): Unit = {
    write(src, "transactions_02012024.txt",
      "transaction_id;transaction_date;amount;card_num;terminal",
      "1;2024-01-01 10:00:00;1.234,56;C1;T1", // replayed duplicate
      "4;2024-01-02 10:00:00;7,00;C2;T1",
      "5;2024-01-02 10:30:00;8,00;C2;T3") // C2 hops T1→T3
    write(src, "terminals_02012024.txt",
      "terminal_id;terminal_type;terminal_city",
      "T1;ATM;Kazan", // city changed
      "T3;POS;Omsk") // new; T2 vanished → delete-detected
  }

  private def count(store: TableStore, t: String): Long =
    if (store.exists(t)) store.read(t).count() else 0L

  test("two runs leave warehouse state identical; day-2 delivery merges correctly") {
    val src = Files.createTempDirectory("graft_pipe_src")
    val store = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh").toString)
    day1(src)

    Pipeline.run(spark, store, src.toString, reportDt)
    assert(count(store, "fact_transactions") === 3)
    assert(count(store, "fact_blacklist") === 1)
    assert(count(store, "dim_terminals_hist") === 2)
    assert(count(store, "rep_fraud") === 2) // C1's hop (rule 3) + C3 blacklisted (rule 1)
    val factsAfter1 = store.read("fact_transactions").collect().toSet
    val dimAfter1 = store.read("dim_terminals_hist").collect().toSet

    // Run 2, same inputs: watermark gate skips all files; facts and dim
    // unchanged; the report appends again (reference parity).
    Pipeline.run(spark, store, src.toString, reportDt)
    assert(store.read("fact_transactions").collect().toSet === factsAfter1)
    assert(store.read("dim_terminals_hist").collect().toSet === dimAfter1)
    assert(count(store, "fact_blacklist") === 1)
    assert(count(store, "rep_fraud") === 4)

    // Day-2 delivery: duplicate fact suppressed, two new facts land,
    // SCD2 closes/opens/deletes, report recomputes over the full state.
    day2(src)
    Pipeline.run(spark, store, src.toString, reportDt)
    assert(count(store, "fact_transactions") === 5)

    val dim = store.read("dim_terminals_hist").collect().map(r =>
      (r.getString(0), r.getString(2), r.getTimestamp(3), r.getTimestamp(4),
        r.getString(5))).toSet
    val d1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val d2 = Timestamp.valueOf("2024-01-02 00:00:00")
    val d1Close = Timestamp.valueOf("2024-01-01 23:59:59")
    assert(dim === Set(
      ("T1", "Moscow", d1, d1Close, "N"), // closed 1s before replacement
      ("T1", "Kazan", d2, INF, "N"),
      ("T2", "Perm", d1, d1Close, "N"), // closed by delete detection
      ("T2", "Perm", d2, INF, "Y"), // marker keeps last attributes
      ("T3", "Omsk", d2, INF, "N")))

    // Report run 3 recomputes over the full state: C3 rule-1, C1 and
    // C2 rule-3 hops → +3 rows.
    assert(count(store, "rep_fraud") === 7)
    val flagged = store.read("rep_fraud").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getString(3), r.getString(4))).toSet
    assert(flagged === Set(
      ("C3", 1, "Moscow", null), // blacklisted card, no prior txn
      ("C1", 3, "Perm", "Moscow"),
      ("C2", 3, "Omsk", "Kazan")))

    // European decimal promotion survived staging → warehouse.
    val amt = store.read("fact_transactions")
      .filter(org.apache.spark.sql.functions.col("transaction_id") === "1")
      .collect().head.getDecimal(2)
    assert(amt.toPlainString === "1234.56")
  }

  test("streaming fact stage: checkpointed ingest + anti-join promotion") {
    val src = Files.createTempDirectory("graft_pipe_stream")
    val store = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh3").toString)
    day1(src)
    Pipeline.runTransactionsStreaming(spark, store, src.toString)
    assert(count(store, "fact_transactions") === 3)
    // Second invocation: checkpoint skips the already-ingested file; a
    // day-2 delivery with a replayed duplicate row adds only new facts.
    Pipeline.runTransactionsStreaming(spark, store, src.toString)
    assert(count(store, "fact_transactions") === 3)
    day2(src)
    Pipeline.runTransactionsStreaming(spark, store, src.toString)
    assert(count(store, "fact_transactions") === 5)
  }

  test("archive=true moves processed files so reruns see an empty source") {
    val src = Files.createTempDirectory("graft_pipe_arch")
    val store = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh2").toString)
    day1(src)
    Pipeline.run(spark, store, src.toString, reportDt, archive = true)
    assert(Files.exists(src.resolve("archive/transactions_01012024.txt.backup")))
    assert(Files.exists(src.resolve("archive/terminals_01012024.txt.backup")))
    assert(Files.exists(src.resolve("archive/black_list_01012024.xlsx.backup")))
    assert(!Files.exists(src.resolve("transactions_01012024.txt")))
    assert(count(store, "fact_transactions") === 3)
  }
}
