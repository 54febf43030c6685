package graft.ops

import java.nio.file.{Files, Path}
import java.sql.{DriverManager, Timestamp}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.io.{Sources, TableStore}

/** End-to-end pipeline test: two consecutive runs must leave the
  * warehouse state identical (watermark gate + anti-join idempotence)
  * while the report — faithfully non-idempotent, like the reference
  * (`report.py:63-69`) — appends per run; a day-2 delivery exercises
  * late-duplicate suppression and the SCD2 close/open/delete lifecycle
  * through the full stage chain, INCLUDING the three JDBC dimensions
  * (embedded Derby) and all four fraud rules with the reference's
  * unbounded history fan-out (q17 semantics, now E2E). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val reportDt = Timestamp.valueOf("2024-02-01 00:00:00")
  private val INF = Timestamp.valueOf("9999-12-31 00:00:00")

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n") + "\n"): Unit

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def day1(src: Path): Unit = {
    write(src, "transactions_01012024.txt",
      "transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal",
      "1;2024-01-01 10:00:00;1.234,56;C1;PAYMENT;SUCCESS;T1",
      "2;2024-01-01 10:30:00;0,99;C1;PAYMENT;SUCCESS;T2", // C1 hops T1→T2 in 30 min
      "3;2024-01-01 11:00:00;5,00;C3;PAYMENT;SUCCESS;T1",
      // C4: three REJECTs at strictly decreasing amounts then a
      // SUCCESS, all inside 20 minutes → rule 4 on txn 9.
      "6;2024-01-01 12:00:00;40,00;C4;PAYMENT;REJECT;T1",
      "7;2024-01-01 12:05:00;30,00;C4;PAYMENT;REJECT;T1",
      "8;2024-01-01 12:10:00;20,00;C4;PAYMENT;REJECT;T1",
      "9;2024-01-01 12:15:00;10,00;C4;PAYMENT;SUCCESS;T1")
    write(src, "terminals_01012024.txt",
      "terminal_id;terminal_type;terminal_city",
      "T1;ATM;Moscow",
      "T2;POS;Perm")
    // Excel blacklist: dummy .xlsx (no connector offline) + the
    // pre-converted sheet sibling the shim reads. P3 is CL3's passport.
    Files.createFile(src.resolve("passport_blacklist_01012024.xlsx"))
    write(src, "passport_blacklist_01012024.blacklist.csv",
      "date;passport",
      "2024-01-01;P3")
  }

  private def day2(src: Path): Unit = {
    write(src, "transactions_02012024.txt",
      "transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal",
      "1;2024-01-01 10:00:00;1.234,56;C1;PAYMENT;SUCCESS;T1", // replayed duplicate
      "4;2024-01-02 10:00:00;7,00;C2;PAYMENT;SUCCESS;T1",
      "5;2024-01-02 10:30:00;8,00;C2;PAYMENT;SUCCESS;T3") // C2 hops T1→T3
    write(src, "terminals_02012024.txt",
      "terminal_id;terminal_type;terminal_city",
      "T1;ATM;Kazan", // city changed
      "T3;POS;Omsk") // new; T2 vanished → delete-detected
  }

  /** Embedded source DB for the three JDBC dimensions. */
  private val dbUrl = "jdbc:derby:memory:graftpipedims;create=true"
  private def dimDb = Sources.JdbcSpec(url = dbUrl, table = "", user = "",
    password = "", driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private def sql(statements: String*): Unit = {
    val conn = DriverManager.getConnection(dbUrl)
    try {
      val st = conn.createStatement()
      statements.foreach(st.execute)
      st.close()
    } finally conn.close()
  }

  private def seedDims(): Unit = sql(
    """CREATE TABLE cards(card_num VARCHAR(20), account VARCHAR(20),
         create_dt TIMESTAMP, update_dt TIMESTAMP)""",
    """CREATE TABLE accounts(account VARCHAR(20), valid_to DATE,
         client VARCHAR(20), create_dt TIMESTAMP, update_dt TIMESTAMP)""",
    """CREATE TABLE clients(client_id VARCHAR(20), last_name VARCHAR(40),
         first_name VARCHAR(40), patronymic VARCHAR(40), date_of_birth DATE,
         passport_num VARCHAR(20), passport_valid_to DATE, phone VARCHAR(20),
         create_dt TIMESTAMP, update_dt TIMESTAMP)""",
    // C1's client has an EXPIRED passport → rule 1a on every C1 txn.
    // CL3's passport P3 is blacklisted → rule 1b. ACC2 expires
    // 2024-01-02 → rule 2 on C2's day-2 txns.
    "INSERT INTO cards VALUES ('C1','ACC1',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO cards VALUES ('C2','ACC2',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO cards VALUES ('C3','ACC3',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO cards VALUES ('C4','ACC4',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO accounts VALUES ('ACC1',DATE('2024-12-31'),'CL1',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO accounts VALUES ('ACC2',DATE('2024-01-02'),'CL2',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO accounts VALUES ('ACC3',DATE('2024-12-31'),'CL3',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO accounts VALUES ('ACC4',DATE('2024-12-31'),'CL4',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO clients VALUES ('CL1','Ivanov','Ivan','Ivanovich',DATE('1980-01-01'),'P1',DATE('2023-12-31'),'111',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO clients VALUES ('CL2','Petrov','Petr','Petrovich',DATE('1981-01-01'),'P2',DATE('2025-12-31'),'222',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO clients VALUES ('CL3','Sidorov','Sidr','Sidorovich',DATE('1982-01-01'),'P3',DATE('2025-12-31'),'333',TIMESTAMP('2023-12-01 00:00:00'),NULL)",
    "INSERT INTO clients VALUES ('CL4','Smirnov','Igor','Igorevich',DATE('1983-01-01'),'P4',DATE('2025-12-31'),'444',TIMESTAMP('2023-12-01 00:00:00'),NULL)")

  private def runAll(store: TableStore, src: Path, dimTs: Timestamp): Unit =
    Pipeline.run(spark, store, src.toString, reportDt,
      dimDb = Some(dimDb), dimRunTs = Some(dimTs))

  private def count(store: TableStore, t: String): Long =
    if (store.exists(t)) store.read(t).count() else 0L

  private def byRule(store: TableStore): Map[Int, Long] =
    store.read("rep_fraud").groupBy("event_type").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("full chain: 4 fraud rules, JDBC dims, idempotent facts, fan-out on history") {
    val src = Files.createTempDirectory("graft_pipe_src")
    val store = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh").toString)
    day1(src)
    seedDims()
    try {
      runAll(store, src, dimTs = ts("2024-01-01 12:00:00"))
      assert(count(store, "fact_transactions") === 7)
      assert(count(store, "fact_blacklist") === 1)
      assert(count(store, "dim_terminals_hist") === 2)
      assert(count(store, "dim_cards_hist") === 4)
      assert(count(store, "dim_accounts_hist") === 4)
      assert(count(store, "dim_clients_hist") === 4)
      // Day-1 report: rule 1 = C1's two txns (expired P1) + C3's txn
      // (blacklisted P3); rule 3 = C1's hop; rule 4 = C4's txn 9.
      assert(byRule(store) === Map(1 -> 3L, 3 -> 1L, 4 -> 1L))
      val factsAfter1 = store.read("fact_transactions").collect().toSet
      val dimAfter1 = store.read("dim_terminals_hist").collect().toSet
      val cardsAfter1 = store.read("dim_cards_hist").collect().toSet

      // Run 2, same inputs: watermark gates skip every file AND the
      // JDBC extracts (no source changes); facts and dims unchanged;
      // the report appends the same rows again (reference parity).
      runAll(store, src, dimTs = ts("2024-01-01 13:00:00"))
      assert(store.read("fact_transactions").collect().toSet === factsAfter1)
      assert(store.read("dim_terminals_hist").collect().toSet === dimAfter1)
      assert(store.read("dim_cards_hist").collect().toSet === cardsAfter1)
      assert(byRule(store) === Map(1 -> 6L, 3 -> 2L, 4 -> 2L))

      // Day 2: duplicate fact suppressed, two C2 facts land, terminal
      // SCD2 closes/opens/deletes, and C1's card is re-accounted in
      // the source → dim_cards_hist grows a second version. ACC1B also
      // exists → BOTH versions enrich to client CL1, so C1's txns fan
      // out (the reference joins every history version — q17, E2E).
      day2(src)
      sql(
        "UPDATE cards SET account = 'ACC1B', update_dt = TIMESTAMP('2024-01-02 09:00:00') WHERE card_num = 'C1'",
        "INSERT INTO accounts VALUES ('ACC1B',DATE('2024-12-31'),'CL1',TIMESTAMP('2024-01-02 09:00:00'),NULL)")
      runAll(store, src, dimTs = ts("2024-01-02 12:00:00"))
      assert(count(store, "fact_transactions") === 9)

      val dim = store.read("dim_terminals_hist").collect().map(r =>
        (r.getString(0), r.getString(2), r.getTimestamp(3), r.getTimestamp(4),
          r.getString(5))).toSet
      val d1 = ts("2024-01-01 00:00:00")
      val d2 = ts("2024-01-02 00:00:00")
      val d1Close = ts("2024-01-01 23:59:59")
      assert(dim === Set(
        ("T1", "Moscow", d1, d1Close, "N"), // closed 1s before replacement
        ("T1", "Kazan", d2, INF, "N"),
        ("T2", "Perm", d1, d1Close, "N"), // closed by delete detection
        ("T2", "Perm", d2, INF, "Y"), // marker keeps last attributes
        ("T3", "Omsk", d2, INF, "N")))

      // C1 now has a closed ACC1 version and an open ACC1B version.
      val c1 = store.read("dim_cards_hist")
        .filter(org.apache.spark.sql.functions.col("card_num") === "C1")
        .collect().map(r => (r.getString(1), r.getTimestamp(3))).toSet
      assert(c1 === Set(("ACC1", ts("2024-01-02 08:59:59")), ("ACC1B", INF)))

      // Run-3 report delta: rule 1 = C1's two txns × TWO card versions
      // (fan-out) + C3 = 5; rule 2 = C2's two txns on/after ACC2's
      // valid_to = 2; rule 3 = C1's hop + C2's hop = 2; rule 4 = 1.
      assert(byRule(store) === Map(
        1 -> (6L + 5L), 2 -> 2L, 3 -> (2L + 2L), 4 -> (2L + 1L)))
      // The fan-out multiplicity, directly: txn 1 (C1, day 1) appears
      // TWICE in this run's rule-1 rows — once per card version.
      import org.apache.spark.sql.functions.col
      assert(store.read("rep_fraud")
        .filter(col("event_type") === 1 && col("passport") === "P1" &&
          col("event_dt") === ts("2024-01-01 10:00:00")).count() === 4)
      // runs 1+2 contributed one each, run 3 two

      // Report rows carry the reference's enrichment shape.
      val r4row = store.read("rep_fraud")
        .filter(col("event_type") === 4).collect().head
      assert(r4row.getString(1) === "P4" && r4row.getString(2) === "Smirnov Igor Igorevich"
        && r4row.getString(3) === "444")

      // European decimal promotion survived staging → warehouse.
      val amt = store.read("fact_transactions")
        .filter(col("transaction_id") === "1")
        .collect().head.getDecimal(2)
      assert(amt.toPlainString === "1234.56")
    } finally sql("DROP TABLE cards", "DROP TABLE accounts", "DROP TABLE clients")
  }

  test("bucketed dimension storage: identical SCD2 content to the snapshot path") {
    val src = Files.createTempDirectory("graft_pipe_src_bk")
    val plain = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh_p").toString)
    val bucketed = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh_b").toString)
    day1(src)
    Pipeline.runTerminals(spark, plain, src.toString)
    Pipeline.runTerminals(spark, bucketed, src.toString, bucketDims = Some(4))
    day2(src)
    Pipeline.runTerminals(spark, plain, src.toString)
    Pipeline.runTerminals(spark, bucketed, src.toString, bucketDims = Some(4))
    val cols = Pipeline.TermSchema ++ Seq("effective_from", "effective_to", "deleted_flg")
    def snap(s: TableStore) = s.read("dim_terminals_hist")
      .select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSet
    // Same merge history through the partition-scoped path, bucket
    // column stripped; physical scoped-rewrite behavior is pinned by
    // Scd2PartitionedSpec — this is the E2E semantic parity check.
    assert(snap(bucketed) === snap(plain))
    // The bucketed layout is laid out in kb= leaves on disk.
    assert(new java.io.File(bucketed.path("dim_terminals_hist")).listFiles()
      .exists(_.getName.startsWith(Scd2.BucketColName + "=")))
  }

  test("versioned dimension storage: identical SCD2 content, no directory rename") {
    val src = Files.createTempDirectory("graft_pipe_src_vr")
    val plain = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh_p2").toString)
    val versioned = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh_v").toString)
    day1(src)
    Pipeline.runTerminals(spark, plain, src.toString)
    Pipeline.runTerminals(spark, versioned, src.toString, versionedDims = true)
    day2(src)
    Pipeline.runTerminals(spark, plain, src.toString)
    Pipeline.runTerminals(spark, versioned, src.toString, versionedDims = true)
    val cols = Pipeline.TermSchema ++ Seq("effective_from", "effective_to", "deleted_flg")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSet
    // Same merge history through the manifest-commit path — and the
    // report stage's readResolvedOr picks the versioned layout up with
    // no flag.
    assert(rows(versioned.readVersioned("dim_terminals_hist")) ===
      rows(plain.read("dim_terminals_hist")))
    assert(rows(versioned.readResolvedOr("dim_terminals_hist",
      plain.read("dim_terminals_hist").schema)) ===
      rows(plain.read("dim_terminals_hist")))
    // Two merges → two immutable generations behind the manifest; the
    // live pointer resolves to the second.
    assert(versioned.liveGeneration("dim_terminals_hist").contains(2L))
    val leaves = new java.io.File(versioned.path("dim_terminals_hist"))
      .listFiles().map(_.getName).toSet
    assert(leaves.contains("g1") && leaves.contains("g2") && leaves.contains("_manifest"))
  }

  test("streaming fact stage: checkpointed ingest + anti-join promotion") {
    val src = Files.createTempDirectory("graft_pipe_stream")
    val store = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh3").toString)
    day1(src)
    Pipeline.runTransactionsStreaming(spark, store, src.toString)
    assert(count(store, "fact_transactions") === 7)
    // Second invocation: checkpoint skips the already-ingested file; a
    // day-2 delivery with a replayed duplicate row adds only new facts.
    Pipeline.runTransactionsStreaming(spark, store, src.toString)
    assert(count(store, "fact_transactions") === 7)
    day2(src)
    Pipeline.runTransactionsStreaming(spark, store, src.toString)
    assert(count(store, "fact_transactions") === 9)
  }

  test("archive=true moves processed files so reruns see an empty source") {
    val src = Files.createTempDirectory("graft_pipe_arch")
    val store = new TableStore(spark, Files.createTempDirectory("graft_pipe_wh2").toString)
    day1(src)
    Pipeline.run(spark, store, src.toString, reportDt, archive = true)
    assert(Files.exists(src.resolve("archive/transactions_01012024.txt.backup")))
    assert(Files.exists(src.resolve("archive/terminals_01012024.txt.backup")))
    assert(Files.exists(src.resolve("archive/passport_blacklist_01012024.xlsx.backup")))
    assert(!Files.exists(src.resolve("transactions_01012024.txt")))
    assert(count(store, "fact_transactions") === 7)
  }
}
