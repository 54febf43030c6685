package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Functions._
import graft.io.{Sources, TableStore}

/** End-to-end pipeline orchestration — the engine's counterpart of the
  * reference's `main.py:47-50` stage chain: CSV facts → staging →
  * idempotent warehouse append; full-snapshot dimension files → SCD2
  * merge; then the windowed fraud report appended per run. One
  * SparkSession drives every stage in dependency order (the reference's
  * process-per-stage boundary disappears; SURVEY.md §3.1).
  *
  * Faithfully kept observable semantics:
  *   - per-file watermark gate `file_date > watermark`
  *     (`transaction.py:51`) with the watermark advanced to the LAST
  *     processed file's max — not "next date" (`transaction.py:102`,
  *     SURVEY.md §7.4f);
  *   - skip-if-no-rows guards (`cards.py:71,196-197`);
  *   - anti-join insert makes fact replay duplicate-free (J1) while the
  *     report append is deliberately NOT idempotent (`report.py:63-69`,
  *     SURVEY.md §5.1) — re-running the report stage appends again;
  *   - the terminals-style delete clock = the file date
  *     (`terminals.py:172`).
  *
  * Scale notes: each stage is one lineage DAG ending in one write; the
  * only shuffles are the SCD2 key joins and the report window. Staging
  * is truncate-reload (bounded), facts are append-only (no rewrite of
  * history), and the dimension swap rewrites only the dimension.
  */
object Pipeline {

  val TxSchema: Seq[String] =
    Seq("transaction_id", "transaction_date", "amount", "card_num", "terminal")
  val TermSchema: Seq[String] = Seq("terminal_id", "terminal_type", "terminal_city")
  val BlacklistSchema: Seq[String] = Seq("card_num", "entry_dt")

  private val dimStruct = StructType(Seq(
    StructField("terminal_id", StringType),
    StructField("terminal_type", StringType),
    StructField("terminal_city", StringType),
    StructField("effective_from", TimestampType),
    StructField("effective_to", TimestampType),
    StructField("deleted_flg", StringType)))

  private val factStruct = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("transaction_date", TimestampType),
    StructField("amount", DecimalType(15, 2)),
    StructField("card_num", StringType),
    StructField("terminal", StringType)))

  private val metaStruct = StructType(Seq(
    StructField("schema_name", StringType),
    StructField("table_name", StringType),
    StructField("max_update_dt", TimestampType)))

  private val blacklistStruct = StructType(Seq(
    StructField("card_num", StringType),
    StructField("entry_dt", DateType)))

  private def meta(store: TableStore): DataFrame =
    store.readOr("meta_date", metaStruct)

  private def isoToTs(iso: String): Timestamp = Timestamp.valueOf(s"$iso 00:00:00")

  /** Shared stage skeleton: discover mask-matching files newer than
    * the `wmKey` watermark in chronological order; per file, stage it
    * and hand (stagedFrame, fileDateIso) to the stage body, which
    * returns the watermark value to advance to (None = file had no
    * usable rows → watermark untouched). The A3 skip-if-no-rows guard
    * and archiving live here once. */
  private def processFiles(spark: SparkSession, store: TableStore,
                           srcDir: String, mask: String, wmKey: String,
                           stgTable: String, archive: Boolean)
                          (stage: (String, SparkSession) => org.apache.spark.sql.DataFrame)
                          (body: (org.apache.spark.sql.DataFrame, String) => Option[Timestamp]): Unit = {
    val wmIso = Incremental
      .readWatermark(meta(store), "stg", wmKey).toString.take(10)
    Sources.listFilesChronological(srcDir, mask).foreach { f =>
      val fileDate = Sources.fileNameDateIso(f.getFileName.toString).get
      if (fileDate > wmIso) { // F12: ISO strings compare chronologically
        store.overwrite(stgTable, stage(f.toString, spark))
        val staged = store.read(stgTable)
        if (staged.limit(1).count() > 0) { // A3 guard (cards.py:71)
          body(staged, fileDate).foreach { newWm =>
            store.swapSnapshot("meta_date",
              Incremental.advance(meta(store), "stg", wmKey, newWm))
          }
        }
        if (archive) Sources.archive(f): Unit
      }
    }
  }

  /** Fact stage (`transaction.py` analog): per file, promote typed
    * rows via anti-join append; watermark = max(transaction_date) over
    * THIS file's staging (the reference's truncate-per-file loop makes
    * it the last file's max), falling back to the file date when no
    * row carries a parseable date. */
  def runTransactions(spark: SparkSession, store: TableStore, srcDir: String,
                      archive: Boolean = false): Unit =
    processFiles(spark, store, srcDir, "transactions_\\d{8}\\.txt",
        "transactions", "stg_transactions", archive) {
      (path, s) => Sources.csv(s, path, Sources.stringSchema(TxSchema: _*))
    } { (staged, fileDate) =>
      val typed = staged.select(
        col("transaction_id"),
        col("transaction_date").cast(TimestampType).as("transaction_date"),
        parseEuroDecimal(col("amount")).as("amount"),
        col("card_num"), col("terminal"))
      val fact = store.readOr("fact_transactions", factStruct)
      store.append("fact_transactions",
        AntiInsert.newRows(typed, fact, Seq("transaction_id")))
      val newMax = typed.agg(max(to_date(col("transaction_date")))).first()
      // All-malformed dates → null max; advance to the file's nominal
      // date rather than NPE-ing the run.
      Some(if (newMax.isNullAt(0)) isoToTs(fileDate)
           else isoToTs(newMax.getDate(0).toString))
    }

  /** Blacklist stage (`black_list.py` analog): Excel snapshots through
    * the [[graft.io.Sources.excel]] shim, anti-join append, and the
    * A2 watermark semantics — the file date folded in as a constant
    * (`black_list.py:97`), NOT max over staging. */
  def runBlacklist(spark: SparkSession, store: TableStore, srcDir: String,
                   archive: Boolean = false): Unit =
    processFiles(spark, store, srcDir, "black_list_\\d{8}\\.xlsx",
        "blacklist", "stg_blacklist", archive) {
      (path, s) => Sources.excel(s, path, "blacklist",
        Sources.stringSchema(BlacklistSchema: _*))
    } { (staged, fileDate) =>
      val typed = staged.select(col("card_num"),
        col("entry_dt").cast(DateType).as("entry_dt"))
      val fact = store.readOr("fact_blacklist", blacklistStruct)
      store.append("fact_blacklist",
        AntiInsert.newRows(typed, fact, Seq("card_num")))
      Some(isoToTs(fileDate)) // A2: file date as a folded constant
    }

  /** Streaming variant of the fact stage: the file-source checkpoint
    * replaces the hand-kept watermark (new files only, restart-safe);
    * each `Trigger.AvailableNow` micro-batch is promoted directly via
    * `foreachBatch` with the batch path's typed anti-join append.
    * Late/duplicate files remain harmless — the checkpoint skips
    * re-delivered paths and the anti-join drops re-delivered rows. */
  def runTransactionsStreaming(spark: SparkSession, store: TableStore,
                               srcDir: String): Unit = {
    val src = graft.streaming.Streaming.fileSource(spark,
      s"$srcDir/transactions_*.txt", graft.io.Sources.stringSchema(TxSchema: _*))
    // foreachBatch promotion: each micro-batch is typed and anti-join
    // appended directly — per-run work scales with the NEW files only
    // (no cumulative staging to re-read), and an empty source simply
    // yields no batches.
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val typed = batch.select(
          col("transaction_id"),
          col("transaction_date").cast(TimestampType).as("transaction_date"),
          parseEuroDecimal(col("amount")).as("amount"),
          col("card_num"), col("terminal"))
        val fact = store.readOr("fact_transactions", factStruct)
        store.append("fact_transactions",
          AntiInsert.newRows(typed, fact, Seq("transaction_id")))
      }
      .option("checkpointLocation", store.path("_ckpt_transactions"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Dimension stage (`terminals.py` analog): each full-snapshot file
    * newer than the watermark is staged and SCD2-merged; the file date
    * is both the version-open timestamp and the delete clock. */
  def runTerminals(spark: SparkSession, store: TableStore, srcDir: String,
                  archive: Boolean = false): Unit =
    processFiles(spark, store, srcDir, "terminals_\\d{8}\\.txt",
        "terminals", "stg_terminals", archive) {
      (path, s) => Sources.csv(s, path, Sources.stringSchema(TermSchema: _*))
    } { (batch, fileDate) =>
      val ts = lit(isoToTs(fileDate))
      val dim = store.readOr("dim_terminals_hist", dimStruct)
      store.swapSnapshot("dim_terminals_hist",
        Scd2.merge(dim, batch, Seq("terminal_id"), TermSchema.tail,
          batchTs = ts,
          deleteKeys = Some(batch.select("terminal_id")),
          deleteTs = Some(ts)))
      Some(isoToTs(fileDate))
    }

  private val cardsDimStruct = StructType(Seq(
    StructField("card_num", StringType),
    StructField("account_num", StringType),
    StructField("effective_from", TimestampType),
    StructField("effective_to", TimestampType),
    StructField("deleted_flg", StringType)))

  /** JDBC-incremental dimension stage (`cards.py:35-202` analog): the
    * LIVE database flavor of the SCD2 flow, end-to-end —
    *
    *   1. read the `dim_cards_hist` watermark (coalesce to 1900-01-01,
    *      `cards.py:37-47`);
    *   2. incremental extract over JDBC: rows with
    *      `coalesce(update_dt, create_dt) > watermark`
    *      (`cards.py:52-58`), truncate-reloaded into staging (K1);
    *   3. skip-if-no-rows guard (`cards.py:71`);
    *   4. full key snapshot into the delete-staging (`cards.py:73-82`);
    *   5. SCD2 merge with the reference's PER-ROW version clocks: new
    *      keys open at their `create_dt` (`cards.py:98`), changed keys
    *      open at `update_dt` and close their predecessor at
    *      `update_dt − 1 s` (`cards.py:117,126`), deletes are marked
    *      at `runTs` — the pinned stand-in for the reference's `now()`
    *      (`cards.py:154`);
    *   6. watermark advanced to `max(coalesce(update_dt, create_dt))`
    *      over THIS extract's staging (`cards.py:192-196`).
    *
    * Scale notes: the watermark predicate bounds every extract to the
    * changed rows, so per-run JDBC volume scales with the delta, not
    * the source (give `jdbc` partition bounds for a parallel pull);
    * the merge is the same single-pass full-outer+explode as the file
    * dimensions. The full-key snapshot (step 4) is key-only — the one
    * unavoidable full-table touch delete detection needs. */
  def runCards(spark: SparkSession, store: TableStore,
               jdbc: Sources.JdbcSpec, runTs: Timestamp): Unit = {
    val wm = Incremental.readWatermark(meta(store), "stg", "cards")
    def source() = Sources.jdbcReader(spark, jdbc).load().select(
      col("card_num").cast(StringType).as("card_num"),
      col("account").cast(StringType).as("account"),
      col("create_dt").cast(TimestampType).as("create_dt"),
      col("update_dt").cast(TimestampType).as("update_dt"))
    store.overwrite("stg_cards",
      Sources.incremental(source(), "update_dt", "create_dt", wm))
    val staged = store.read("stg_cards")
    if (staged.limit(1).count() > 0) { // A3 guard (cards.py:71)
      store.overwrite("stg_cards_del", source().select("card_num"))
      val batch = staged.select(col("card_num"),
        col("account").as("account_num"), col("create_dt"), col("update_dt"))
      val dim = store.readOr("dim_cards_hist", cardsDimStruct)
      store.swapSnapshot("dim_cards_hist", Scd2.merge(
        dim, batch, keys = Seq("card_num"), tracked = Seq("account_num"),
        batchTs = coalesce(col("update_dt"), col("create_dt")),
        deleteKeys = Some(store.read("stg_cards_del")),
        deleteTs = Some(lit(runTs)),
        passthrough = Seq("create_dt", "update_dt"),
        newTs = Some(col("create_dt"))))
      val newMax = staged
        .agg(max(coalesce(col("update_dt"), col("create_dt")))).first()
      if (!newMax.isNullAt(0))
        store.swapSnapshot("meta_date",
          Incremental.advance(meta(store), "stg", "cards", newMax.getTimestamp(0)))
    }
  }

  /** Report stage (`report.py` analog): as-of join facts to the live
    * dimension version valid at transaction time (J6, strict bounds),
    * one lag window per card (W1), two rule branches UNION ALL'd —
    * blacklisted card active on/after its entry date (P7-style,
    * rule 1) and city hop within one hour (P9, rule 3) — appended,
    * deliberately non-idempotent like the reference. */
  def runReport(spark: SparkSession, store: TableStore,
                reportDt: Timestamp): Unit = {
    val facts = store.readOr("fact_transactions", factStruct)
    val dim = store.readOr("dim_terminals_hist", dimStruct)
    val bl = store.readOr("fact_blacklist", blacklistStruct)
      .select(col("card_num").as("bl_card"), col("entry_dt"))
    val joined = Temporal.asOfJoin(facts, dim,
        factKey = facts("terminal"), dimKey = dim("terminal_id"),
        factTs = facts("transaction_date"))
      .join(bl, facts("card_num") === col("bl_card"), "left")
    // transaction_id tiebreak: equal-timestamp transactions must lag
    // deterministically (retried tasks must re-produce identical rows).
    val w = Window.partitionBy(col("card_num"))
      .orderBy(col("transaction_date"), col("transaction_id"))
    val lagged = joined
      .withColumn("lag_city", lag(col("terminal_city"), 1).over(w))
      .withColumn("gap_us", epochUs(col("transaction_date")) -
        epochUs(lag(col("transaction_date"), 1).over(w)))
    def shape(df: org.apache.spark.sql.DataFrame, rule: Int) = df.select(
      col("transaction_date").as("event_dt"),
      col("card_num"),
      lit(rule).as("rule"),
      col("terminal_city").as("city"),
      col("lag_city").as("prev_city"),
      lit(reportDt).as("report_dt"))
    val r1 = shape(lagged.filter(col("bl_card").isNotNull &&
      col("transaction_date") >= col("entry_dt").cast(TimestampType)), 1)
    val r3 = shape(lagged.filter(
      col("lag_city").isNotNull && col("terminal_city") =!= col("lag_city") &&
        col("gap_us") <= 3600L * 1000000L), 3)
    store.append("rep_fraud", r1.unionByName(r3))
  }

  /** Full run in dependency order (`main.py:47-50`). */
  def run(spark: SparkSession, store: TableStore, srcDir: String,
          reportDt: Timestamp, archive: Boolean = false): Unit = {
    runTransactions(spark, store, srcDir, archive)
    runBlacklist(spark, store, srcDir, archive)
    runTerminals(spark, store, srcDir, archive)
    runReport(spark, store, reportDt)
  }
}
