package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan discipline checks (the properties that decide whether
  * a plan survives a 100× scale-up): predicate pushdown reaching the
  * parquet scan, column pruning in the read schema, bounded-dim
  * broadcasts, all nine report lags in ONE window exec, and no
  * cartesian products anywhere in the declared query set. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q20: shipdate filter is pushed to the parquet scan") {
    val plan = planOf("q20_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n${plan.take(2000)}")
  }

  test("q20: scan reads only the five referenced lineitem columns") {
    val plan = planOf("q20_pricing_summary")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate").forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"column pruning failed: $readSchema")
  }

  test("q10: bounded dims (nation, region) broadcast; no cartesian join") {
    val plan = planOf("q10_star_enrich")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q11: all nine lags evaluate in a single Window exec (one shuffle)") {
    val plan = planOf("q11_window_lags")
    val windowExecs = plan.linesIterator.count(l => l.trim.startsWith("Window ") ||
      l.trim.matches("^[+:\\-\\s]*Window \\[.*"))
    assert(windowExecs === 1, s"expected 1 Window exec, got $windowExecs")
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles === 1, s"expected 1 hash exchange, got $shuffles")
  }

  test("q12: the four fraud rules reuse one window subtree, not four") {
    val plan = planOf("q12_fraud_rules")
    // Catalyst either reuses the exchange or collapses the branches; at
    // minimum the plan must not contain a cartesian or nested-loop join.
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q07: single-pass SCD2 merge bounds dimension scans") {
    // The naive per-leg formulation planned 32 scans of the input; the
    // full-outer+explode merge needs one per logical input slice (the
    // fixture itself derives dim/batch/snapshot from `customer`, so 8
    // is this query's floor). Regressing above that means a merge leg
    // started re-scanning again.
    val scans = planOf("q07_scd2_merge").linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 8, s"q07 scans regressed to $scans")
  }

  test("q98: trained-BPE application is one shuffle-free map pass") {
    // The tokenize path (wrap → replace chain → counts) must stay a
    // pure projection over the scan: tokenizing 100 TB is a map job.
    // (Training runs driver-memoized aggregates BEFORE this plan.)
    val plan = planOf("q98_bpe_tokenize")
    assert(!plan.contains("Exchange"),
      s"BPE apply path shuffles:\n${plan.take(1500)}")
  }

  test("q169: HTML extraction is a shuffle-free map pass; q170 adds one hash agg") {
    // Extraction (wrap → strip → block argmax) must stay a pure
    // projection over the scan: extracting main text from 100 TB of
    // crawl is a map job, never an explode + window.
    val plan = planOf("q169_html_extract")
    assert(!plan.contains("Exchange"),
      s"extraction path shuffles:\n${plan.take(1500)}")
    assert(!plan.contains("Window") && !plan.contains("Generate"),
      s"extraction planned explode/window:\n${plan.take(1500)}")
    // The curation composition adds exactly the dedup's hash exchange.
    val plan170 = planOf("q170_crawl_curate")
    val shuffles = plan170.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles === 1, s"expected 1 hash exchange, got $shuffles")
    assert(plan170.contains("partial_"), "dedup agg lost map-side partial aggregation")
  }

  test("q175/q179: URL canonicalization and span corruption are shuffle-free map passes") {
    // Both are per-row rewrites (regex/array lambdas) over the scan:
    // canonicalizing 10¹² frontier URLs or building corruption pairs
    // for 10¹⁰ documents must plan as a projection — any Exchange,
    // Window, or Generate here multiplies the whole-corpus pass.
    for (q <- Seq("q175_url_canonicalize", "q179_span_corruption")) {
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"$q shuffles:\n${plan.take(1500)}")
      assert(!plan.contains("Window") && !plan.contains("Generate"),
        s"$q planned explode/window:\n${plan.take(1500)}")
    }
  }

  test("q186/q187: quality-filter batteries are shuffle-free map passes") {
    // Gopher repetition signals and C4 line rules run over every byte
    // of the corpus BEFORE any keyed stage — within-doc sort +
    // run-length counting must stay a per-row array expression (one
    // projection), never an explode + groupBy or a window.
    for (q <- Seq("q186_gopher_quality", "q187_c4_line_filters")) {
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"$q shuffles:\n${plan.take(1500)}")
      assert(!plan.contains("Window") && !plan.contains("Generate"),
        s"$q planned explode/window:\n${plan.take(1500)}")
    }
  }

  test("q188: bloom word table broadcasts; no cartesian anywhere in the routing") {
    // The (widx, bits) table is bounded by m/32 rows — it must enter
    // the probe as a broadcast, and the two-path union must stay
    // equi-joined (a cartesian here would scan seen × batch).
    val plan = planOf("q188_bloom_ingest_dedup")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q190: conversation assembly rides ONE key shuffle") {
    // Sessionize's window partitions by user_id; the collect_list
    // aggregate's (user_id, session_seq) clustering is satisfied by
    // that same hash partitioning — a second exchange means the
    // aggregate stopped reusing it and every conversation re-shuffles.
    val plan = planOf("q190_sft_render")
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles === 1, s"expected 1 hash exchange, got $shuffles:\n${plan.take(2000)}")
  }

  test("q196: the funnel is a map pass + aggregates — no window, no explode") {
    val plan = planOf("q196_curation_funnel")
    assert(!plan.contains("Window") && !plan.contains("Generate"),
      s"funnel planned explode/window:\n${plan.take(1500)}")
    assert(plan.contains("partial_"), "funnel agg lost map-side partials")
  }

  test("q177: cluster representative is a hash-agg argmax, never a per-cluster window sort") {
    // max(struct(...)) partial-aggregates map-side: a 10⁹-member
    // cluster contributes one candidate row per partition to the
    // shuffle. A row_number window would sort every cluster.
    val plan = planOf("q177_cluster_representatives")
    assert(!plan.contains("Window"),
      s"representative pick planned a window sort:\n${plan.take(1500)}")
    assert(plan.contains("partial_"),
      "argmax lost map-side partial aggregation")
  }

  test("q97/q102: image phash pairing is banded hash joins, never nested-loop") {
    // Both containers (BMP and PNG) must plan the identical pairing
    // shape — the codec seam is upstream of the join.
    Seq("q97_image_phash_neardup", "q102_image_phash_png").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$name:\n${plan.take(1500)}")
    }
  }

  test("q112: shard positions never plan a single global sort partition") {
    // The operator's 100 TB claim: positions come from per-bucket
    // windows + bounded offsets. A global row_number would appear as
    // a range-partitioned exchange into one window — the exact shape
    // the two-phase decomposition exists to avoid.
    val plan = planOf("q112_shard_assignment")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"q112 plans a global sort:\n${plan.take(1500)}")
  }

  test("q117: rank normalization never plans a stratum-global sort") {
    // Same claim as q112, generalized to VALUE order: ranks come from
    // per-(stratum, bucket) windows + bounded offsets; a naive
    // percent_rank would range-partition each whole stratum into one
    // window partition.
    val plan = planOf("q117_rank_normalize")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"q117 plans a global sort:\n${plan.take(1500)}")
  }

  test("q111: the bigram-count join is salted (no hot-bigram straggler key)") {
    // The count join must carry the 16-way salt column: a corpus-common
    // bigram is a hot key BY CONSTRUCTION, and an unsalted join puts
    // all its doc rows on one task.
    val plan = planOf("q111_bigram_lm_score")
    assert(plan.contains("__salt"),
      s"q111 count join lost its salt:\n${plan.take(1500)}")
  }

  test("q205: incremental semantic probe is cell-keyed — no unkeyed join") {
    // The batch×corpus probe must join on cid (work = |batch| × cell
    // occupancy, constant under auto-k) — an unkeyed spelling would
    // plan batch × corpus and be quadratic at ingest scale.
    val plan = planOf("q205_semantic_dedup_incremental")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q205 plans an unkeyed join:\n${plan.take(1500)}")
  }

  test("q90: the IVF-PQ probe is cell-keyed — no unkeyed join") {
    // q90's scale claim after the auto-k swap: ADC candidates come
    // from a cid-keyed join of queries against the auto-k cell index
    // (per-query work = cell occupancy, ~constant), never a
    // corpus-wide pairing.
    val plan = planOf("q90_ivf_pq")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q90 plans an unkeyed join:\n${plan.take(1500)}")
  }

  test("no declared query plans a cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      planOf(name).contains("CartesianProduct")
    }
    // Since the centroid assignment became a literal-array fold, even
    // q41 is join-keyed: NOTHING may plan a cartesian.
    assert(offenders.isEmpty, s"cartesians in: $offenders")
  }

  test("pipeline report: one WindowExec, no cartesian, across the 6-input star") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(c: String) = to_timestamp(col(c))
    val facts = Seq(("1", "2024-01-01 10:00:00", BigDecimal("1.00"), "C1",
      "PAYMENT", "SUCCESS", "T1"))
      .toDF("transaction_id", "transaction_date", "amount", "card_num",
        "oper_type", "oper_result", "terminal")
      .withColumn("transaction_date", ts("transaction_date"))
    def dim(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("effective_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("effective_to", to_timestamp(lit("9999-12-31 00:00:00")))
      .withColumn("deleted_flg", lit("N"))
    val ter = dim(Seq(("T1", "ATM", "Moscow"))
      .toDF("terminal_id", "terminal_type", "terminal_city"))
    val cards = dim(Seq(("C1", "A1")).toDF("card_num", "account_num"))
    val accounts = dim(Seq(("A1", "2024-12-31", "CL1"))
      .toDF("account_num", "valid_to", "client"))
    val clients = dim(Seq(("CL1", "L", "F", "P", "1980-01-01", "P1", "2025-12-31", "7"))
      .toDF("client_id", "last_name", "first_name", "patronymic",
        "date_of_birth", "passport_num", "passport_valid_to", "phone"))
    val bl = Seq(("P9", "2024-01-01")).toDF("passport_num", "entry_dt")
      .withColumn("entry_dt", col("entry_dt").cast("date"))
    val plan = graft.ops.Pipeline.reportFrame(facts, ter, cards, accounts,
        clients, bl, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      .queryExecution.executedPlan.toString
    // All nine lags and all four rule branches must share ONE window
    // (the reference computes lg once) and every join must be keyed.
    val windowExecs = plan.linesIterator.count(l => l.trim.startsWith("Window ") ||
      l.trim.matches("^[+:\\-\\s]*Window \\[.*"))
    assert(windowExecs === 1, s"expected 1 Window exec, got $windowExecs")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("q78: range join plans as an equi join on the bucket id, never a nested loop") {
    // A pure range predicate with no equi key would plan a
    // BroadcastNestedLoopJoin — O(points × intervals). The bucketed
    // rewrite must surface as a HASH-KEYED join (bucket equi key, range
    // residual inside), which is the only shape that survives 100 TB.
    val plan = planOf("q78_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a quadratic plan:\n${plan.take(2000)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("q87: interval overlap plans as a bucket equi join, never a nested loop") {
    val plan = planOf("q87_interval_overlap")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join fell back to a quadratic plan:\n${plan.take(2000)}")
  }

  test("q79: span dedup aggregates with map-side partial aggregation") {
    // The exploded span stream must collapse BEFORE the shuffle:
    // HashAggregate(partial) under the exchange, final above — the
    // only shape where the wire carries distinct spans, not every
    // token window of the corpus.
    val plan = planOf("q79_span_dedup")
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregates:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q84: the bloom prune filters the fact scan stage below the exact semi join") {
    // The sketch is a plan literal probed by might_contain INSIDE the
    // fact's scan stage; the exact semi join above it then shuffles/
    // broadcasts only the pruned stream. At 100 TB the prune is the
    // difference between shuffling the fact table and shuffling its
    // matching slice.
    val plan = planOf("q84_bloom_semijoin")
    assert(plan.contains("might_contain"), s"no bloom prune:\n${plan.take(2000)}")
    val pruneLine = plan.linesIterator.indexWhere(_.contains("might_contain"))
    val joinLine = plan.linesIterator.indexWhere(_.contains("Join"))
    assert(joinLine >= 0 && pruneLine > joinLine,
      "prune should sit under (print below) the join")
  }

  test("q72: JSON extraction prunes the scan to the referenced columns") {
    // JSON fields are opaque to parquet (the filter on an extracted
    // field CANNOT push into the footer — it evaluates post-scan,
    // inside codegen), but COLUMN pruning must still hold: the scan
    // reads event_id/user_id/props and nothing else.
    val plan = planOf("q72_json_props")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("event_id", "user_id", "props").forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("event_type") && !readSchema.contains("value"),
      s"column pruning failed: $readSchema")
  }

  test("q75: funnel is a window-free aggregate chain with pushed step filters") {
    // The conditional-min chain must not plan a WindowExec (a
    // sort-the-world funnel) and each step's event_type filter must
    // reach the parquet scan — at 100 TB the three steps read three
    // pushdown-pruned slices, never the full stream three times.
    val plan = planOf("q75_funnel")
    assert(!plan.contains("WindowExec"), "funnel planned a window sort")
    assert(plan.contains("EqualTo(event_type,view"), plan.take(2000))
    assert(plan.contains("EqualTo(event_type,click"), plan.take(2000))
    assert(plan.contains("EqualTo(event_type,purchase"), plan.take(2000))
  }

  test("q60: eval shingle set joins as a broadcast (corpus never shuffles for the probe)") {
    val plan = planOf("q60_contamination")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"eval probe degraded to a shuffle join:\n${plan.take(2000)}")
  }

  test("q62/q63/q101: one prefix-sum window, one hash exchange each") {
    // q101 swaps the whitespace count for the trained-BPE count — a
    // pure map expression, so the TRAINED budget query must plan
    // exactly the shape of the untrained one: the swap may not buy a
    // shuffle.
    Seq("q62_seq_packing", "q63_token_budget", "q101_bpe_token_budget")
      .foreach { name =>
        val plan = planOf(name)
        val windows = plan.linesIterator.count(l => l.trim.startsWith("Window ") ||
          l.trim.matches("^[+:\\-\\s]*Window \\[.*"))
        assert(windows === 1, s"$name: expected 1 Window exec, got $windows")
        val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
        assert(shuffles === 1, s"$name: expected 1 hash exchange, got $shuffles")
      }
  }

  test("q41: centroid assignment subtree plans no exchange at all") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.ops.Similarity
      .assignCells(e, e.filter(col("vec_id") % 37 === 1))
      .queryExecution.executedPlan.toString
    // The nearest-centroid argmax must stay map-side: one scan, one
    // project/filter, no join, no window, no shuffle of any kind.
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n${plan.take(2000)}")
    assert(!plan.contains("Window"), plan.take(1000))
    assert(!plan.contains("Join"), plan.take(1000))
  }

  test("q130: the rank recurrence never plans a cartesian product") {
    // The teleport/seed terms ride broadcast 1-row count frames
    // (BroadcastNestedLoopJoin over one row — the q22 discipline);
    // a CartesianProduct anywhere means a rank/edge join lost its
    // equi-keys and the iteration would be |V|²·iters at scale.
    val plan = planOf("q130_domain_rank")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q132: term selection is TakeOrdered, never a vocabulary-wide sort") {
    // The TakeOrdered itself now runs inside boundedRowNumber's eager
    // pin (the 24-row selection materializes before this plan), so
    // the visible plan must simply carry no range exchange: the only
    // windows run per (term, shard) and per term over ≤ 320
    // survivors. The selection subtree is pinned separately below.
    val plan = planOf("q132_bm25_topk")
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
    val sel = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .groupBy("w").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc).limit(24)
      .queryExecution.executedPlan.toString
    assert(sel.contains("TakeOrderedAndProject"), sel.take(1500))
  }

  test("q133: per-language perplexity ranking never plans a stratum-global sort") {
    val plan = planOf("q133_ccnet_buckets")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"q133 plans a global sort:\n${plan.take(1500)}")
  }

  test("q68: k-means final assignment is likewise exchange-free") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = graft.ops.Similarity.kmeansCentroids(e, k = 8, iters = 2)
    // Re-assigning against a trained codebook (what every IVF consumer
    // does per batch) must be the same shuffle-free literal-codebook
    // fold as assignCells: the training shuffles (k×dim aggregates)
    // are paid once in kmeansCentroids, never per assignment scan.
    val plan = graft.ops.Similarity.kmeansFit(e, k = 8, iters = 2)
      .queryExecution.executedPlan.toString
    assert(cents.length === 8)
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n${plan.take(2000)}")
    assert(!plan.contains("Join"), plan.take(1000))
  }

  test("q151/q156: the posting match is a broadcast probe (corpus never shuffles for it)") {
    // The bounded query-term table must broadcast onto the tf index;
    // a SortMergeJoin there would shuffle the 100 TB posting side to
    // look up ≤ 20 terms.
    for (q <- Seq("q151_bm25_retrieval", "q156_hybrid_retrieval")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"), q)
    }
  }

  test("q148/q149: winnow probes read the persisted index, no nested loops") {
    // Both sides of the contamination/incremental joins are parquet
    // reads of the print table — the md5 winnow lineage must never
    // appear in the per-query plan (it was the r10 DNF).
    for (q <- Seq("q148_winnow_decontaminate", "q149_winnowing_incremental")) {
      val plan = planOf(q)
      assert(!plan.contains("md5"), s"$q recomputes the winnow lineage")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q159: both LM count joins salted; q160 reads persisted fingerprints only") {
    // q159 joins the bigram index against the corpus-count AND
    // prefix-count tables — both keys are hot by construction
    // (stopword bigrams / stopword prefixes), both joins must carry
    // the salt column (the q111 pin, doubled).
    val p159 = planOf("q159_float_perplexity")
    assert(p159.contains("__salt"), s"q159 lost its salts:\n${p159.take(1500)}")
    // q160's per-query plan is two fingerprint-index parquet reads and
    // a join — the encode/decode mapPartitions pass lives in the index
    // BUILD, never in the declared plan (the q148 discipline for the
    // audio family).
    val p160 = planOf("q160_audio_fp_mdct")
    assert(!p160.contains("SerializeFromObject"),
      s"q160 re-runs the codec pass:\n${p160.take(1500)}")
    assert(!p160.contains("CartesianProduct") &&
      !p160.contains("BroadcastNestedLoopJoin"), p160.take(1500))
  }

  test("q162: bucket stats broadcast onto the feature frame; q163 reads persisted indexes only") {
    // q162's scoring join must BROADCAST the ≤4096-row bucket-stats
    // table onto the per-doc feature frame — a SortMergeJoin there
    // would shuffle the corpus on the feature key to look up 4096
    // rows. (The per-doc frame itself is a localCheckpoint, so the
    // bigram-index lineage never re-plans per consumer.)
    val p162 = planOf("q162_dsir_select")
    assert(p162.contains("BroadcastHashJoin"), s"q162:\n${p162.take(1500)}")
    assert(!p162.contains("CartesianProduct"), p162.take(1000))
    // q163's per-query plan joins the exact-phash pair frame with two
    // reads of the persisted seq index — the AVI encode/decode pass
    // lives in the index BUILD, never in the declared plan.
    val p163 = planOf("q163_video_temporal_neardup")
    assert(!p163.contains("SerializeFromObject"),
      s"q163 re-runs the codec pass:\n${p163.take(1500)}")
    assert(!p163.contains("CartesianProduct") &&
      !p163.contains("BroadcastNestedLoopJoin"), p163.take(1000))
  }

  test("q164/q165: allocation is metadata-grain; quota joins broadcast") {
    // q164's only corpus-sized work is the per-source token aggregate;
    // the water-fill runs over the stratum-grain checkpoint (1-row
    // parameter frames broadcast back — BroadcastNestedLoopJoin over
    // single-row frames is the sanctioned crossJoin shape, never a
    // CartesianProduct).
    val p164 = planOf("q164_token_allocation")
    assert(!p164.contains("CartesianProduct"), p164.take(1500))
    // q165: the per-source quota and the bounded bucket-offset frames
    // must broadcast onto the ranked corpus frame — a SortMergeJoin
    // on `source` there would shuffle the corpus to look up
    // stratum-grain rows.
    val p165 = planOf("q165_quota_fill")
    assert(p165.contains("BroadcastHashJoin"), s"q165:\n${p165.take(1500)}")
    assert(!p165.contains("CartesianProduct"), p165.take(1500))
  }

  test("q167: incremental scoring is a broadcast probe of base stats") {
    // The production claim: a new batch never re-aggregates the
    // corpus — batch feature rows probe the ≤4096-row base stats by
    // broadcast, and the selection boundary arrives as a broadcast
    // 1-row frame (the sanctioned crossJoin shape). A SortMergeJoin
    // on the feature key would shuffle the batch to look up 4096
    // rows.
    val p167 = planOf("q167_dsir_incremental")
    assert(p167.contains("BroadcastHashJoin"), s"q167:\n${p167.take(1500)}")
    assert(!p167.contains("CartesianProduct"), p167.take(1500))
  }

  test("q150: feature extraction partial-aggregates; predict is a checkpoint-fed map") {
    // The declared plan reads the pinned feature frame (training
    // happened in thresholdFit's own jobs), so pin the two halves
    // separately: the bucket-feature aggregate must partial-aggregate
    // (map-side combine — B+2 longs per doc regardless of
    // vocabulary), and the visible predict plan must be a pure map
    // over the checkpoint with no join or exchange.
    val tf = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "explode(split(text, ' ')) AS w")
      .groupBy("doc_id", "w")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("tf"))
    val feats = graft.ops.Classify.bucketFeatures(tf, "doc_id")
      .queryExecution.executedPlan.toString
    assert(feats.contains("partial_"), feats.take(2000))
    val plan = planOf("q150_linear_quality")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      plan.take(1500))
  }

  test("q217: weighted-sample selection is TakeOrdered, never a global sort") {
    // The k-smallest-priority selection must plan as a distributed
    // partial top-k (map-side TakeOrdered), not a rangepartitioned
    // corpus sort — at 100 TB the difference is k rows per task vs a
    // full shuffle; the bounded 200-row rank rides the q58 array
    // spelling, so no WindowExec either.
    val plan = planOf("q217_weighted_priority_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
    assert(!plan.contains("WindowExec"), plan.take(2000))
  }

  test("q214/q215: the KMV family scans the persisted type table, not the corpus") {
    // Spark has no subtree CSE: inline, every plan branch (sketch,
    // exact counts, both exact-overlap self-join sides) re-ran the
    // corpus explode + distinct — measured as q215's sf0.1 watchdog
    // timeout. The fix is structural, so pin it: every branch must
    // read the source_shingles registry table, and the corpus file
    // must appear in NO scan.
    Seq("q214_kmv_distinct_by_source", "q215_kmv_set_overlap").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("source_shingles"),
        s"$q does not scan the persisted index:\n${plan.take(1500)}")
      assert(!plan.contains("documents.parquet"),
        s"$q re-scans the corpus:\n${plan.take(1500)}")
    }
  }
}
