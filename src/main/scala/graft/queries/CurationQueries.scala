package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.{Graph, Skew}

/** Corpus-curation operators above the document level: source/domain
  * authority scoring over a content-citation graph, retrieval-style
  * ranking, dataset reporting, and distribution monitoring — the
  * steps that decide WHICH documents a 100 TB pretraining corpus
  * keeps, ranked, and reported, after the dedup/similarity families
  * have labeled it.
  *
  * Oracle discipline is the house standard: every query's arithmetic
  * is integer-exact (scaled `div`, order statistics, counts) so the
  * DuckDB replay matches bit-for-bit, including iterative
  * computations, which the oracles unroll as generated CTE chains
  * (the k-means/BPE discipline applied to graph power iteration).
  */
object CurationQueries {
  import LlmQueries.{h64, shingleCtes}

  /** Power-iteration count for q130 — interpolated into the oracle's
    * unrolled CTE chain and passed to [[Graph.pageRank]], so the two
    * sides cannot drift. */
  private[queries] val PrIters = 6

  /** The day-grain drift derivation shared by q136 (batch counts) and
    * q137 (streaming running counts): dense type×day grid (bounded),
    * trailing-7-day RANGE frame over the integer day index, per-day
    * integer L1 distance in ppm, flag at 200k ppm. One definition —
    * the batch and streaming formulations cannot drift. */
  private def driftFromDailyCounts(dc: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val days = dc.select("day").distinct()
    val ets = dc.select("et").distinct()
    val grid = days.crossJoin(broadcast(ets))
      .join(dc, Seq("day", "et"), "left")
      .select(col("day"), col("et"),
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("di"),
        coalesce(col("n"), lit(0L)).as("n"))
    val frame = Window.partitionBy(col("et")).orderBy(col("di"))
      .rangeBetween(-7, -1)
    val w = grid.select(col("day"), col("et"), col("n"),
      coalesce(sum(col("n")).over(frame), lit(0L)).as("bn"))
    val tot = w.groupBy("day")
      .agg(sum(col("n")).as("t"), sum(col("bn")).as("bt"))
    val l1 = w.join(tot, "day")
      .filter(col("bt") > 0 && col("t") > 0)
      .groupBy("day")
      .agg(sum(abs(expr("(n * 1000000) div t - (bn * 1000000) div bt")))
        .as("drift"))
    l1.join(tot, "day")
      .select(col("day"), col("t").as("n_events"),
        col("drift").as("drift_ppm"),
        (col("drift") > 200000).cast("int").as("drifted"))
  }

  /** q136/q137's shared oracle — the batch drift formulation. A green
    * q137 row proves the streaming running counts fold to exactly the
    * batch answer whatever the trigger boundaries were. */
  private val DriftOracle =
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type AS et FROM events),
      |dc AS (SELECT day, et, count(*) AS n FROM e GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM e),
      |ets AS (SELECT DISTINCT et FROM e),
      |grid AS (SELECT d.day, t.et,
      |           datediff('day', DATE '1970-01-01', d.day) AS di,
      |           coalesce(dc.n, 0) AS n
      |         FROM days d CROSS JOIN ets t
      |         LEFT JOIN dc ON dc.day = d.day AND dc.et = t.et),
      |w AS (SELECT day, et, n,
      |        coalesce(sum(n) OVER (PARTITION BY et ORDER BY di
      |          RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS bn
      |      FROM grid),
      |tot AS (SELECT day, sum(n) AS t, sum(bn) AS bt FROM w GROUP BY day),
      |l1 AS (SELECT w.day,
      |         sum(abs((w.n * 1000000) // tot.t - (w.bn * 1000000) // tot.bt)) AS drift
      |       FROM w JOIN tot ON w.day = tot.day
      |       WHERE tot.bt > 0 AND tot.t > 0 GROUP BY w.day)
      |SELECT l1.day, CAST(tot.t AS BIGINT) AS n_events,
      |       CAST(drift AS BIGINT) AS drift_ppm,
      |       CAST(drift > 200000 AS INT) AS drifted
      |FROM l1 JOIN tot ON l1.day = tot.day""".stripMargin


  /** CCNet oracle CTE chain ending at `rk(doc_id, lang, score_milli,
    * rnk, n)` — shared by q133 and the curation composition (q145). */
  private val ccnetCtes =
    """bgr AS (
      |  SELECT doc_id, words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT)+1] AS bg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |       unnest(generate_series(1, len(words)-1)) AS g(i)),
      |bf AS (SELECT doc_id, bg, count(*) AS tf FROM bgr GROUP BY 1, 2),
      |cnt AS (SELECT bg, sum(tf) AS c FROM bf GROUP BY bg),
      |sc AS (
      |  SELECT bf.doc_id, sum(bf.tf) AS n_bigrams,
      |         sum(length(bin(cnt.c)) * bf.tf) AS lm
      |  FROM bf JOIN cnt USING (bg) GROUP BY 1),
      |scm AS (SELECT d.doc_id, d.lang,
      |          (sc.lm * 1000) // sc.n_bigrams AS score_milli
      |        FROM documents d JOIN sc ON sc.doc_id = d.doc_id),
      |rk AS (SELECT *,
      |         row_number() OVER (PARTITION BY lang
      |           ORDER BY score_milli, doc_id) - 1 AS rnk,
      |         count(*) OVER (PARTITION BY lang) AS n
      |       FROM scm)""".stripMargin

  /** The Spark CCNet chain shared by q133/q145 — (doc_id, lang,
    * score_milli, bucket). Scores ride the persisted bigram index;
    * ranks come from rankNormalize's two-phase decomposition. */
  private def ccnetBuckets(s: org.apache.spark.sql.SparkSession,
                           d: String): org.apache.spark.sql.DataFrame = {
    val bf = Indexes.bigramFrequencies(s, d)
    val cnt = bf.groupBy("bg").agg(sum(col("tf")).as("c"))
    // Blanket salt kept deliberately: the hot-key variant's detection
    // pass measured SLOWER here (r15 sf10 A/B: q133 10.7 → 13.6 s,
    // q145 15.6 → 18.0 s) — see LmScore.bigramNll's note.
    val lm = Skew.saltedJoin(bf, cnt, "bg",
        saltBy = col("doc_id"), salts = 16)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(length(bin(col("c"))).cast("long") * col("tf")).as("lm"))
    val scm = table(s, d, "documents").select("doc_id", "lang")
      .join(lm, "doc_id")
      .select(col("doc_id"), col("lang"),
        expr("(lm * 1000) div n_bigrams").as("score_milli"))
    val ranked = graft.ops.Sampling.rankNormalize(
      scm, "lang", "doc_id", col("score_milli"))
    val n = scm.groupBy("lang").agg(count(lit(1)).as("n"))
    ranked.join(broadcast(n), "lang")
      .select(col("doc_id"), col("lang"),
        col("score").as("score_milli"),
        when(expr("(3 * rnk) div n") === 0, "head")
          .when(expr("(3 * rnk) div n") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** The rank-derived per-source keep-rate table shared by q138/q145 —
    * (source, rate_ppm): rank normalized by the uniform seed at a
    * 50 % center, capped at 1. */
  private def rankRates(s: org.apache.spark.sql.SparkSession,
                        d: String): org.apache.spark.sql.DataFrame = {
    val nn = table(s, d, "documents").select("source").distinct()
      .agg(count(lit(1)).as("__n"))
    domainRank(s, d).crossJoin(broadcast(nn))
      .select(col("source"),
        least(lit(1000000L),
          expr(s"(rank_scaled * 500000) div (${Graph.Scale} div __n)"))
          .as("rate_ppm"))
  }

  /** The oracle's unrolled PageRank iterations r1..r`n` over CTEs
    * `srcs(v)` / `nn(n)` / `tp(t)` / `e2(u, v, p)` — the exact
    * integer recurrence of [[Graph.pageRank]]. */
  private def prIterCtes(n: Int): String = (0 until n).map { k =>
    s"""r${k + 1} AS (
       |  SELECT s.v, (SELECT t FROM tp) + coalesce(m.m, 0) AS r
       |  FROM srcs s LEFT JOIN (
       |    SELECT e2.v, sum((85 * r$k.r * e2.p) // ${100L * Graph.PpmScale}) AS m
       |    FROM e2 JOIN r$k ON e2.u = r$k.v GROUP BY e2.v) m ON m.v = s.v)""".stripMargin
  }.mkString(",\n")

  /** The citation-attribution half of the rank chains: shingling →
    * first-occurrence attribution → ppm transition weights, ending
    * at `e2(u, v, p)` with `srcs(v)` / `nn(n)` in scope — shared by
    * the uniform-teleport chain ([[domainRankCtes]]) and the
    * seed-teleport chain (q158). */
  private def attributionCtes: String =
    s"""corpus AS (SELECT doc_id, text FROM documents),
       |$shingleCtes,
       |ex AS (SELECT h.doc_id, d.source, unnest(h.hs) AS hh
       |       FROM hst h JOIN documents d ON h.doc_id = d.doc_id),
       |org AS (SELECT hh, min(doc_id) AS odoc FROM ex GROUP BY hh),
       |osrc AS (SELECT o.hh, o.odoc, d.source AS vsrc
       |         FROM org o JOIN documents d ON d.doc_id = o.odoc),
       |att AS (SELECT e.source AS u, s.vsrc AS v, count(*) AS w
       |        FROM ex e JOIN osrc s ON e.hh = s.hh
       |        WHERE e.doc_id <> s.odoc AND e.source <> s.vsrc
       |        GROUP BY 1, 2),
       |srcs AS (SELECT DISTINCT source AS v FROM documents),
       |nn AS (SELECT count(*) AS n FROM srcs),
       |ow AS (SELECT u, sum(w) AS tw FROM att GROUP BY u),
       |e2 AS (SELECT a.u, a.v, (a.w * ${Graph.PpmScale}) // o.tw AS p
       |       FROM att a JOIN ow o ON a.u = o.u)""".stripMargin

  /** The full domain-rank oracle chain (attribution + [[PrIters]]
    * unrolled uniform-teleport iterations), ending at CTE
    * `r$PrIters(v, r)` — shared by q130 (the ranks themselves) and
    * q138 (ranks composed into sampling), so the replays cannot
    * drift. */
  private def domainRankCtes: String =
    s"""$attributionCtes,
       |tp AS (SELECT (15 * (${Graph.Scale} // n)) // 100 AS t FROM nn),
       |r0 AS (SELECT v, (SELECT ${Graph.Scale} // n FROM nn) AS r FROM srcs),
       |${prIterCtes(PrIters)}""".stripMargin

  /** Seed-teleport iteration CTEs (t0..t`n`) — the exact integer
    * recurrence of [[Graph.personalizedPageRank]] over `seeds(v)` /
    * `nsd(n)` / `tps(t)` / `e2`. */
  private def seedIterCtes(n: Int): String = (0 until n).map { k =>
    s"""t${k + 1} AS (
       |  SELECT s.v,
       |    (CASE WHEN s.v IN (SELECT v FROM seeds)
       |          THEN (SELECT t FROM tps) ELSE 0 END) + coalesce(m.m, 0) AS r
       |  FROM srcs s LEFT JOIN (
       |    SELECT e2.v, sum((85 * t$k.r * e2.p) // ${100L * Graph.PpmScale}) AS m
       |    FROM e2 JOIN t$k ON e2.u = t$k.v GROUP BY e2.v) m ON m.v = s.v)""".stripMargin
  }.mkString(",\n")

  /** The Spark domain-rank chain shared by q130/q138 — returns
    * (source, rank_scaled). The oracle's `e.doc_id <> s.odoc` guard is
    * IMPLIED by `e.source <> s.vsrc` (the origin doc's source IS
    * vsrc), so this side carries only the source inequality — the
    * green rows machine-prove the simplification. The exploded index
    * appears in both the origin aggregate and the attribution join;
    * the subtrees canonicalize identically, so ReuseExchange runs the
    * explode+shuffle once. Origin source comes from the narrow
    * documents projection (2 columns — broadcast-sized at the gate
    * SFs, a plain narrow join at web scale), never a second pass over
    * the exploded index. */
  /** Persisted-registry read of the domain ranks — built once per
    * corpus generation ([[Indexes.domainRanks]]), read by every
    * consumer (q130, and through [[rankRates]] q138/q145/q153): the
    * rank table is 2 narrow columns × |sources|, and recomputing the
    * attribution join + 6 power iterations per consumer was the
    * dominant cost of the whole curation family (measured 4.4 s of
    * q130's 4.4 s and ~4 s of each composition at sf0.1). */
  private def domainRank(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame =
    Indexes.domainRanks(s, d)

  /** The citation edge frame (u cites v): per-shingle earliest-doc
    * attribution over the persisted shingle index, salted against
    * boilerplate keys, aggregated to source grain and pinned
    * (bounded at |sources|²; consumed by two subtrees of every rank
    * recurrence — out-weights and transitions). */
  private def citationEdges(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame = {
    val ex = Indexes.shingles(s, d)
      .select(col("doc_id"), col("source"), explode(col("__hs")).as("h"))
    val org = ex.groupBy("h").agg(min(col("doc_id")).as("odoc"))
    val osrc = org.join(
      table(s, d, "documents")
        .select(col("doc_id").as("odoc"), col("source").as("vsrc")),
      Seq("odoc"))
    Skew.saltedJoinHot(ex, osrc.select("h", "vsrc"), "h",
        saltBy = col("doc_id"), salts = 16,
        hotCap = graft.ops.Dedup.DefaultHotShingleCap)
      .filter(col("source") =!= col("vsrc"))
      .select(col("source").as("u"), col("vsrc").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
  }

  /** The raw rank computation behind [[Indexes.domainRanks]]'s build. */
  private[queries] def domainRankCompute(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val nodes = table(s, d, "documents").select("source").distinct()
    Graph.pageRank(citationEdges(s, d), nodes, "source", PrIters)
      .select(col("v").as("source"), col("r").as("rank_scaled"))
  }

  /** The seed-teleport (TrustRank) computation behind
    * [[Indexes.trustedRanks]]'s build: teleport mass lands only on
    * the two lexicographically-smallest sources — the harness's
    * deterministic stand-in for a vetted allowlist. */
  private[queries] def trustedRankCompute(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val nodes = table(s, d, "documents").select("source").distinct()
    val seeds = nodes.orderBy("source").limit(2)
    Graph.personalizedPageRank(citationEdges(s, d), nodes, "source",
        seeds, PrIters)
      .select(col("v").as("source"), col("r").as("trust_scaled"))
  }

  /** Winnowed-fingerprint oracle chain ending in `keep` (doc_id, h):
    * positional trigram hashes → 8-window minima by value → the
    * df ≤ 50 boilerplate cap. ONE spec for the selection + cap,
    * shared by q146 (all-pairs), q148 (decontamination), and q149
    * (incremental) — the audioFpCtes discipline for the winnow
    * family. Mirrors [[graft.ops.Dedup.winnowSelect]] and the
    * [[Indexes.winnowedPrints]] build exactly. `p` prefixes every
    * CTE name so the chain composes with other tokenizing chains
    * (the v5 oracle carries three) in one WITH clause. */
  private def winnowCtes(p: String = ""): String =
    s"""${p}tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
       |${p}ph AS (SELECT doc_id, list_transform(range(1, len(ws)-1),
       |         i -> ${h64("ws[i]||' '||ws[i+1]||' '||ws[i+2]")}) AS hs
       |       FROM ${p}tok WHERE len(ws) >= 3),
       |${p}win AS (SELECT doc_id,
       |          CASE WHEN len(hs) >= 8
       |               THEN list_distinct(list_transform(range(1, len(hs)-6),
       |                      i -> list_min(hs[i:i+7])))
       |               ELSE [list_min(hs)] END AS fps
       |        FROM ${p}ph),
       |${p}wf AS (SELECT doc_id, unnest(fps) AS h FROM ${p}win),
       |${p}dfc AS (SELECT h, count(*) AS c FROM ${p}wf GROUP BY h),
       |${p}keep AS (SELECT wf.doc_id, wf.h FROM ${p}wf wf JOIN ${p}dfc dfc USING (h)
       |         WHERE dfc.c <= 50)""".stripMargin

  /** The df-capped winnowed print frame (doc_id, `__h`) — the
    * PERSISTED winnow index with boilerplate prints (df > 50)
    * dropped. Boilerplate keys are bounded like the hot-bucket sets
    * (≤ |prints|/50, in practice the handful of corpus-wide stock
    * phrases), so the anti side broadcasts; the cap also BOUNDS
    * every downstream print join at ≤ 50×50 pair rows per key — the
    * skew guard of the whole winnow family. */
  private def winnowKept(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val wf = Indexes.winnowedPrints(s, d, window = 8)
      .select(col("doc_id"), col("__fp").as("__h"))
    val hot = wf.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 50).select("__h")
    wf.join(broadcast(hot), Seq("__h"), "left_anti")
  }

  /** q151's full oracle chain up to `rk(qid, doc_id, n_terms, score,
    * rnk)` — the multi-term BM25 scoring; shared with the hybrid
    * rerank (q156) so the lexical half cannot drift. */
  private def bm25Ctes: String =
    """tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      |stats AS (SELECT count(*) AS nd,
      |                 (sum(dl) * 1000) // count(*) AS a FROM dl),
      |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |qd AS (SELECT doc_id AS qid, string_split(text,' ') AS ws
      |       FROM documents WHERE doc_id % 13 = 0
      |       ORDER BY doc_id LIMIT 5),
      |qt AS (SELECT DISTINCT qid, ws[CAST(i AS INT)] AS w
      |       FROM qd, unnest(generate_series(1, least(4, len(ws)))) AS g(i)
      |       WHERE ws[CAST(i AS INT)] <> ''),
      |ts AS (SELECT qt.qid, tf.doc_id,
      |         ((((stats.nd - dfr.df) * 2000 + 1000) // (2 * dfr.df + 1))
      |          * ((22 * stats.a * least(tf.tf, 1000) * 1000000)
      |             // (10 * stats.a * least(tf.tf, 1000) + 3 * stats.a
      |                 + 9000 * dl.dl))) // 1000 AS tscore
      |       FROM tf JOIN qt ON tf.w = qt.w
      |       JOIN dfr ON dfr.w = tf.w
      |       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats),
      |sc AS (SELECT qid, doc_id, count(*) AS n_terms, sum(tscore) AS score
      |       FROM ts GROUP BY qid, doc_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
      |                   ORDER BY score DESC, doc_id) AS rnk FROM sc)""".stripMargin

  /** q151's Spark chain: multi-term BM25 over the inverted index,
    * top-10 per query via the two-phase shard/final rank — shared
    * with the hybrid rerank (q156). Returns (qid, doc_id, n_terms,
    * score_scaled, rnk ≤ 10). */
  private def bm25TopK(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Indexes.termFrequencies(s, d)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"),
      expr("(sum(dl) * 1000) div count(1)").as("a"))
    val qterms = table(s, d, "documents")
      .filter(col("doc_id") % 13 === 0)
      .orderBy("doc_id").limit(5)
      .select(col("doc_id").as("qid"),
        explode(slice(split(col("text"), " "), 1, 4)).as("w"))
      .filter(col("w") =!= "").distinct()
    // The broadcast match filters the index to the query terms'
    // postings FIRST; their document frequencies then come from the
    // matched postings themselves (df(w) = posting count) — never a
    // vocabulary-wide df aggregate just to look up ≤ 20 terms.
    val post = tf.join(broadcast(qterms), "w")
    // distinct first: a term shared by two queries duplicates its
    // postings per qid in `post`; df is per (term, doc).
    val qdf = post.select("w", "doc_id").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val ts = post
      .join(broadcast(qdf), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        expr("""((((nd - df) * 2000 + 1000) div (2 * df + 1))
               * ((22 * a * least(tf, 1000) * 1000000)
                  div (10 * a * least(tf, 1000) + 3 * a
                      + 9000 * dl))) div 1000"""))
    val sc = ts.groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("tscore")).as("score"))
    val shardW = Window
      .partitionBy(col("qid"), pmod(col("doc_id"), lit(32)))
      .orderBy(col("score").desc, col("doc_id"))
    val finalW = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    sc.withColumn("__srk", row_number().over(shardW))
      .filter(col("__srk") <= 10)
      .withColumn("rnk", row_number().over(finalW).cast("bigint"))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("doc_id"), col("n_terms"),
        col("score").as("score_scaled"), col("rnk"))
  }

  def all: Seq[Q] = Seq(

    // Domain authority from content citation: every shingle's EARLIEST
    // carrier (min doc id — the q118 first-occurrence discipline) is
    // its origin; each later carrier's source "cites" the origin's
    // source, and the resulting weighted source→source graph is ranked
    // by damped PageRank in scaled-integer space. This is the domain-
    // ranking step of web-corpus curation (crawl-frontier priors,
    // per-domain quality weights): sources whose content everyone else
    // repeats rank high, content farms that only copy rank at the
    // teleport floor. The edge derivation rides the persisted shingle
    // index (parquet reads, no re-shingling); the per-shingle origin
    // lookup is a 1-row-per-key join SALTED 16 ways (boilerplate
    // shingles are hot by construction — the q119 discipline); the
    // power iterations are |sources|-row joins against a
    // localCheckpoint'd edge frame (plan depth constant in the
    // iteration count). The oracle replays shingling, attribution,
    // ppm edge weights, and all six integer iterations unrolled.
    Q("q130_domain_rank",
      s"""WITH $domainRankCtes
         |SELECT v AS source, CAST(r AS BIGINT) AS rank_scaled FROM r$PrIters""".stripMargin) {
      (s, d) => domainRank(s, d)
    },

    // TRUST propagation from a vetted seed set — the TrustRank
    // recipe (Gyöngyi/Garcia-Molina/Pedersen, public) over the same
    // citation graph as q130: teleport mass lands ONLY on the seed
    // sources (the two lexicographically-smallest — the harness's
    // deterministic stand-in for an allowlist), so rank measures
    // citation-reachability FROM trust, and a source nobody on the
    // trust frontier cites ranks exactly 0 — the allowlist-expansion
    // move of web-corpus curation, complementary to q130's global
    // authority (a content farm can accumulate authority from other
    // farms; it cannot acquire trust the seeds never granted).
    // Persisted-registry read like q130; the oracle replays
    // attribution + the seed-conditional integer recurrence unrolled.
    Q("q158_trusted_seed_rank",
      s"""WITH $attributionCtes,
         |seeds AS (SELECT v FROM srcs ORDER BY v LIMIT 2),
         |nsd AS (SELECT count(*) AS n FROM seeds),
         |tps AS (SELECT (15 * (${Graph.Scale} // n)) // 100 AS t FROM nsd),
         |t0 AS (SELECT s.v,
         |         CASE WHEN s.v IN (SELECT v FROM seeds)
         |              THEN (SELECT ${Graph.Scale} // n FROM nsd)
         |              ELSE 0 END AS r
         |       FROM srcs s),
         |${seedIterCtes(PrIters)}
         |SELECT v AS source, CAST(r AS BIGINT) AS trust_scaled
         |FROM t$PrIters""".stripMargin) {
      (s, d) => Indexes.trustedRanks(s, d)
    },

    // BM25 top-k retrieval over the inverted index — the ranked-lookup
    // operator curation pipelines use for targeted data selection
    // ("find the docs most about X"), eval-set mining, and dedup
    // triage. Scoring is the ENGINE-SPEC'D rational BM25 (k1 = 1.2,
    // b = 0.75): the tf-normalization term is exact integer arithmetic
    // against the milli-scaled average document length, idf is the
    // Robertson argument (N−df+0.5)/(df+0.5) in milli WITHOUT the log
    // (log-free idf is order-identical within a term and engine-exact
    // across engines; tf saturates at 1000 — BM25 is flat up there —
    // which also pins the 2²·10¹⁷ overflow envelope at any corpus
    // size). Query terms are the df-ranked 20th–24th terms (mid-
    // frequency — deterministic, non-degenerate on any corpus).
    // Scale shape: term selection is TakeOrdered top-24 (never a
    // global sort partition); the 5-row query set broadcasts onto the
    // posting lists; top-k per term is TWO-PHASE — row_number within
    // (term, 32-way doc shard), then the final rank over ≤ 320
    // survivors per term — so no posting list (millions of docs for a
    // mid-frequency term at 100 TB) ever sorts in one partition. The
    // oracle is the naive global formulation of the same integer
    // score, so the green row proves the two-phase decomposition.
    Q("q132_bm25_topk",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS nd,
        |                 (sum(dl) * 1000) // count(*) AS a FROM dl),
        |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |qt AS (SELECT w, df FROM (
        |         SELECT w, df, row_number() OVER (ORDER BY df DESC, w) AS trk
        |         FROM dfr) WHERE trk BETWEEN 20 AND 24),
        |sc AS (SELECT tf.w, tf.doc_id, tf.tf, dl.dl,
        |         ((((stats.nd - qt.df) * 2000 + 1000) // (2 * qt.df + 1))
        |          * ((22 * stats.a * least(tf.tf, 1000) * 1000000)
        |             // (10 * stats.a * least(tf.tf, 1000) + 3 * stats.a
        |                 + 9000 * dl.dl))) // 1000 AS score
        |       FROM tf JOIN qt ON tf.w = qt.w
        |       JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY w
        |                   ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |SELECT w AS term, doc_id, CAST(tf AS BIGINT) AS tf, dl,
        |       CAST(score AS BIGINT) AS score_scaled, CAST(rnk AS BIGINT) AS rnk
        |FROM rk WHERE rnk <= 10""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val tf = Indexes.termFrequencies(s, d)
        val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        val stats = dl.agg(count(lit(1)).as("nd"),
          expr("(sum(dl) * 1000) div count(1)").as("a"))
        val dfr = tf.groupBy("w").agg(count(lit(1)).as("df"))
        // TakeOrdered top-24, then rank the bounded survivors via the
        // warning-free broadcast ahead-count (never an unpartitioned
        // WindowExec; the rank runs over 24 rows, not the vocabulary).
        val qt = graft.ops.Sampling.boundedRowNumber(
            dfr.orderBy(col("df").desc, col("w").asc).limit(24),
            "trk", Seq("df" -> false, "w" -> true))
          .filter(col("trk").between(20, 24)).select("w", "df")
        val sc = tf.join(broadcast(qt), "w")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("score",
            expr("""((((nd - df) * 2000 + 1000) div (2 * df + 1))
                   * ((22 * a * least(tf, 1000) * 1000000)
                      div (10 * a * least(tf, 1000) + 3 * a
                          + 9000 * dl))) div 1000"""))
        val shardW = Window
          .partitionBy(col("w"), pmod(col("doc_id"), lit(32)))
          .orderBy(col("score").desc, col("doc_id"))
        val finalW = Window.partitionBy(col("w"))
          .orderBy(col("score").desc, col("doc_id"))
        sc.withColumn("__srk", row_number().over(shardW))
          .filter(col("__srk") <= 10)
          .withColumn("rnk", row_number().over(finalW).cast("bigint"))
          .filter(col("rnk") <= 10)
          .select(col("w").as("term"), col("doc_id"), col("tf"), col("dl"),
            col("score").as("score_scaled"), col("rnk"))
    },

    // MULTI-TERM BM25 retrieval — the actual search shape over the
    // inverted index: a QUERY TABLE (each eval doc's first four
    // distinct words, the doc_id % 13 convention — deterministic,
    // derived, bounded) scored against the corpus, per-(query, doc)
    // scores summed over matched terms, top-10 docs per query. The
    // engine-spec'd rational BM25 of q132 term-for-term (log-free
    // Robertson idf, milli avg-dl, tf saturation at 1000 — the same
    // overflow envelope, summed over ≤ 4 terms). Scale shape: the
    // query-term table broadcasts onto the posting lists (map-side —
    // the 100 TB side never shuffles for the match), the per-pair
    // score is one partial aggregate, and top-k per query is the
    // q132 TWO-PHASE (row_number within (query, 32-way doc shard),
    // final rank over ≤ 320 survivors) so no candidate list ever
    // sorts in one partition. Oracle: the naive global formulation —
    // the green row again proves the decomposition.
    Q("q151_bm25_retrieval",
      s"""WITH $bm25Ctes
        |SELECT qid, doc_id, CAST(n_terms AS BIGINT) AS n_terms,
        |       CAST(score AS BIGINT) AS score_scaled, CAST(rnk AS BIGINT) AS rnk
        |FROM rk WHERE rnk <= 10""".stripMargin) {
      (s, d) => bm25TopK(s, d)
    },

    // HYBRID retrieval — the modern RAG search shape end-to-end:
    // lexical RECALL (q151's multi-term BM25 top-10 per query, the
    // shared chain — the inverted index finds the candidates) then
    // dense RERANK (exact cosine between the query document's
    // embedding and each candidate's — the vec_id = doc_id harness
    // alignment), final top-5 per query by (cosine, BM25, doc_id).
    // The two stages answer different failure modes: BM25 misses
    // paraphrase, and brute dense search over the corpus is the q40
    // cost — hybrid pays the index probe plus 10 cosines per query.
    // Scale bill: q151's probe + a 10-row-per-query keyed embedding
    // lookup + one partitioned window over ≤ 10 rows per query.
    Q("q156_hybrid_retrieval",
      s"""WITH $bm25Ctes,
        |cand AS (SELECT qid, doc_id, score FROM rk WHERE rnk <= 10),
        |rr AS (SELECT c.qid, c.doc_id, c.score,
        |         ${SimilarityQueries.cosSql("eq.embedding", "ec.embedding")} AS cos_r
        |       FROM cand c
        |       JOIN embeddings eq ON eq.vec_id = c.qid
        |       JOIN embeddings ec ON ec.vec_id = c.doc_id),
        |rr2 AS (SELECT *, row_number() OVER (PARTITION BY qid
        |          ORDER BY cos_r DESC, score DESC, doc_id) AS rnk FROM rr)
        |SELECT qid, doc_id, cos_r,
        |       CAST(score AS BIGINT) AS score_scaled, CAST(rnk AS BIGINT) AS rnk
        |FROM rr2 WHERE rnk <= 5""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        import graft.functions.VectorExpressions.normF
        val emb = table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"),
            normF(col("embedding")).as("nrm"))
        val cand = bm25TopK(s, d).select("qid", "doc_id", "score_scaled")
        val rr = cand
          .join(emb.select(col("vec_id").as("qid"),
            col("embedding").as("e_q"), col("nrm").as("n_q")), "qid")
          .join(emb.select(col("vec_id").as("doc_id"),
            col("embedding").as("e_c"), col("nrm").as("n_c")), "doc_id")
          .withColumn("cos_r", graft.ops.Similarity.cosRoundedPre(
            col("e_q"), col("e_c"), col("n_q"), col("n_c")))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_r").desc, col("score_scaled").desc, col("doc_id"))
        rr.withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 5)
          .select("qid", "doc_id", "cos_r", "score_scaled", "rnk")
    },

    // CCNet-style perplexity buckets: per language, rank documents by
    // their LM score (bits-per-bigram under the corpus bigram model —
    // q111's integer formulation normalized per bigram) and cut the
    // ranking into head/middle/tail thirds — THE CCNet recipe
    // (Wenzek et al.: per-language perplexity terciles, head kept,
    // tail dropped or down-weighted). Documents without bigrams (< 2
    // tokens) carry no LM signal and drop, as in the reference recipe.
    // Scale shape: scores ride the persisted bigram index (one salted
    // narrow-key join); the per-language ranking is
    // [[graft.ops.Sampling.rankNormalize]]'s two-phase decomposition
    // — 256 score buckets, bounded offsets, ONE window per (lang,
    // bucket) — so no language stratum ever sorts in one partition;
    // the oracle is the naive global row_number, so the green row is
    // machine proof of the decomposition, bucket boundaries included.
    Q("q133_ccnet_buckets",
      s"""WITH $ccnetCtes
         |SELECT doc_id, lang, CAST(score_milli AS BIGINT) AS score_milli,
         |       CASE (3 * rnk) // n WHEN 0 THEN 'head'
         |            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM rk""".stripMargin) {
      (s, d) => ccnetBuckets(s, d)
    },

    // Sub/superset detection via asymmetric containment — the measure
    // Jaccard misses: a quote inside a long article, an excerpt page,
    // a boilerplate-wrapped copy. The quadratic candidate stage runs
    // over DISTINCT shingle sets via the persisted set-collapse
    // membership index — containment is a function of the sets alone,
    // so exact replicas are interchangeable and the inverted-index
    // self join shrinks by the square of the duplication factor
    // (sf10: 528.6 M → ~36 M candidate rows); qualifying group pairs
    // expand back to doc pairs, within-group pairs are mutual 100 %
    // containments by construction. See
    // [[graft.ops.Dedup.containmentPairsCollapsed]]. The oracle is
    // the naive ALL-PAIRS containment over the same shingle space —
    // the green row proves the collapse drops no pair.
    Q("q134_containment_pairs",
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$shingleCtes
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter_cnt,
         |       CAST(len(a.hs) AS BIGINT) AS n1,
         |       CAST(len(b.hs) AS BIGINT) AS n2,
         |       (len(list_intersect(a.hs, b.hs)) * 1000000) // len(a.hs) AS c1_ppm,
         |       (len(list_intersect(a.hs, b.hs)) * 1000000) // len(b.hs) AS c2_ppm,
         |       CAST(len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(a.hs) AS INT) AS d1_in_d2,
         |       CAST(len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(b.hs) AS INT) AS d2_in_d1
         |FROM hst a JOIN hst b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(a.hs)
         |   OR len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(b.hs)""".stripMargin) {
      (s, d) =>
        graft.ops.Dedup.containmentPairsCollapsed(
          Indexes.containmentGroups(s, d),
          Indexes.containmentReps(s, d), "doc_id", thresholdPct = 80)
    },

    // Dataset card: the per-(source, language) statistics sheet every
    // released corpus ships (docs, tokens, chars, exact-duplicate
    // rate, language spread) with source-level and corpus-level
    // rollups in the SAME pass — GROUPING SETS, one shuffle for all
    // three granularities. The duplicate flag is global (a copy
    // counts as a copy wherever it lives), computed by one hash
    // aggregate joined back through the selective-salt join (a
    // megacopy text is a hot hash key BY CONSTRUCTION; cold keys pay
    // nothing). Everything integer: counts and a ppm rate.
    Q("q135_datacard",
      """WITH h AS (SELECT doc_id, source, lang, text, md5(text) AS hsh FROM documents),
        |hc AS (SELECT hsh, count(*) AS c FROM h GROUP BY hsh),
        |f AS (SELECT h.source, h.lang,
        |        len(string_split(h.text, ' ')) AS n_tok,
        |        length(h.text) AS n_chars,
        |        CASE WHEN hc.c > 1 THEN 1 ELSE 0 END AS is_dup
        |      FROM h JOIN hc USING (hsh))
        |SELECT source, lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |       CAST(sum(is_dup) AS BIGINT) AS dup_docs,
        |       CAST((sum(is_dup) * 1000000) // count(*) AS BIGINT) AS dup_ppm,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM f
        |GROUP BY GROUPING SETS ((source, lang), (source), ())""".stripMargin) {
      (s, d) =>
        val h = table(s, d, "documents").select(
          col("doc_id"), col("source"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text")).as("hsh"))
        val hc = h.groupBy("hsh").agg(count(lit(1)).as("c"))
        Skew.saltedJoinHot(h, hc, "hsh", saltBy = col("doc_id"),
            salts = 16, hotCap = graft.ops.Dedup.DefaultHotShingleCap)
          .select(col("source"), col("lang"), col("n_tok"), col("n_chars"),
            when(col("c") > 1, 1L).otherwise(0L).as("is_dup"))
          .createOrReplaceTempView("datacard_f")
        s.sql(
          """SELECT source, lang,
            |       count(*) AS n_docs,
            |       sum(n_tok) AS n_tokens,
            |       sum(n_chars) AS n_chars,
            |       sum(is_dup) AS dup_docs,
            |       (sum(is_dup) * 1000000) div count(*) AS dup_ppm,
            |       count(DISTINCT lang) AS n_langs
            |FROM datacard_f
            |GROUP BY GROUPING SETS ((source, lang), (source), ())""".stripMargin)
    },

    // Ingest-distribution drift detection: per day, the L1 distance
    // (in ppm) between that day's event-type mix and the trailing
    // 7-day baseline mix — the pipeline-monitoring gate that catches
    // a source going bad (scraper regression, upstream schema change,
    // spam flood) BEFORE the bad batch trains anything. Calendar-
    // correct under gaps: the window is a RANGE frame over the
    // integer day index, not a ROWS frame over present days. The
    // type×day grid is dense (bounded: |types| × |days|) so absent
    // types contribute their full ppm share to the distance.
    // Scale shape: one count aggregate over the events (map-side
    // partial), then windows over the BOUNDED grid — the raw stream
    // is touched exactly once. Flag at 10 % total variation ×2
    // (L1 = 2·TV). All integer; the oracle replays grid, frames, and
    // ppm arithmetic.
    Q("q136_drift_detect", DriftOracle) {
      (s, d) =>
        val dc = table(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("event_type").as("et"))
          .groupBy("day", "et").agg(count(lit(1)).as("n"))
        driftFromDailyCounts(dc)
    },

    // The drift gate ON THE LIVE FEED: the per-(day, type) counts are
    // maintained as streaming aggregation state across micro-batch
    // triggers (the q122 replay shape — 2-file triggers over a staged
    // arrival log), and the trailing-baseline L1 derivation runs over
    // the drained state. The oracle is q136's batch formulation
    // verbatim: a green row is machine proof the incremental fold
    // equals the batch answer whatever the trigger boundaries were —
    // the monitor can ride the ingest stream it guards. State is
    // |days|×|types| rows; per-trigger work ∝ batch.
    Q("q137_stream_drift", DriftOracle) {
      (s, d) =>
        val ev = table(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("event_type").as("et"))
        val scratch = java.nio.file.Files.createTempDirectory("graft_q137")
        val staging = s"$scratch/events"
        ev.repartitionByRange(4, col("day")).write.parquet(staging)
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(staging)
        val agg = stream.groupBy(col("day"), col("et"))
          .agg(count(lit(1)).as("n"))
        val sinkName = "q137_stream_drift_sink"
        s.catalog.dropTempView(sinkName)
        // Outer finally owns the scratch dir: the drain `require`
        // throwing must still remove the staged arrival log (it only
        // feeds the stream; the memory sink holds the state the
        // derivation reads) — the inner finally only stops the query.
        try {
          val q = agg.writeStream.format("memory").queryName(sinkName)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          // awaitTermination returns FALSE on timeout without throwing —
          // unchecked, a timed-out stream would score drift against
          // partial counts: plausible-looking, silently wrong.
          try require(q.awaitTermination(300000),
            "q137: stream did not drain within 300s — partial counts")
          finally q.stop()
        } finally
          org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
        // The memory-sink view appears three times in the derivation
        // (days × types grid + the counts themselves); the analyzer
        // fails to deduplicate a VIEW's attribute ids the way it does
        // a file relation's, so rebuild the (bounded: |days|×|types|)
        // state frame with fresh ids first.
        val state = s.table(sinkName)
        driftFromDailyCounts(s.createDataFrame(state.rdd, state.schema))
    },

    // Authority-weighted corpus resampling: the domain rank DRIVING
    // the keep decision in one lineage (rank → per-source keep rate →
    // hash-threshold membership) — how a web corpus actually consumes
    // a domain ranking: not as a report, as a per-document sampling
    // weight. Keep rate is the rank normalized by the uniform seed
    // (Scale div n) at a 50 % center, capped at 1: an average-
    // authority source keeps half its docs, a heavily-cited source
    // keeps all, a farm that only copies keeps ~15 % (the teleport
    // floor × 0.5). Membership is q59's integer hash threshold —
    // deterministic, engine-portable, exactly rate_ppm in
    // expectation. The rate table is |sources| rows broadcast onto
    // the corpus: ONE map-side join + filter beyond the rank
    // derivation. The oracle replays the ENTIRE composition — the
    // unrolled PageRank chain, the rate arithmetic, and every
    // membership test.
    Q("q138_rank_weighted_sample",
      s"""WITH $domainRankCtes,
         |rates AS (SELECT v AS source,
         |            least(1000000, (r * 500000) // (SELECT ${Graph.Scale} // n FROM nn))
         |              AS rate_ppm
         |          FROM r$PrIters)
         |SELECT d.doc_id, d.source, CAST(rt.rate_ppm AS BIGINT) AS rate_ppm
         |FROM documents d JOIN rates rt ON d.source = rt.source
         |WHERE ${h64("CAST(d.doc_id AS VARCHAR)")} % 1000000 < rt.rate_ppm""".stripMargin) {
      (s, d) =>
        table(s, d, "documents").select("doc_id", "source")
          .join(broadcast(rankRates(s, d)), "source")
          .filter(graft.ops.Sampling.sampleKey(col("doc_id")) < col("rate_ppm"))
          .select(col("doc_id"), col("source"), col("rate_ppm"))
    },

    // INCREMENTAL domain rank — the q43/q108/q119 batch×corpus pattern
    // applied to the graph family: the newest ~10 % of documents (ids
    // ≥ cutoff — append-only ids make id order the arrival order, so
    // an established shingle's origin can never be stolen by an
    // arrival) probe the PERSISTED per-shingle origin index; known
    // shingles emit citation edges against the standing origins,
    // novel shingles resolve first-occurrence WITHIN the batch, and
    // the bounded (≤|sources|²) edge delta unions into the persisted
    // corpus edge table for the re-rank. Per-batch cost ∝ batch — the
    // corpus is touched only through two index reads. The oracle is
    // the FULL-CORPUS derivation (q130's chain) plus the delta
    // formulation, so a green row is machine proof the incremental
    // fold equals the from-scratch rank AND attributes the delta
    // exactly.
    Q("q139_domain_rank_incremental",
      s"""WITH $domainRankCtes,
         |cut AS (SELECT (max(doc_id) * 9) // 10 AS c FROM documents),
         |datt AS (SELECT e.source AS u, s.vsrc AS v, count(*) AS w
         |         FROM ex e JOIN osrc s ON e.hh = s.hh CROSS JOIN cut
         |         WHERE e.doc_id <> s.odoc AND e.source <> s.vsrc
         |           AND e.doc_id >= cut.c
         |         GROUP BY 1, 2),
         |din AS (SELECT v, sum(w) AS nw FROM datt GROUP BY v)
         |SELECT r.v AS source, CAST(r.r AS BIGINT) AS rank_scaled,
         |       CAST(coalesce(din.nw, 0) AS BIGINT) AS new_in_w
         |FROM r$PrIters r LEFT JOIN din ON din.v = r.v""".stripMargin) {
      (s, d) =>
        val docs = table(s, d, "documents")
        // Bounded 1-row driver read (the J9 discipline) — the cutoff
        // keys the persisted corpus-side index tables.
        val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
        val cutoff = (mx * 9) / 10
        val origins = Indexes.shingleOrigins(s, d, cutoff)
        val cedges = Indexes.domainEdges(s, d, cutoff)
        // Batch shingles from the persisted index too — no md5 re-scan.
        val bsh = Indexes.shingles(s, d)
          .filter(col("doc_id") >= cutoff)
          .select(col("doc_id"), col("source"), explode(col("__hs")).as("h"))
        val probed = bsh.join(origins.select("h", "vsrc"), Seq("h"), "left")
        val known = probed
          .filter(col("vsrc").isNotNull && col("source") =!= col("vsrc"))
          .select(col("source").as("u"), col("vsrc").as("v"))
        // Novel shingles: first occurrence resolves within the batch
        // (all corpus carriers would have claimed them already).
        val novelSh = probed.filter(col("vsrc").isNull)
          .select("doc_id", "source", "h")
        val osrcB = novelSh.groupBy("h").agg(min(col("doc_id")).as("odoc"))
          .join(docs.select(col("doc_id").as("odoc"),
            col("source").as("vsrcb")), Seq("odoc"))
        val novel = novelSh.join(osrcB.select("h", "vsrcb"), "h")
          .filter(col("source") =!= col("vsrcb"))
          .select(col("source").as("u"), col("vsrcb").as("v"))
        val delta = known.union(novel)
          .groupBy("u", "v").agg(count(lit(1)).as("w"))
          .localCheckpoint(true) // bounded ≤ |sources|²; read twice
        val att = cedges.union(delta)
          .groupBy("u", "v").agg(sum(col("w")).as("w"))
          .localCheckpoint(true)
        val din = delta.groupBy(col("v")).agg(sum(col("w")).as("new_in_w"))
        // validateEdges off — the sanctioned opt-out, with the upstream
        // guarantee it requires: every endpoint of `att` IS a
        // documents.source value by construction (u from the batch
        // shingle rows' source, v from the origin index's vsrc /
        // within-batch vsrcb, both projections of documents.source),
        // and the universe below is exactly documents.source distinct.
        // Measured: the two validation joins were ~15% of the query's
        // warm cost (Q139Profile, committed phase timings) on a query
        // whose remaining time is fixed stage-scheduling overhead.
        Graph.pageRank(att, docs.select("source").distinct(), "source",
            PrIters, validateEdges = false)
          .join(din, Seq("v"), "left")
          .select(col("v").as("source"), col("r").as("rank_scaled"),
            coalesce(col("new_in_w"), lit(0L)).as("new_in_w"))
    },

    // PMI phrase mining: the multi-word-expression discovery step that
    // seeds tokenizer pre-merges and phrase-aware dedup ("new york",
    // "machine learning" should tokenize as units). PMI in the q111
    // bit-length space — bits(c_ab) + bits(N) − bits(c_a) − bits(c_b),
    // the integer log₂ the LM family already uses, so no float log and
    // no 10²⁶ overflow from the ratio form. Candidates need count ≥ 5
    // (PMI is noise below that — standard practice); top 50 by
    // (pmi_bits, count, bigram). Both frequency tables are persisted
    // indexes; the word-count joins are selective-salt joins (function
    // words are hot BY CONSTRUCTION); the final slice is TakeOrdered,
    // never a vocabulary-wide sort partition; the rank window runs
    // over the 50 survivors.
    Q("q141_phrase_mining",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM wc),
        |bgr AS (
        |  SELECT words[CAST(i AS INT)] AS w1, words[CAST(i AS INT)+1] AS w2
        |  FROM (SELECT string_split(text, ' ') AS words FROM documents),
        |       unnest(generate_series(1, len(words)-1)) AS g(i)),
        |bc AS (SELECT w1, w2, count(*) AS cab FROM bgr GROUP BY 1, 2
        |       HAVING count(*) >= 5),
        |scored AS (
        |  SELECT bc.w1, bc.w2, bc.cab,
        |         CAST(length(bin(bc.cab)) + length(bin(n.n))
        |              - length(bin(a.c)) - length(bin(b.c)) AS BIGINT) AS pmi_bits
        |  FROM bc JOIN wc a ON a.w = bc.w1 JOIN wc b ON b.w = bc.w2 CROSS JOIN n),
        |ranked AS (SELECT *, row_number() OVER (
        |             ORDER BY pmi_bits DESC, cab DESC, w1, w2) AS rnk FROM scored)
        |SELECT w1, w2, CAST(cab AS BIGINT) AS cab, pmi_bits,
        |       CAST(rnk AS BIGINT) AS rnk
        |FROM ranked WHERE rnk <= 50""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val wc = Indexes.termFrequencies(s, d)
          .groupBy("w").agg(sum(col("tf")).as("c"))
        val n = wc.agg(sum(col("c")).cast("long").as("n"))
        val bc = Indexes.bigramFrequencies(s, d)
          .groupBy("bg").agg(sum(col("tf")).as("cab"))
          .filter(col("cab") >= 5)
          .select(split(col("bg"), " ").getItem(0).as("w1"),
            split(col("bg"), " ").getItem(1).as("w2"), col("cab"))
        val scored = Skew.saltedJoinHot(
            bc, wc.select(col("w").as("w1"), col("c").as("ca")), "w1",
            saltBy = col("w2"), salts = 16,
            hotCap = graft.ops.Dedup.DefaultHotShingleCap)
        val scored2 = Skew.saltedJoinHot(
            scored, wc.select(col("w").as("w2"), col("c").as("cb")), "w2",
            saltBy = col("w1"), salts = 16,
            hotCap = graft.ops.Dedup.DefaultHotShingleCap)
          .crossJoin(broadcast(n))
          .withColumn("pmi_bits",
            (length(bin(col("cab"))) + length(bin(col("n")))
              - length(bin(col("ca"))) - length(bin(col("cb"))))
              .cast("long"))
        val top = scored2
          .orderBy(col("pmi_bits").desc, col("cab").desc, col("w1"), col("w2"))
          .limit(50)
        // Rank the 50 survivors via the warning-free broadcast
        // ahead-count — never an unpartitioned WindowExec.
        graft.ops.Sampling.boundedRowNumber(top, "rnk",
            Seq("pmi_bits" -> false, "cab" -> false,
              "w1" -> true, "w2" -> true))
          .select("w1", "w2", "cab", "pmi_bits", "rnk")
    },

    // Length-sorted batching: order the corpus by token count, cut
    // into fixed-size micro-batches, report each batch's padding
    // waste — the sorted-batching / bucketing step every trainer runs
    // to stop short documents burning compute as padding (and the
    // curriculum primitive: batch_id IS a shortest-first schedule).
    // The global length order comes from rankNormalize's two-phase
    // machinery (256 value buckets, bounded offsets, one window per
    // bucket — the corpus NEVER sorts in one partition); the oracle
    // is the naive global row_number, so the green row again proves
    // the decomposition — this time on a value key with heavy ties.
    Q("q143_sorted_batching",
      """WITH t AS (SELECT doc_id, len(string_split(text,' ')) AS n_tok FROM documents),
        |p AS (SELECT doc_id, n_tok,
        |        row_number() OVER (ORDER BY n_tok, doc_id) - 1 AS pos FROM t),
        |b AS (SELECT pos // 32 AS batch_id, count(*) AS n_docs,
        |        max(n_tok) AS max_tok, sum(n_tok) AS sum_tok
        |      FROM p GROUP BY 1)
        |SELECT CAST(batch_id AS BIGINT) AS batch_id,
        |       CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(max_tok AS BIGINT) AS max_tok,
        |       CAST(sum_tok AS BIGINT) AS sum_tok,
        |       CAST(((n_docs * max_tok - sum_tok) * 1000000)
        |            // (n_docs * max_tok) AS BIGINT) AS pad_ppm
        |FROM b""".stripMargin) {
      (s, d) =>
        val t = table(s, d, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        val ranked = graft.ops.Sampling.rankNormalize(
          t.withColumn("g", lit(0)), "g", "doc_id", col("n_tok"))
        ranked
          .select(col("score").as("n_tok"), expr("rnk div 32").as("batch_id"))
          .groupBy("batch_id")
          .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_tok"),
            sum(col("n_tok")).as("sum_tok"))
          .select(col("batch_id"), col("n_docs"), col("max_tok"),
            col("sum_tok"),
            expr("((n_docs * max_tok - sum_tok) * 1000000) div (n_docs * max_tok)")
              .as("pad_ppm"))
    },

    // Eval-coverage audit — q60's contamination flipped around: per
    // EVAL document (q60's convention: every 13th doc's 40-token
    // prefix), what fraction of its shingles the rest of the corpus
    // covers. Low coverage = a domain the corpus doesn't teach (the
    // "train on it or expect the benchmark to probe out-of-
    // distribution" signal); q60 asks who must be REMOVED, this asks
    // what is MISSING. The eval doc always carries its own prefix
    // shingles in the full-corpus index (prefix 3-grams ⊂ document
    // 3-grams), so covered-by-others ⇔ corpus carrier count ≥ 2 — no
    // self-exclusion join. Corpus counts ride the persisted shingle
    // index; the eval probe is a selective-salt join (boilerplate
    // shingles are hot); per-eval-doc work ∝ eval size.
    Q("q144_eval_coverage",
      s"""WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         |esh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
         |          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
         |        FROM (SELECT doc_id, string_split(array_to_string(ws[1:40],' '),' ') AS ws
         |              FROM tok WHERE doc_id % 13 = 0)
         |        WHERE len(ws) >= 3),
         |eh AS (SELECT doc_id, ${h64("s")} AS h
         |       FROM (SELECT doc_id, unnest(shs) AS s FROM esh)),
         |tsh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
         |          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
         |        FROM tok WHERE len(ws) >= 3),
         |th AS (SELECT doc_id, ${h64("s")} AS h
         |       FROM (SELECT doc_id, unnest(shs) AS s FROM tsh)),
         |hc AS (SELECT h, count(*) AS c FROM th GROUP BY h),
         |cov AS (SELECT eh.doc_id, count(*) AS n_sh,
         |          sum(CASE WHEN hc.c >= 2 THEN 1 ELSE 0 END) AS n_cov
         |        FROM eh JOIN hc ON eh.h = hc.h GROUP BY 1)
         |SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
         |       CAST(n_cov AS BIGINT) AS n_covered,
         |       CAST((n_cov * 1000000) // n_sh AS BIGINT) AS coverage_ppm
         |FROM cov""".stripMargin) {
      (s, d) =>
        // The eval probe frame scales WITH the corpus under this
        // harness's doc_id % 13 membership convention (≈7.7% of docs,
        // first-40-tokens each) — materialize it once (it feeds three
        // consumers: the probe-hash semi side, the final join, and
        // the count; its md5 lineage measured 5-7 s per re-evaluation
        // inside the Generate at sf0.1), but do NOT broadcast-hint
        // it: a corpus-proportional broadcast is a driver OOM at
        // scale. AQE picks broadcast while the probe set is small and
        // degrades to a shuffle join when it isn't — a real benchmark
        // suite (bounded by contract) could re-add the hints.
        val evalSh = graft.ops.Dedup.shingleFrame(
            table(s, d, "documents")
              .filter(col("doc_id") % 13 === 0)
              .select(col("doc_id"),
                array_join(slice(split(col("text"), " "), 1, 40), " ")
                  .as("text")),
            "doc_id", "text")
          .localCheckpoint(true)
          .select(col("doc_id"), explode(col("__hs")).as("h"))
        // Joining the corpus index against the probe-hash set first
        // keys the carrier-count aggregate only on eval shingles —
        // never a vocabulary-wide shuffle.
        val hc = Indexes.shingles(s, d)
          .select(explode(col("__hs")).as("h"))
          .join(evalSh.select("h").distinct(), "h")
          .groupBy("h").agg(count(lit(1)).as("c"))
        evalSh.join(hc, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_covered"))
          .select(col("doc_id"), col("n_shingles"), col("n_covered"),
            expr("(n_covered * 1000000) div n_shingles").as("coverage_ppm"))
    },

    // Curation v4 — the wave-3 signals composed into ONE keep
    // decision, the way a production corpus release actually runs:
    // keep a document iff (a) its language-relative perplexity bucket
    // is head or middle (the CCNet gate, q133), (b) it survives the
    // authority-weighted coin flip (domain-rank rate × hash threshold,
    // q138), and (c) it is not a sub-document of another doc
    // (containment, q134 — mutual containments keep the smaller id as
    // canonical). Three persisted-index-backed signals meeting in one
    // lineage: the bucket join is doc-grain, the rate table broadcasts,
    // the drop set is a left-anti join. The oracle replays ALL of it —
    // the bigram-LM rank chain, the unrolled PageRank, the rate
    // arithmetic, every membership test, and the all-pairs containment
    // closure — in one query; a green row gates the whole composition.
    Q("q145_curation_v4",
      s"""WITH $domainRankCtes,
         |rates AS (SELECT v AS source,
         |            least(1000000, (r * 500000) // (SELECT ${Graph.Scale} // n FROM nn))
         |              AS rate_ppm
         |          FROM r$PrIters),
         |$ccnetCtes,
         |cont AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
         |           len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(a.hs) AS c1,
         |           len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(b.hs) AS c2
         |         FROM hst a JOIN hst b ON a.doc_id < b.doc_id
         |         WHERE len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(a.hs)
         |            OR len(list_intersect(a.hs, b.hs)) * 100 >= 80 * len(b.hs)),
         |drops AS (SELECT d1 AS doc_id FROM cont WHERE c1 AND NOT c2
         |          UNION SELECT d2 FROM cont WHERE c2)
         |SELECT d.doc_id, d.lang, d.source,
         |       CASE (3 * rk.rnk) // rk.n WHEN 0 THEN 'head'
         |            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
         |       CAST(rt.rate_ppm AS BIGINT) AS rate_ppm
         |FROM documents d
         |JOIN rk ON rk.doc_id = d.doc_id
         |JOIN rates rt ON rt.source = d.source
         |WHERE (3 * rk.rnk) // rk.n <= 1
         |  AND ${h64("CAST(d.doc_id AS VARCHAR)")} % 1000000 < rt.rate_ppm
         |  AND d.doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin) {
      (s, d) =>
        val buck = ccnetBuckets(s, d).filter(col("bucket") =!= "tail")
        val cont = graft.ops.Dedup.containmentPairsCollapsed(
          Indexes.containmentGroups(s, d),
          Indexes.containmentReps(s, d), "doc_id", thresholdPct = 80)
        // Every emitted pair yields EXACTLY ONE drop ((c1,¬c2) → d1,
        // otherwise d2 — mutual containment keeps the smaller id), so
        // the drop set is one projection, not a two-filter union that
        // would evaluate the containment chain twice (measured 2× the
        // whole pair join at sf10).
        val drops = cont
          .select(when(col("d1_in_d2") === 1 && col("d2_in_d1") === 0,
            col("d1")).otherwise(col("d2")).as("doc_id"))
          .distinct()
        table(s, d, "documents").select("doc_id", "lang", "source")
          .join(buck.select("doc_id", "bucket"), "doc_id")
          .join(broadcast(rankRates(s, d)), "source")
          .filter(graft.ops.Sampling.sampleKey(col("doc_id")) < col("rate_ppm"))
          .join(drops, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "source", "bucket", "rate_ppm")
    },

    // Winnowed near-dup pairs — the MOSS fingerprint-selection scheme
    // (Schleimer/Wilkerson/Aiken, public) as the INDEX-SIZE dial for
    // sub-document dedup: keep only each 8-window's minimum shingle
    // hash (expected density ~2/9 of the full shingle index) while
    // GUARANTEEING any shared run of ≥ w+n−1 = 10 tokens still
    // collides on a selected hash. At 100 TB this is the difference
    // between a 20 TB and a 4.5 TB dedup index with the same
    // long-match detection. Selection is positional (window minima
    // over the ORDERED hash stream — see
    // [[graft.ops.Dedup.winnowSelect]]), by value, so
    // engines cannot disagree on ties. Pairs share ≥ 2 selected
    // prints; candidates come from the same fragment-replicate
    // bucket join as the full-shingle families, sizes riding the
    // inverted index (the q134 trick). Oracle = naive all-pairs
    // intersection over the same winnowed lists.
    // Min-selection CONCENTRATES hot keys: a corpus-frequent trigram
    // whose hash happens to be small is window-minimal almost
    // everywhere it appears, so one selected print can gather the
    // whole corpus into one bucket (measured: the uncapped pair join
    // hung at sf0.1). MOSS's own practice drops boilerplate prints;
    // here that is a DOCUMENT-FREQUENCY cap (df ≤ 50) applied
    // identically on both sides — a semantic parameter of the
    // operator, mirrored by the oracle, not a silent performance cap.
    Q("q146_winnowing_neardup",
      s"""WITH ${winnowCtes()},
         |kn AS (SELECT doc_id, count(*) AS n FROM keep GROUP BY doc_id)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       CAST(count(*) AS BIGINT) AS n_shared,
         |       CAST(min(na.n) AS BIGINT) AS n1,
         |       CAST(min(nb.n) AS BIGINT) AS n2
         |FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
         |JOIN kn na ON na.doc_id = a.doc_id
         |JOIN kn nb ON nb.doc_id = b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(*) >= 2""".stripMargin) {
      (s, d) =>
        // The PERSISTED winnow index (one md5 pass at build, parquet
        // reads per reference) — this frame fans out to four
        // consumers (df counts, both join sides, size lookup), and
        // the inline expression lineage re-evaluated per reference ×
        // per window position was the r10 bench DNF.
        val keep = winnowKept(s, d)
        val kn = keep.groupBy("doc_id").agg(count(lit(1)).as("__n"))
        val inv = keep.join(kn, "doc_id")
        Skew.boundedBucketSelfJoin(inv, "__h", "doc_id",
            graft.ops.Dedup.DefaultHotShingleCap, detectOneIn = 16)
          .groupBy(col("doc_id").as("d1"), col("doc_id_2").as("d2"))
          .agg(count(lit(1)).as("n_shared"),
            min(col("__n")).as("n1"), min(col("__n_2")).as("n2"))
          .filter(col("n_shared") >= 2)
    },

    // Eval DECONTAMINATION via winnowed prints — the production use
    // of sub-document fingerprints: find corpus documents sharing a
    // long run (≥ w+n−1 = 10 tokens, the winnowing guarantee) with
    // any benchmark document, BEFORE the corpus trains anything.
    // Membership is the q60/q144 convention (doc_id % 13 = eval);
    // contamination = ≥ 2 shared df-capped prints with one eval doc
    // (the q146 pair threshold, asymmetric). Both sides read the
    // PERSISTED index; the df ≤ 50 cap bounds per-print join fan-out
    // at 50×50, so the probe is skew-safe by construction — at
    // 100 TB this is |eval prints| joined against a parquet column,
    // not a corpus scan. Oracle: the shared winnow chain + the same
    // membership split.
    Q("q148_winnow_decontaminate",
      s"""WITH ${winnowCtes()}
         |SELECT c.doc_id AS d1, e.doc_id AS d2,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM keep c JOIN keep e ON c.h = e.h
         |WHERE c.doc_id % 13 <> 0 AND e.doc_id % 13 = 0
         |GROUP BY c.doc_id, e.doc_id
         |HAVING count(*) >= 2""".stripMargin) {
      (s, d) =>
        val keep = winnowKept(s, d)
        val evalK = keep.filter(col("doc_id") % 13 === 0)
          .select(col("doc_id").as("d2"), col("__h"))
        val corpK = keep.filter(col("doc_id") % 13 =!= 0)
          .select(col("doc_id").as("d1"), col("__h"))
        corpK.join(evalK, "__h")
          .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
    },

    // INCREMENTAL winnowing near-dup: a new document batch (the last
    // 20 % of the id space — the q43/q108/q113 watermark pattern)
    // probes the PERSISTED winnow index against the established
    // corpus instead of re-pairing the world: per-batch work ∝
    // batch prints × bucket occupancy (bounded by the df cap), never
    // corpus². With text shingles (q43), image phashes (q108), and
    // audio fingerprints (q113), every signature family now has both
    // a full-corpus and an incremental declared flow. The df cap
    // stays CORPUS-WIDE (the persisted index's counts — batch docs
    // are corpus members), mirrored exactly by the oracle.
    Q("q149_winnowing_incremental",
      s"""WITH ${winnowCtes()},
         |cut AS (SELECT max(doc_id) * 4 // 5 AS c FROM documents)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM keep a JOIN keep b ON a.h = b.h
         |WHERE a.doc_id >= (SELECT c FROM cut)
         |  AND b.doc_id < (SELECT c FROM cut)
         |GROUP BY a.doc_id, b.doc_id
         |HAVING count(*) >= 2""".stripMargin) {
      (s, d) =>
        val keep = winnowKept(s, d)
        val maxId = table(s, d, "documents")
          .agg(max(col("doc_id")).cast("long")).head().getLong(0)
        val cutoff = maxId * 4 / 5
        keep.filter(col("doc_id") >= cutoff)
          .select(col("doc_id").as("d1"), col("__h"))
          .join(keep.filter(col("doc_id") < cutoff)
            .select(col("doc_id").as("d2"), col("__h")), "__h")
          .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
    },

    // Curation v5 — the round-11 signals composed into one RELEASE
    // decision, continuing the v1→v4 series: ship a document iff
    // (a) it is not an eval document itself (benchmark members never
    // enter the training release — the doc_id % 13 convention),
    // (b) the TRAINED linear-threshold quality model keeps it (q150 —
    // projection ≥ the balanced-optimal τ, a map expression over
    // bounded fitted metadata), (c) it shares no ≥10-token run with
    // any eval document (the q148 winnow drop list, persisted-index
    // backed), and (d) it survives the authority-weighted rate (the
    // q138/q145 coin flip: hashed doc_id under the domain-rank ppm).
    // The oracle replays EVERYTHING in one statement — the feature/
    // centroid/threshold chain, the winnow selection + df cap + the
    // contamination join, the unrolled PageRank and rate arithmetic,
    // and all four membership tests — three independently-tokenizing
    // CTE chains (prefixed lq/wn/plain) meeting in one WHERE.
    // Scale bill: the model is fitted metadata + one map pass; the
    // drop list and rate table are the q148/q130 costs, both
    // persisted-index backed; the compose adds one anti join and one
    // broadcast.
    Q("q153_curation_v5",
      s"""WITH $domainRankCtes,
         |rates AS (SELECT v AS source,
         |            least(1000000, (r * 500000) // (SELECT ${Graph.Scale} // n FROM nn))
         |              AS rate_ppm
         |          FROM r$PrIters),
         |${LlmQueries.linearQualityCtes("lq")},
         |${winnowCtes("wn")},
         |contam AS (SELECT DISTINCT doc_id FROM (
         |  SELECT c.doc_id FROM wnkeep c JOIN wnkeep e ON c.h = e.h
         |  WHERE c.doc_id % 13 <> 0 AND e.doc_id % 13 = 0
         |  GROUP BY c.doc_id, e.doc_id HAVING count(*) >= 2))
         |SELECT d.doc_id, d.source, CAST(p.pv AS BIGINT) AS quality_proj,
         |       CAST(rt.rate_ppm AS BIGINT) AS rate_ppm
         |FROM documents d
         |JOIN lqpr p ON p.doc_id = d.doc_id
         |JOIN rates rt ON rt.source = d.source
         |CROSS JOIN lqbest b
         |WHERE d.doc_id % 13 <> 0
         |  AND p.pv >= b.tau
         |  AND ${h64("CAST(d.doc_id AS VARCHAR)")} % 1000000 < rt.rate_ppm
         |  AND d.doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin) {
      (s, d) =>
        val (train, w, tau) = LlmQueries.qualityModel(s, d)
        val kept = graft.ops.Classify.thresholdPredict(train, w, tau)
          .filter(col("label_model") === 1)
          .select(col("doc_id"),
            // The projection is already computed inside the predict's
            // expression; re-derive it for the output column from the
            // same fitted direction (bounded metadata, map expression).
            (0 until graft.ops.Classify.NumBuckets)
              .map(b => col(s"f$b") * lit(w(b))).reduce(_ + _).as("quality_proj"))
        val keep = winnowKept(s, d)
        val contam = keep.filter(col("doc_id") % 13 =!= 0)
          .select(col("doc_id").as("d1"), col("__h"))
          .join(keep.filter(col("doc_id") % 13 === 0)
            .select(col("doc_id").as("d2"), col("__h")), "__h")
          .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .select(col("d1").as("doc_id")).distinct()
        table(s, d, "documents").select("doc_id", "source")
          .filter(col("doc_id") % 13 =!= 0)
          .join(kept, "doc_id")
          .join(broadcast(rankRates(s, d)), "source")
          .filter(graft.ops.Sampling.sampleKey(col("doc_id")) < col("rate_ppm"))
          .join(contam, Seq("doc_id"), "left_anti")
          .select("doc_id", "source", "quality_proj", "rate_ppm")
    },

    // Importance-resampling data selection — the DSIR recipe (Xie et
    // al., "Data Selection for Language Models via Importance
    // Resampling", NeurIPS 2023, public): score every raw document by
    // how much more likely its hashed-n-gram features are under a
    // TARGET domain's bag-of-ngrams model than under the raw corpus's,
    // then keep the top of the importance-weight distribution. Kept in
    // the house integer space (the q111/q133 discipline): bigram
    // features hash into 4096 buckets (portable md5 hash — both sides
    // agree bit-for-bit), each bucket's target/raw counts are
    // +1-smoothed, log-probabilities become integer bit-lengths
    // (length(bin(c)) = floor(log2 c)+1, so the per-bucket log-ratio
    // is bits(c_target) - bits(c_raw); the normalization constants
    // shared by all buckets cancel in the RANK the selection is made
    // on), and the per-doc weight is the tf-weighted sum. Selection is
    // deterministic top-25% via the two-phase rank decomposition
    // (rankNormalize — no global single-partition sort; the paper's
    // Gumbel resampling trades reproducibility for variance, the
    // wrong trade for an oracle-gated engine). The target here is the
    // vetted source 'src1' — the pattern's stand-in for "Wikipedia-
    // like"; any predicate works. Scale shape: the feature pass rides
    // the persisted bigram index (no re-tokenize), bucket stats are a
    // ≤4096-row aggregate with map-side partial collapse, scoring is
    // a BROADCAST probe of those 4096 rows (the corpus never shuffles
    // on a feature key), and ranking is the bounded-offset two-phase
    // machinery — at 100 TB the only corpus-sized exchanges are the
    // per-doc aggregate and the rank bucket counts.
    Q("q162_dsir_select",
      s"""WITH $dsirCtes,
         |r AS (SELECT doc_id, score,
         |        CAST(row_number() OVER (ORDER BY score, doc_id) - 1 AS BIGINT) AS rnk,
         |        CAST(count(*) OVER () AS BIGINT) AS n
         |      FROM alldocs)
         |SELECT doc_id, score, (rnk * 1000000) // greatest(n - 1, 1) AS pct_ppm
         |FROM r WHERE (rnk * 1000000) // greatest(n - 1, 1) >= 750000""".stripMargin) {
      (s, d) =>
        dsirScoreFrame(s, d)
          .withColumn("__g", lit(0))
          .transform(f =>
            graft.ops.Sampling.rankNormalize(f, "__g", "doc_id", col("score")))
          .filter(col("pct_ppm") >= 750000L)
          .select("doc_id", "score", "pct_ppm")
    },

    // Token-budget mixture PLANNING — the step between scoring and
    // assembly: given what each source actually has (its token mass),
    // split a corpus-level token budget (here half the corpus) across
    // sources as evenly as possible without over-asking anyone — the
    // water-filling allocation every "N-token pretraining mix"
    // spec sheet implies (uniform-share intent, availability-capped).
    // Exact integer water-fill (Sampling.waterFillQuota documents the
    // deterministic definition the oracle mirrors): sources below the
    // water level are kept whole, the rest level, the integer
    // remainder is granted deterministically. Scale shape: ONE
    // corpus-sized aggregate (per-source token sums); everything after
    // is stratum-grain metadata through the bounded two-phase prefix
    // machinery — no collect, no global sort, holds at domain-grain
    // strata counts.
    Q("q164_token_allocation",
      s"""WITH tok AS (
         |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
         |  FROM documents GROUP BY 1),
         |$quotaCtes
         |SELECT source, avail AS avail_tok, quota AS quota_tok, fully_kept
         |FROM quota""".stripMargin) {
      (s, d) =>
        // Token counts come from the persisted doc_tokens index — the
        // allocation never touches the raw text column.
        val avail = Indexes.docTokens(s, d)
          .groupBy("source").agg(sum(col("n_tok")).as("avail"))
        graft.ops.Sampling.waterFillQuota(avail, "source", "avail", 1L, 2L)
          .select(col("source"), col("avail").as("avail_tok"),
            col("quota").as("quota_tok"), col("fully_kept"))
    },

    // Quota FILL — the assembly step the plan above feeds: each
    // source's token quota is filled with its highest-importance
    // documents (the q162 DSIR score), in deterministic
    // (score DESC, doc_id) order, until the next document would start
    // past the quota. This is the chain a curated pretraining mix
    // actually ships: q162 scores → q164-style quotas → this emits
    // the kept rows with their running token position. Scale shape:
    // the score rides the persisted bigram-bucket index and a
    // broadcast stats probe (q162's plan), token counts are one
    // corpus pass, the per-source running sums are the two-phase
    // rankAndCumsum (bounded bucket offsets — never a source-global
    // sort partition), and the quota join broadcasts stratum-grain
    // rows. The fill rule is positional (keep while tokens-before <
    // quota), so membership is exact integer comparison.
    Q("q165_quota_fill",
      s"""WITH $dsirCtes,
         |doc AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
         |         a.score
         |  FROM documents d JOIN alldocs a USING (doc_id)),
         |tok AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS avail
         |        FROM doc GROUP BY 1),
         |$quotaCtes,
         |cum AS (
         |  SELECT doc_id, source, n_tok, score,
         |         CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
         |           ORDER BY score DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS cum_before
         |  FROM doc)
         |SELECT c.doc_id, c.source, c.n_tok, c.score, c.cum_before
         |FROM cum c JOIN quota q USING (source)
         |WHERE c.cum_before < q.quota""".stripMargin) {
      (s, d) =>
        // One pinned (doc_id, source, n_tok, score) frame feeds both
        // the per-source availability aggregate and the ranked fill —
        // without the pin the DSIR scoring chain would run twice.
        // Token counts come from the persisted doc_tokens index, so
        // the fill never re-splits the raw text column.
        val doc = Indexes.docTokens(s, d)
          .join(dsirScoreFrame(s, d), "doc_id")
          .localCheckpoint(true)
        val avail = doc.groupBy("source").agg(sum(col("n_tok")).as("avail"))
        val quota = graft.ops.Sampling
          .waterFillQuota(avail, "source", "avail", 1L, 2L)
          .select(col("source"), col("quota"))
        graft.ops.Sampling.rankAndCumsum(doc, "source", "doc_id",
            -col("score"), col("n_tok"))
          .join(broadcast(quota), "source")
          .filter(col("cw") < col("quota"))
          .select(col("doc_id"), col("source"), col("w").as("n_tok"),
            (-col("score")).as("score"), col("cw").as("cum_before"))
    },

    // Streaming maintenance of the DSIR feature stats — the live-ingest
    // leg of the q162 family (the q122/q137 stream==batch discipline):
    // the target/raw bucket counts the importance weights are computed
    // from are RUNNING SUMS, so a live feed maintains them as streaming
    // aggregate state (≤4096 rows — bounded by the feature space, not
    // the corpus) and scoring always probes current stats without any
    // corpus re-aggregation. The oracle is the BATCH formulation over
    // the same rows — a green row is a machine proof the per-trigger
    // folds reach exactly the batch answer whatever the trigger
    // boundaries were. +1 smoothing is applied in bounded
    // post-processing (state stays pure sums, so folds are trivially
    // associative).
    Q("q166_stream_dsir_stats",
      s"""WITH $dsirCtes
         |SELECT b, CAST(1 + sum(tf) AS BIGINT) AS c_r,
         |       CAST(1 + coalesce(sum(CASE WHEN source = 'src1' THEN tf END), 0)
         |            AS BIGINT) AS c_t
         |FROM bkt JOIN documents USING (doc_id)
         |GROUP BY b""".stripMargin) {
      (s, d) =>
        val bkt = Indexes.bigramBuckets(s, d)
        val tgtDocs = table(s, d, "documents")
          .filter(col("source") === "src1")
          .select(col("doc_id"), lit(1).as("__tg"))
        val feed = bkt.join(broadcast(tgtDocs), Seq("doc_id"), "left")
          .select(col("doc_id"), col("b"), col("tf"),
            coalesce(col("__tg"), lit(0)).cast("int").as("is_tgt"))
        val scratch = java.nio.file.Files.createTempDirectory("graft_q166")
        val staging = s"$scratch/feats"
        feed.repartitionByRange(4, col("doc_id")).write.parquet(staging)
        val stream = s.readStream.schema(feed.schema)
          .option("maxFilesPerTrigger", 2).parquet(staging)
        val agg = stream.groupBy(col("b")).agg(
          sum(col("tf")).as("s_r"),
          sum(col("tf") * col("is_tgt")).as("s_t"))
        val sinkName = "q166_stream_dsir_sink"
        s.catalog.dropTempView(sinkName)
        // Outer finally owns the scratch dir (the q137 shape): the
        // drain `require` throwing must still remove the corpus-sized
        // staged feature dump — it only feeds the stream; the memory
        // sink holds the ≤4096 stats rows the result reads.
        try {
          val q = agg.writeStream.format("memory").queryName(sinkName)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          // awaitTermination returns FALSE on timeout without throwing —
          // unchecked, a timed-out stream would emit stats from the
          // completed triggers only: plausible-looking, silently wrong.
          try require(q.awaitTermination(300000),
            "q166: stream did not drain within 300s — partial stats")
          finally q.stop()
        } finally
          org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
        s.table(sinkName).select(col("b"),
          (col("s_r") + 1L).as("c_r"), (col("s_t") + 1L).as("c_t"))
    },

    // Incremental DSIR scoring — the production shape of q162 over an
    // arriving batch: feature stats LAG the corpus (rebuilt per
    // generation, not per batch), so new documents are scored as a
    // pure BROADCAST PROBE of the existing base-corpus stats and
    // gated at the base distribution's selection boundary (the
    // minimum score of the base top-25% — the q162 threshold frozen
    // as a scalar). Nothing corpus-sized re-aggregates when a batch
    // arrives: the batch's feature rows probe ≤4096 broadcast stats
    // rows, the boundary is a 1-row broadcast, and the base stats /
    // boundary are themselves one-time index-scan aggregates. Buckets
    // unseen in the base corpus contribute bits(1)−bits(1) = 0 —
    // exactly the +1-smoothed prior. Split is the q139 convention:
    // the newest tenth of doc_id space is "the batch".
    Q("q167_dsir_incremental",
      s"""WITH cut AS (SELECT (max(doc_id) * 9) // 10 AS c FROM documents),
         |bgr AS (
         |  SELECT doc_id, words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT)+1] AS bg
         |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |       unnest(generate_series(1, len(words)-1)) AS g(i)),
         |bkt AS (
         |  SELECT doc_id, ${h64("bg")} % 4096 AS b,
         |         CAST(count(*) AS BIGINT) AS tf
         |  FROM bgr GROUP BY 1, 2),
         |base AS (SELECT bkt.* FROM bkt, cut WHERE doc_id < c),
         |raw AS (SELECT b, 1 + sum(tf) AS c_r FROM base GROUP BY b),
         |tgt AS (SELECT b, 1 + sum(tf) AS c_t
         |        FROM base JOIN documents USING (doc_id)
         |        WHERE source = 'src1' GROUP BY b),
         |scb AS (
         |  SELECT base.doc_id,
         |         sum(tf * (length(bin(coalesce(c_t, 1))) - length(bin(c_r)))) AS score
         |  FROM base JOIN raw USING (b) LEFT JOIN tgt USING (b)
         |  GROUP BY 1),
         |allb AS (
         |  SELECT d.doc_id, CAST(coalesce(s.score, 0) AS BIGINT) AS score
         |  FROM (SELECT doc_id FROM documents, cut WHERE doc_id < c) d
         |  LEFT JOIN scb s ON s.doc_id = d.doc_id),
         |r AS (SELECT doc_id, score,
         |        CAST(row_number() OVER (ORDER BY score, doc_id) - 1 AS BIGINT) AS rnk,
         |        CAST(count(*) OVER () AS BIGINT) AS n
         |      FROM allb),
         |bnd AS (SELECT min(score) AS bscore FROM r
         |        WHERE (rnk * 1000000) // greatest(n - 1, 1) >= 750000),
         |scn AS (
         |  SELECT k.doc_id,
         |         sum(tf * (length(bin(coalesce(c_t, 1))) -
         |                   length(bin(coalesce(c_r, 1))))) AS score
         |  FROM (SELECT bkt.* FROM bkt, cut WHERE doc_id >= c) k
         |  LEFT JOIN raw USING (b) LEFT JOIN tgt USING (b)
         |  GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(s.score, 0) AS BIGINT) AS score,
         |       CAST(CASE WHEN coalesce(s.score, 0) >= bscore THEN 1 ELSE 0 END
         |            AS INT) AS selected
         |FROM (SELECT doc_id FROM documents, cut WHERE doc_id >= c) d
         |LEFT JOIN scn s ON s.doc_id = d.doc_id, bnd""".stripMargin) {
      (s, d) =>
        val docs = table(s, d, "documents")
        val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
        val cutoff = (mx * 9L) / 10L
        val bkt = Indexes.bigramBuckets(s, d)
        val base = bkt.filter(col("doc_id") < cutoff)
        val raw = base.groupBy("b").agg((sum(col("tf")) + 1L).as("c_r"))
        val tgtDocs = docs
          .filter(col("source") === "src1" && col("doc_id") < cutoff)
          .select("doc_id")
        val tgt = base.join(broadcast(tgtDocs), "doc_id")
          .groupBy("b").agg((sum(col("tf")) + 1L).as("c_t"))
        val stats = raw.join(tgt, Seq("b"), "left")
          .select(col("b"), col("c_r"),
            coalesce(col("c_t"), lit(1L)).as("c_t"))
        val scB = base.join(broadcast(stats), "b")
          .groupBy("doc_id")
          .agg(sum(col("tf") *
            (length(bin(col("c_t"))) - length(bin(col("c_r")))).cast("long"))
            .as("score"))
        val allB = docs.filter(col("doc_id") < cutoff).select("doc_id")
          .join(scB, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"),
            lit(0).as("__g"))
        val boundary = graft.ops.Sampling
          .rankNormalize(allB, "__g", "doc_id", col("score"))
          .filter(col("pct_ppm") >= 750000L)
          .agg(min(col("score")).as("__bnd"))
        val scN = bkt.filter(col("doc_id") >= cutoff)
          .join(broadcast(stats), Seq("b"), "left")
          .groupBy("doc_id")
          .agg(sum(col("tf") *
            (length(bin(coalesce(col("c_t"), lit(1L)))) -
              length(bin(coalesce(col("c_r"), lit(1L))))).cast("long"))
            .as("score"))
        docs.filter(col("doc_id") >= cutoff).select("doc_id")
          .join(scN, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"))
          .crossJoin(broadcast(boundary))
          .select(col("doc_id"), col("score"),
            (col("score") >= col("__bnd")).cast("int").as("selected"))
    })

  /** The DSIR importance score (q162's arithmetic) as CTEs ending in
    * `alldocs (doc_id, score)` — shared verbatim by the q162 and q165
    * oracles so the two cannot drift. */
  private def dsirCtes: String =
    s"""bgr AS (
       |  SELECT doc_id, words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT)+1] AS bg
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |       unnest(generate_series(1, len(words)-1)) AS g(i)),
       |bkt AS (
       |  SELECT doc_id, ${h64("bg")} % 4096 AS b,
       |         CAST(count(*) AS BIGINT) AS tf
       |  FROM bgr GROUP BY 1, 2),
       |raw AS (SELECT b, 1 + sum(tf) AS c_r FROM bkt GROUP BY b),
       |tgt AS (SELECT b, 1 + sum(tf) AS c_t
       |        FROM bkt JOIN documents USING (doc_id)
       |        WHERE source = 'src1' GROUP BY b),
       |sc AS (
       |  SELECT bkt.doc_id,
       |         sum(tf * (length(bin(coalesce(c_t, 1))) - length(bin(c_r)))) AS score
       |  FROM bkt JOIN raw USING (b) LEFT JOIN tgt USING (b)
       |  GROUP BY 1),
       |alldocs AS (
       |  SELECT d.doc_id, CAST(coalesce(sc.score, 0) AS BIGINT) AS score
       |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)""".stripMargin

  /** The integer water-fill over a `tok (source, avail)` CTE, ending
    * in `quota (source, avail, quota, fully_kept)` — the SQL mirror
    * of [[graft.ops.Sampling.waterFillQuota]] at budget = total/2,
    * shared by the q164 and q165 oracles. */
  private def quotaCtes: String =
    """tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |               CAST(coalesce(sum(avail), 0) AS BIGINT) AS t FROM tok),
      |par AS (SELECT n, t // 2 AS bud FROM tot),
      |ord AS (SELECT source, avail,
      |          CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS k,
      |          CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |            AS BIGINT) AS cb
      |        FROM tok),
      |pp AS (SELECT coalesce(max(k) FILTER (WHERE avail * (n - k + 1) + cb <= bud), 0) AS p
      |       FROM ord, par),
      |ab AS (SELECT CAST(coalesce(sum(avail) FILTER (WHERE k <= p), 0) AS BIGINT) AS absum
      |       FROM ord, pp),
      |lv AS (SELECT p, (bud - absum) // greatest(n - p, 1) AS lvl,
      |              (bud - absum) % greatest(n - p, 1) AS rest
      |       FROM pp, ab, par),
      |quota AS (
      |  SELECT source, avail,
      |         CAST(CASE WHEN k <= p THEN avail
      |              ELSE lvl + CASE WHEN k - p <= rest THEN 1 ELSE 0 END
      |              END AS BIGINT) AS quota,
      |         CAST(CASE WHEN k <= p THEN 1 ELSE 0 END AS INT) AS fully_kept
      |  FROM ord, lv)""".stripMargin

  /** The DSIR per-document importance score (shared by q162/q165):
    * tf-weighted Σ over the doc's hashed bigram buckets of
    * bits(c_target) − bits(c_raw) with +1 smoothing — the integer
    * bit-length log-likelihood ratio; 0 for docs with no bigrams.
    * The persisted hashed-feature table (doc_id, b, tf) is scanned by
    * the three consumers (raw stats, target stats, scoring); NO
    * per-doc bucket collapse anywhere — every use is a
    * collapse-invariant sum, so a (doc_id, b) groupBy would be a
    * corpus-sized shuffle buying nothing. Scoring is a BROADCAST
    * probe of the ≤4096-row stats table — the corpus never shuffles
    * on a feature key. */
  private[graft] def dsirScoreFrame(s: org.apache.spark.sql.SparkSession,
                                    d: String): org.apache.spark.sql.DataFrame = {
    val bkt = Indexes.bigramBuckets(s, d)
    val raw = bkt.groupBy("b").agg((sum(col("tf")) + 1L).as("c_r"))
    val tgtDocs = table(s, d, "documents")
      .filter(col("source") === "src1").select("doc_id")
    val tgt = bkt.join(broadcast(tgtDocs), "doc_id")
      .groupBy("b").agg((sum(col("tf")) + 1L).as("c_t"))
    val stats = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("c_r"), coalesce(col("c_t"), lit(1L)).as("c_t"))
    val sc = bkt.join(broadcast(stats), "b")
      .groupBy("doc_id")
      .agg(sum(col("tf") *
        (length(bin(col("c_t"))) - length(bin(col("c_r")))).cast("long"))
        .as("score"))
    table(s, d, "documents").select("doc_id")
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"))
  }
}
