package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.ops.Url

/** Crawl-frontier URL canonicalization ([[graft.ops.Url]]): the dedup
  * key a crawler computes before fetching, and the collapse report a
  * curation run reads per host. The harness ships no URLs, so — the
  * HtmlQueries fixture discipline — each document deterministically
  * grows a messy absolute URL from shared constants: consecutive
  * document PAIRS (uid = doc_id div 2) target the same resource under
  * different spellings (scheme/host case, `www.`, default ports,
  * duplicate slashes, `utm_*` noise, fragments, param order), except
  * where one member carries a genuinely different `:8080` port — the
  * negative control that canonicalization must NOT merge. */
object UrlQueries {

  /** The messy URL for one document (exactly mirrored by the `u`
    * CTE of [[urlCtes]]). */
  private[queries] def urlCol = {
    val uid = expr("doc_id div 2")
    val scheme = when(uid % 2 === 0, "HTTPS").otherwise("http")
    val www = when(col("doc_id") % 3 === 0, "WWW.").otherwise("")
    val port = when(col("doc_id") % 5 === 0,
        when(uid % 2 === 0, ":443").otherwise(":80"))
      .when(col("doc_id") % 7 === 0, ":8080")
      .otherwise("")
    val path = when(col("doc_id") % 11 === 0,
        concat(lit("/docs//page/"), uid))
      .otherwise(concat(lit("/docs/page/"), uid))
    val query = when(col("doc_id") % 2 === 0,
        concat(lit("?utm_source=feed&id="), uid, lit("&utm_campaign=x")))
      .otherwise(concat(lit("?id="), uid))
    val frag = when(col("doc_id") % 3 === 0, "#Top").otherwise("")
    concat(scheme, lit("://"), www,
      lit("Site-"), uid % 20, lit(".Example.COM"), port, path, query, frag)
  }

  /** Canonicalization chain over any relation bearing a URL column:
    * `${p}x` = parsed parts (scheme/auth/path/query), `$p` = carried
    * columns + (host, canon) — each rule the verbatim DuckDB mirror
    * of the [[graft.ops.Url]] expression chain. Parameterized so
    * q201 canonicalizes EXTRACTED link targets with the same text
    * the frontier queries gate — one chain, two instantiations. */
  private[queries] def canonOver(src: String, carried: Seq[String],
                                 u: String, p: String): String = {
    val cols = carried.mkString(", ")
    s"""${p}x AS (
       |  SELECT $cols,
       |         lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |         lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS auth,
       |         regexp_replace(regexp_extract($u,
       |           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/{2,}', '/', 'g') AS path,
       |         coalesce(array_to_string(list_sort(list_filter(
       |           string_split(coalesce(regexp_extract($u, '\\?([^#]*)', 1), ''), '&'),
       |           kv -> kv <> '' AND kv[1:4] <> 'utm_')), '&'), '') AS q
       |  FROM $src),
       |$p AS (
       |  SELECT $cols,
       |    regexp_replace(
       |      CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
       |           WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$$', '')
       |           ELSE auth END,
       |      '^www\\.', '') AS host,
       |    scheme || '://' ||
       |    regexp_replace(
       |      CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
       |           WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$$', '')
       |           ELSE auth END,
       |      '^www\\.', '') ||
       |    path ||
       |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canon
       |  FROM ${p}x)""".stripMargin
  }

  /** Fixture + canonicalization as SQL CTEs: `u` = (doc_id, url),
    * `c` = (doc_id, url, host, canon) via [[canonOver]].
    * (`private[queries]`: q181's pipeline composition reuses the
    * frontier layer verbatim.) */
  private[queries] val urlCtes: String =
    """u AS (
      |  SELECT doc_id,
      |    (CASE WHEN (doc_id // 2) % 2 = 0 THEN 'HTTPS' ELSE 'http' END) ||
      |    '://' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |    'Site-' || CAST((doc_id // 2) % 20 AS VARCHAR) || '.Example.COM' ||
      |    (CASE WHEN doc_id % 5 = 0
      |          THEN (CASE WHEN (doc_id // 2) % 2 = 0 THEN ':443' ELSE ':80' END)
      |          WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END) ||
      |    (CASE WHEN doc_id % 11 = 0 THEN '/docs//page/' ELSE '/docs/page/' END) ||
      |    CAST(doc_id // 2 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 2 = 0
      |          THEN '?utm_source=feed&id=' || CAST(doc_id // 2 AS VARCHAR) || '&utm_campaign=x'
      |          ELSE '?id=' || CAST(doc_id // 2 AS VARCHAR) END) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN '#Top' ELSE '' END) AS url
      |  FROM documents),""".stripMargin + "\n" +
      canonOver("u", Seq("doc_id", "url"), "url", "c")

  /** Robots fixture + RFC 9309 longest-match verdict as SQL CTEs
    * (references `u`): `up` = (doc_id, hn, path), `m` = per-doc
    * longest matching rule (length + allow bit); an unmatched URL
    * defaults to allowed. Shared by q184 (the verdict row) and q204
    * (the allowed-only schedule). */
  private val robotsCtes: String =
    """up AS (
      |  SELECT doc_id, (doc_id // 2) % 20 AS hn,
      |         regexp_replace(regexp_extract(url,
      |           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/{2,}', '/', 'g') AS path
      |  FROM u),
      |hosts AS (SELECT DISTINCT hn FROM up),
      |rules AS (
      |  SELECT hn, '/private/' AS p, 0 AS a FROM hosts
      |  UNION ALL SELECT hn, '/docs/', 0 FROM hosts WHERE hn % 3 = 0
      |  UNION ALL SELECT hn, '/docs/page/', 1 FROM hosts WHERE hn % 3 = 0
      |  UNION ALL SELECT hn, '/docs/page/1', 0 FROM hosts WHERE hn % 7 = 0),
      |m AS (
      |  SELECT up.doc_id,
      |         CAST(max(struct_pack(l := length(r.p), a := r.a)).l AS BIGINT) AS rule_len,
      |         max(struct_pack(l := length(r.p), a := r.a)).a AS mat_a
      |  FROM up JOIN rules r ON up.hn = r.hn AND starts_with(up.path, r.p)
      |  GROUP BY up.doc_id)""".stripMargin

  /** Spark side of [[robotsCtes]]: per-doc (doc_id, allowed,
    * rule_len) — broadcast per-host rules, ONE max(struct) argmax. */
  private def robotsVerdicts(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
    val ruleType = "array<struct<p:string,a:int>>"
    val up = table(s, d, "documents")
      .select(col("doc_id"), urlCol.as("url"))
      .select(col("doc_id"),
        (expr("doc_id div 2") % 20).as("hn"),
        Url.urlPath(col("url")).as("path"))
    val rules = up.select(col("hn")).distinct()
      .select(col("hn"), explode(concat(
        array(struct(lit("/private/").as("p"), lit(0).as("a"))),
        when(col("hn") % 3 === 0, array(
          struct(lit("/docs/").as("p"), lit(0).as("a")),
          struct(lit("/docs/page/").as("p"), lit(1).as("a"))))
          .otherwise(array().cast(ruleType)),
        when(col("hn") % 7 === 0, array(
          struct(lit("/docs/page/1").as("p"), lit(0).as("a"))))
          .otherwise(array().cast(ruleType)))).as("r"))
      .select(col("hn"), col("r.p").as("p"), col("r.a").as("a"))
    val matched = up.join(broadcast(rules), Seq("hn"))
      .filter(col("path").startsWith(col("p")))
      .groupBy("doc_id")
      .agg(max(struct(length(col("p")).as("l"), col("a").as("a"))).as("m"))
      .select(col("doc_id"),
        col("m.l").cast("bigint").as("rule_len"), col("m.a").as("mat_a"))
    up.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("mat_a"), lit(1)).cast("int").as("allowed"),
        coalesce(col("rule_len"), lit(0L)).as("rule_len"))
  }

  /** Anchor-tag regex shared by the link-graph rows (group 1 = href,
    * group 2 = anchor text). */
  private val AnchorRe = "<a href=\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Link-graph fixture + extraction CTEs ending in
    * `cc(doc_id, txt, canon)`; references `hx` (HTML skeleton) and
    * the [[urlCtes]] names `cx`/`c` (per-doc scheme/host), so callers
    * put both first in the WITH list. The chain: two doc-varying
    * messy absolute outlinks appended to every page (ks/pg), two-group
    * anchor extraction zipped by position (ax/e), relative hrefs
    * resolved against the page's own scheme+host (r), and targets
    * canonicalized by the SAME parameterized chain the frontier gates
    * ([[canonOver]]). One fixture shared by q201 (from-scratch stats)
    * and q202 (incremental merge) — two aggregation policies, zero
    * copies to keep in sync. */
  private val linkEdgeCtes: String =
    s"""ks AS (SELECT doc_id, (doc_id * 7 + 3) % 250 AS k1,
       |               (doc_id * 11 + 5) % 250 AS k2 FROM documents),
       |pg AS (SELECT hx.doc_id, hx.html ||
       |    '<div class="out"><a href="HTTP://Site-' || CAST(k1 % 20 AS VARCHAR) ||
       |    '.Example.COM/docs/page/' || CAST(k1 AS VARCHAR) ||
       |    '?utm_source=x&id=' || CAST(k1 AS VARCHAR) ||
       |    '">see doc ' || CAST(k1 AS VARCHAR) ||
       |    '</a> <a href="https://WWW.site-' || CAST(k2 % 20 AS VARCHAR) ||
       |    '.example.com:443/docs/page/' || CAST(k2 AS VARCHAR) ||
       |    '?id=' || CAST(k2 AS VARCHAR) ||
       |    '">ref ' || CAST(k2 AS VARCHAR) || '</a></div>' AS h
       |  FROM hx JOIN ks ON hx.doc_id = ks.doc_id),
       |ax AS (SELECT doc_id,
       |    regexp_extract_all(h, '$AnchorRe', 1) AS hrefs,
       |    regexp_extract_all(h, '$AnchorRe', 2) AS txts FROM pg),
       |e AS (SELECT ax.doc_id, hrefs[CAST(i AS INT)] AS href,
       |             txts[CAST(i AS INT)] AS txt
       |      FROM ax, unnest(generate_series(1, len(hrefs))) g(i)),
       |r AS (SELECT e.doc_id, e.txt,
       |      CASE WHEN contains(e.href, '://') THEN e.href
       |           ELSE cx.scheme || '://' || c.host || e.href END AS absu
       |      FROM e JOIN cx ON e.doc_id = cx.doc_id
       |             JOIN c ON e.doc_id = c.doc_id),
       |${canonOver("r", Seq("doc_id", "txt"), "absu", "cc")}""".stripMargin

  /** Spark side of [[linkEdgeCtes]]: the canonicalized edge list
    * (doc_id, txt, target) both link-graph rows aggregate — one map
    * pass + one explode, no shuffle before the caller's aggregate. */
  private def linkEdges(s: org.apache.spark.sql.SparkSession,
                        d: String): org.apache.spark.sql.DataFrame = {
    val k1 = (col("doc_id") * 7 + 3) % 250
    val k2 = (col("doc_id") * 11 + 5) % 250
    val out = concat(
      lit("<div class=\"out\"><a href=\"HTTP://Site-"),
      (k1 % 20).cast("string"), lit(".Example.COM/docs/page/"),
      k1.cast("string"), lit("?utm_source=x&id="), k1.cast("string"),
      lit("\">see doc "), k1.cast("string"),
      lit("</a> <a href=\"https://WWW.site-"),
      (k2 % 20).cast("string"), lit(".example.com:443/docs/page/"),
      k2.cast("string"), lit("?id="), k2.cast("string"),
      lit("\">ref "), k2.cast("string"), lit("</a></div>"))
    table(s, d, "documents")
      .select(col("doc_id"), urlCol.as("url"),
        concat(HtmlQueries.htmlCol, out).as("h"))
      .select(col("doc_id"), col("url"),
        regexp_extract_all(col("h"), lit(AnchorRe), lit(1)).as("hrefs"),
        regexp_extract_all(col("h"), lit(AnchorRe), lit(2)).as("txts"))
      .select(col("doc_id"), col("url"),
        explode(zip_with(col("hrefs"), col("txts"),
          (h, t) => struct(h.as("href"), t.as("txt")))).as("a"))
      .select(col("doc_id"),
        col("a.txt").as("txt"),
        Url.canonicalizeUrl(
          when(col("a.href").contains("://"), col("a.href"))
            .otherwise(concat(Url.urlScheme(col("url")), lit("://"),
              Url.urlHost(col("url")), col("a.href")))).as("target"))
  }

  val all: Seq[Q] = Seq(

    // Per-URL canonicalization: every RFC 3986 §6 rule plus the two
    // de-facto crawl rules (www., utm_*), as one codegen'd map pass.
    Q("q175_url_canonicalize",
      s"""WITH $urlCtes
         |SELECT doc_id, url, canon FROM c""".stripMargin) {
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .select(col("doc_id"), col("url"),
            Url.canonicalizeUrl(col("url")).as("canon"))
    },

    // The frontier collapse report per canonical host: raw spellings
    // seen, distinct raw URLs, distinct canonical targets — the
    // fetch-savings ledger (n_raw / n_canon ≈ 2 here by fixture
    // construction, except where the :8080 negative control keeps a
    // pair apart). One hash aggregate on the canonical host — the
    // q30 exact-dedup shape applied to the frontier.
    Q("q176_url_frontier",
      s"""WITH $urlCtes
         |SELECT host,
         |       CAST(count(*) AS BIGINT) AS n_urls,
         |       CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
         |       CAST(count(DISTINCT canon) AS BIGINT) AS n_canon
         |FROM c GROUP BY host""".stripMargin) {
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .select(col("url"),
            Url.urlHost(col("url")).as("host"),
            Url.canonicalizeUrl(col("url")).as("canon"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_urls"),
            countDistinct(col("url")).as("n_raw"),
            countDistinct(col("canon")).as("n_canon"))
    },

    // INCREMENTAL frontier: a new URL batch (the last 10% of doc ids)
    // against the SEEN canonical set (the first 90% — in production
    // the persisted frontier table). Emit one fetch per genuinely new
    // canonical target: anti-join the batch against seen, then
    // min-id per canon dedups WITHIN the batch. Steady-state cost is
    // ∝ batch plus one key anti-join against the frontier table —
    // the crawl loop's actual inner operation (a crawler never
    // re-canonicalizes its history per batch; it probes it). Same
    // exact-semantics shape as q01's anti insert, keyed on the
    // canonical form instead of a natural key.
    Q("q183_url_frontier_incremental",
      s"""WITH $urlCtes,
         |cut AS (SELECT (max(doc_id) * 9) // 10 AS k FROM documents),
         |seen AS (SELECT DISTINCT canon FROM c, cut WHERE doc_id < k),
         |batch AS (SELECT doc_id, canon FROM c, cut WHERE doc_id >= k)
         |SELECT canon, min(doc_id) AS doc_id
         |FROM batch b
         |WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.canon = b.canon)
         |GROUP BY canon""".stripMargin) {
      (s, d) =>
        val withCanon = table(s, d, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .select(col("doc_id"), Url.canonicalizeUrl(col("url")).as("canon"))
        val mx = withCanon.agg(max(col("doc_id"))).collect()(0).getLong(0)
        val cut = (mx * 9L) / 10L
        val seen = withCanon.filter(col("doc_id") < cut).select("canon")
        withCanon.filter(col("doc_id") >= cut)
          .join(seen, Seq("canon"), "left_anti")
          .groupBy("canon").agg(min(col("doc_id")).as("doc_id"))
    },

    // robots.txt gating — the fetch-permission step between frontier
    // and fetch, with the REP precedence rule that actually bites
    // (RFC 9309 §2.2.2): the LONGEST matching path rule wins, Allow
    // beats Disallow on a length tie, and a URL matching no rule is
    // allowed. The per-host rule table is synthesized
    // deterministically (every host disallows /private/; every third
    // host disallows /docs/ but allows the longer /docs/page/ — the
    // classic override; every seventh disallows the /docs/page/1
    // prefix — so a page can match three rules of three lengths and
    // only the longest decides). Scale shape: rules are a tiny
    // per-host table — BROADCAST equi-joined on host, prefix-filtered
    // in the stream side, then ONE max(struct(len, allow)) hash
    // argmax per URL (the q177 discipline: never a per-URL window);
    // unmatched URLs rejoin with the allow default. At 10¹² frontier
    // URLs this is a map-side join plus one aggregate.
    Q("q184_robots_gate",
      s"""WITH $urlCtes,
         |$robotsCtes
         |SELECT up.doc_id,
         |       CAST(coalesce(m.mat_a, 1) AS INT) AS allowed,
         |       coalesce(m.rule_len, 0) AS rule_len
         |FROM up LEFT JOIN m USING (doc_id)""".stripMargin) {
      (s, d) => robotsVerdicts(s, d)
    },

    // STREAMING frontier maintenance — the URL family's third leg
    // (batch q176, incremental q183, streaming here): URLs arrive in
    // paced file batches and the frontier state is a streaming
    // min(doc_id) aggregate per canonical form. min is chosen over
    // dropDuplicates deliberately: streaming dropDuplicates keeps
    // whichever row a partition happened to deliver first —
    // nondeterministic under task scheduling — while a min aggregate
    // is order-invariant, so the final state hash-matches the batch
    // answer under ANY trigger pacing (the stream==batch discipline).
    // State is bounded by the distinct-canon count, the same bound
    // the batch frontier table carries.
    Q("q185_stream_frontier",
      s"""WITH $urlCtes
         |SELECT canon, min(doc_id) AS doc_id FROM c GROUP BY canon""".stripMargin) {
      (s, d) =>
        val feed = table(s, d, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .select(col("doc_id"), Url.canonicalizeUrl(col("url")).as("canon"))
        val scratch = java.nio.file.Files.createTempDirectory("graft_q185")
        val staging = s"$scratch/urls"
        feed.repartitionByRange(4, col("doc_id")).write.parquet(staging)
        val stream = s.readStream.schema(feed.schema)
          .option("maxFilesPerTrigger", 2).parquet(staging)
        val agg = stream.groupBy(col("canon"))
          .agg(min(col("doc_id")).as("doc_id"))
        val sinkName = "q185_stream_frontier_sink"
        s.catalog.dropTempView(sinkName)
        try {
          val q = agg.writeStream.format("memory").queryName(sinkName)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try require(q.awaitTermination(300000),
            "q185: stream did not drain within 300s — partial frontier")
          finally q.stop()
        } finally
          org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
        s.table(sinkName).select(col("canon"), col("doc_id"))
    },

    // Crawl POLITENESS SCHEDULE: per canonical host, URLs get fetch
    // slots spaced CrawlDelaySec apart (RFC 9309's Crawl-delay
    // semantics) in deterministic doc_id order — the dispatch plan a
    // polite fetcher executes. The per-host rank comes from
    // Sampling.rankAndCumsum's two-phase decomposition (256 bounded
    // bucket offsets + one intra-bucket window), NEVER a host-global
    // sort partition: one viral host with 10⁹ frontier URLs must not
    // become a single straggler sort task — the same reason the quota
    // fill (q165) uses this machinery.
    Q("q199_crawl_schedule",
      s"""WITH $urlCtes,
         |r AS (SELECT doc_id, host,
         |        CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) - 1
         |             AS BIGINT) AS rnk
         |      FROM c)
         |SELECT doc_id, host, rnk, rnk * ${Url.CrawlDelaySec} AS slot_sec
         |FROM r""".stripMargin) {
      (s, d) =>
        val hosts = table(s, d, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .select(col("doc_id"), Url.urlHost(col("url")).as("host"))
        graft.ops.Sampling.rankAndCumsum(hosts, "host", "doc_id",
            scoreCol = col("doc_id"), weightCol = lit(1L))
          .select(col("doc_id"), col("host"), col("rnk"),
            (col("rnk") * Url.CrawlDelaySec).as("slot_sec"))
    },

    // LINK-GRAPH extraction: anchors out of the HTML fixture pages
    // (two-group regex extraction, hrefs and texts zipped by
    // position), relative hrefs RESOLVED against the page's own
    // scheme+host, targets canonicalized by the same chain the
    // frontier gates, then one aggregate per target — the edge list
    // q130's PageRank and anchor-text retrieval consume, produced
    // from raw markup in one map pass + one explode + one hash agg.
    // Per-target state is bounded (counts + min), never a
    // collect_list of a viral target's 10⁹ anchor texts. Fixture: the
    // page skeleton's constant nav/footer links exercise relative
    // resolution; two doc-varying messy absolute outlinks (built from
    // doc_id arithmetic in both engines) exercise canonicalization.
    Q("q201_link_graph",
      s"""WITH $urlCtes,
         |${HtmlQueries.hxCteOver("documents")},
         |$linkEdgeCtes
         |SELECT canon AS target, CAST(count(*) AS BIGINT) AS n_links,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT txt) AS BIGINT) AS n_anchors,
         |  min(txt) AS top_anchor
         |FROM cc GROUP BY canon""".stripMargin) {
      (s, d) =>
        linkEdges(s, d)
          .groupBy("target")
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_docs"),
            countDistinct(col("txt")).as("n_anchors"),
            min(col("txt")).as("top_anchor"))
    },

    // INCREMENTAL link-graph maintenance (the q182 lagged-update
    // discipline): the existing corpus's per-target edge stats are a
    // persisted table (modeled as stats over the first 90% of doc
    // ids); a page batch arrives and its stats MERGE by addition/min
    // — exact, because link and source-doc counts are additive over
    // disjoint crawl batches and the representative anchor is a min.
    // (Distinct-anchor counts are deliberately NOT in this row: they
    // are not additive across batches — the from-scratch q201 carries
    // them.) Steady-state cost ∝ batch; the only corpus-sized
    // artifact touched is the stats table's own key merge.
    Q("q202_link_graph_incremental",
      s"""WITH $urlCtes,
         |${HtmlQueries.hxCteOver("documents")},
         |$linkEdgeCtes
         |SELECT canon AS target, CAST(count(*) AS BIGINT) AS n_links,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  min(txt) AS top_anchor
         |FROM cc GROUP BY canon""".stripMargin) {
      (s, d) =>
        val edges = linkEdges(s, d)
        val mx = edges.agg(max(col("doc_id"))).collect()(0).getLong(0)
        val cut = mx * 9L / 10L
        def stats(df: org.apache.spark.sql.DataFrame, sfx: String) =
          df.groupBy("target").agg(
            count(lit(1)).as(s"nl$sfx"),
            countDistinct(col("doc_id")).as(s"nd$sfx"),
            min(col("txt")).as(s"ta$sfx"))
        val base = stats(edges.filter(col("doc_id") < cut), "_b")
        val batch = stats(edges.filter(col("doc_id") >= cut), "_n")
        base.join(batch, Seq("target"), "full")
          .select(col("target"),
            (coalesce(col("nl_b"), lit(0L)) + coalesce(col("nl_n"), lit(0L)))
              .as("n_links"),
            (coalesce(col("nd_b"), lit(0L)) + coalesce(col("nd_n"), lit(0L)))
              .as("n_docs"),
            least(coalesce(col("ta_b"), col("ta_n")),
              coalesce(col("ta_n"), col("ta_b"))).as("top_anchor"))
    },

    // Robots-gated politeness schedule — the dispatch plan a REAL
    // fetcher executes: q184's RFC 9309 verdict filters the frontier
    // to allowed URLs, THEN q199's per-host Crawl-delay slots are
    // assigned over the survivors (gating after scheduling would
    // leave holes in the slot sequence and under-use every host's
    // fetch budget — order matters, and this row pins it). Same
    // two-phase rank machinery; the verdict join keys on doc id.
    Q("q204_allowed_schedule",
      s"""WITH $urlCtes,
         |$robotsCtes,
         |al AS (SELECT up.doc_id, c.host
         |       FROM up JOIN c ON up.doc_id = c.doc_id
         |       LEFT JOIN m ON up.doc_id = m.doc_id
         |       WHERE coalesce(m.mat_a, 1) = 1),
         |r AS (SELECT doc_id, host,
         |        CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) - 1
         |             AS BIGINT) AS rnk
         |      FROM al)
         |SELECT doc_id, host, rnk, rnk * ${Url.CrawlDelaySec} AS slot_sec
         |FROM r""".stripMargin) {
      (s, d) =>
        val allowed = robotsVerdicts(s, d)
          .filter(col("allowed") === 1).select("doc_id")
        val hosts = table(s, d, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .select(col("doc_id"), Url.urlHost(col("url")).as("host"))
          .join(allowed, Seq("doc_id"))
        graft.ops.Sampling.rankAndCumsum(hosts, "host", "doc_id",
            scoreCol = col("doc_id"), weightCol = lit(1L))
          .select(col("doc_id"), col("host"), col("rnk"),
            (col("rnk") * Url.CrawlDelaySec).as("slot_sec"))
    }
  )
}
