package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Ops, Similarity}
import graft.functions.TextFunctions

/** Corpus-curation queries (graft.operators.Curation + hard-negative
  * mining) — the between-ingest-and-tokenize steps of a training-data
  * pipeline: benchmark decontamination, mixture rebalancing,
  * cross-document boilerplate gating, contrastive hard negatives, and
  * hybrid-retrieval rank fusion. Every query is hash-checked against a
  * full DuckDB replay (md5 hash family — same portability rules as
  * DedupPortableSql).
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** `CAST('0x' || substr(md5(x),1,n) AS BIGINT)` — DuckDB twin of
    * DedupPortable.md5Long / the Md5ShinglesExpr kernel hash.
    */
  private def md5Long(x: String, hexChars: Int = 15): String =
    s"CAST('0x' || substr(md5($x), 1, $hexChars) AS BIGINT)"

  /** Distinct hashed word-k-shingles per doc — DuckDB twin of
    * PortableExpr.md5Shingles (same shape as DedupPortableSql's d0).
    */
  private def shinglesCte(k: Int): String = {
    val cat = (0 until k).map(j => if (j == 0) "ws[i]" else s"ws[i+$j]")
      .mkString(" || ' ' || ")
    s"""SELECT doc_id, unnest(list_distinct(list_transform(
       |    list_transform(range(1, len(ws) - ${k - 2}), i -> $cat),
       |    g -> ${md5Long("g")}))) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)"""
      .stripMargin
  }

  /** Shared robots fixture + FULL RFC 9309 parse as DuckDB CTEs,
    * ending at `rl` (host, directive, pattern, plen, like_pat) — the
    * q261/q263 oracles concatenate this PRE-STRIPPED prelude (never
    * re-stripMargin it; the q260 lesson). Mirrors
    * Curation.robotsRules step for step: comment strip + first-colon
    * split via strpos/substr (= locate/substring), UA-run group ids
    * via the same two-step lag/sum window, exact-agent-over-star
    * group selection, and the identical pattern → LIKE ESCAPE '!'
    * translation.
    */
  private[queries] val RobotsRulesPreludeSql: String =
    """hosts AS (SELECT DISTINCT source FROM documents),
      |rob AS (SELECT source || '.example' AS host,
      |  '# robots fixture' || chr(10) || 'User-agent: otherbot' ||
      |    chr(10) || 'Disallow: /' || chr(10) || chr(10) ||
      |  CASE WHEN len(source) = 4 THEN
      |    'User-agent: graftbot' || chr(13) || chr(10) ||
      |    'User-Agent: graftbot-image' || chr(13) || chr(10) ||
      |    'Disallow: /private/*' || chr(13) || chr(10) ||
      |    'Allow: /private/*/pub$' || chr(13) || chr(10) ||
      |    'Disallow: /tmp$' || chr(13) || chr(10) ||
      |    'Disallow: /d_e/' || chr(13) || chr(10) ||
      |    'Allow:' || chr(13) || chr(10) ||
      |    'Crawl-delay: fast' || chr(13) || chr(10) ||
      |    'Crawl-delay: 2' || chr(13) || chr(10) ||
      |    chr(13) || chr(10) ELSE '' END ||
      |  'User-agent: *' || chr(10) || 'Disallow: /star/' || chr(10) ||
      |  'Crawl-delay: 7' || chr(10) ||
      |  CASE WHEN len(source) = 5 THEN 'Crawl-delay: 2.5625' || chr(10)
      |    ELSE '' END ||
      |  'Sitemap: https://' || source || '.example/sitemap.xml' ||
      |  chr(10) AS robots_txt FROM hosts),
      |ls0 AS (SELECT host, string_split(robots_txt, chr(10)) AS ls
      |  FROM rob),
      |lns AS (SELECT host, i AS ln, rtrim(ls[i], chr(13)) AS raw
      |  FROM ls0, LATERAL unnest(range(1, len(ls) + 1)) u(i)),
      |kv AS (SELECT host, ln, strpos(nc, ':') AS pos, nc FROM (
      |  SELECT host, ln, CASE WHEN strpos(raw, '#') > 0
      |    THEN substr(raw, 1, strpos(raw, '#') - 1) ELSE raw END AS nc
      |  FROM lns)),
      |kv2 AS (SELECT host, ln,
      |  lower(trim(CASE WHEN pos > 0 THEN substr(nc, 1, pos - 1)
      |    ELSE '' END)) AS k,
      |  trim(CASE WHEN pos > 0 THEN substr(nc, pos + 1)
      |    ELSE '' END) AS v FROM kv),
      |tg AS (SELECT host, ln, k, v, (k = 'user-agent') AS ua FROM kv2),
      |st AS (SELECT *, CASE WHEN ua AND NOT coalesce(
      |    lag(ua) OVER (PARTITION BY host ORDER BY ln), false)
      |  THEN 1 ELSE 0 END AS s FROM tg),
      |grp AS (SELECT *, sum(s) OVER (PARTITION BY host ORDER BY ln)
      |  AS g FROM st),
      |agents AS (SELECT DISTINCT host, g, lower(v) AS a FROM grp
      |  WHERE ua),
      |ex AS (SELECT DISTINCT host, g FROM agents WHERE a = 'graftbot'),
      |star AS (SELECT DISTINCT host, g FROM agents WHERE a = '*'),
      |chosen AS (SELECT * FROM ex UNION ALL
      |  SELECT s.* FROM star s WHERE NOT EXISTS (
      |    SELECT 1 FROM ex e WHERE e.host = s.host)),
      |rl AS (SELECT host, directive, pattern,
      |  CAST(len(pattern) AS BIGINT) AS plen,
      |  replace(replace(replace(replace(
      |    CASE WHEN right(pattern, 1) = '$'
      |      THEN substr(pattern, 1, len(pattern) - 1) ELSE pattern END,
      |    '!', '!!'), '%', '!%'), '_', '!_'), '*', '%') ||
      |  CASE WHEN right(pattern, 1) = '$' THEN '' ELSE '%' END
      |    AS like_pat
      |  FROM (SELECT gr.host, gr.k AS directive, gr.v AS pattern
      |    FROM grp gr JOIN chosen c ON gr.host = c.host AND gr.g = c.g
      |    WHERE gr.k IN ('allow', 'disallow')))""".stripMargin

  /** The q223 URL-normalization replay as reusable CTEs: given an
    * upstream CTE `u0($keys, t0)`, appends u1..u8 ending with
    * `u8($keys, url_norm)` — each step mirrors one rule of
    * Curation.urlNormalize (fragment strip, unreserved percent-decode
    * chain, scheme/authority lowercase, default-port strip, empty
    * path, tracking-param filter + sort). PRE-STRIPPED (concatenate,
    * never re-stripMargin — the q260 lesson). Shared by q223 and the
    * q268 frontier-canonicalization composition.
    */
  private[queries] def urlNormChainSql(keys: String): String = {
    val decChain = graft.operators.Curation.unreservedEncodings
      .foldLeft("nf") { case (acc, (e, d)) =>
        s"replace($acc, '$e', '$d')" }
    val track = graft.operators.Curation.trackingParamPattern
    s"""u1 AS (SELECT $keys, regexp_extract(t0, '^([^#]*)', 1) AS nf FROM u0),
       |u2 AS (SELECT $keys, $decChain AS dec FROM u1),
       |u3 AS (SELECT $keys, dec,
       |  lower(regexp_extract(dec, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |  regexp_replace(dec, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM u2),
       |u4 AS (SELECT $keys, dec, scheme, rest,
       |  lower(regexp_extract(rest, '^([^/?]*)', 1)) AS auth0 FROM u3),
       |u5 AS (SELECT $keys, dec, scheme, rest, auth0,
       |  regexp_replace(auth0, '\\.$$', '') AS auth1,
       |  substr(rest, length(auth0) + 1, length(rest)) AS pathq FROM u4),
       |u6 AS (SELECT $keys, dec, scheme, pathq,
       |  CASE WHEN scheme = 'http' THEN regexp_replace(auth1, ':80$$', '')
       |       WHEN scheme = 'https' THEN regexp_replace(auth1, ':443$$', '')
       |       ELSE auth1 END AS auth,
       |  regexp_extract(pathq, '^([^?]*)', 1) AS path0 FROM u5),
       |u7 AS (SELECT $keys, dec, scheme, auth,
       |  CASE WHEN path0 = '' AND auth <> '' THEN '/' ELSE path0 END AS path,
       |  array_to_string(list_sort(list_filter(
       |    string_split(substr(pathq, length(path0) + 2, length(pathq)), '&'),
       |    x -> x <> '' AND NOT regexp_matches(x, '$track'))), '&') AS q
       |  FROM u6),
       |u8 AS (SELECT $keys,
       |  CASE WHEN scheme = '' THEN dec
       |    ELSE scheme || '://' || auth || path ||
       |      CASE WHEN q <> '' THEN '?' || q ELSE '' END END AS url_norm
       |  FROM u7)""".stripMargin
  }

  /** The per-host robots fixture shared by q261/q263 — the Spark twin
    * of [[RobotsRulesPreludeSql]]'s `rob` CTE, byte for byte.
    */
  private[queries] def robotsFixture(d: DataFrame): DataFrame =
    d.select(col("source")).distinct().select(
      concat(col("source"), lit(".example")).as("host"),
      concat(
        lit("# robots fixture\nUser-agent: otherbot\nDisallow: /\n\n"),
        // the graftbot block is CRLF-terminated — RFC 9309 allows CR,
        // LF or CRLF, and real servers ship CRLF; a parser that
        // misses the \r strip voids every rule here and the q261/
        // q263/q264 oracles all shift
        when(length(col("source")) === 4, lit(
          "User-agent: graftbot\r\nUser-Agent: graftbot-image\r\n" +
            "Disallow: /private/*\r\nAllow: /private/*/pub$\r\n" +
            "Disallow: /tmp$\r\nDisallow: /d_e/\r\nAllow:\r\n" +
            "Crawl-delay: fast\r\nCrawl-delay: 2\r\n\r\n"))
          .otherwise(lit("")),
        lit("User-agent: *\nDisallow: /star/\nCrawl-delay: 7\n"),
        // len-5 hosts declare a FRACTIONAL delay whose ms value is
        // non-integral (2.5625 s = 2562.5 ms, dyadic so the double
        // product is exact) — the row that pins the floor convention
        // in crawlSchedule against a rounding cast (ADVICE r18)
        when(length(col("source")) === 5, lit("Crawl-delay: 2.5625\n"))
          .otherwise(lit("")),
        lit("Sitemap: https://"),
        col("source"), lit(".example/sitemap.xml\n")).as("robots_txt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Benchmark decontamination: docs whose 3-shingle overlap with the
    // held-out split (doc_id % 50 == 0 — the stand-in benchmark set)
    // crosses the threshold. Eval side broadcast; one per-doc agg.
    "q77_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.decontaminate(
          docs.filter($"doc_id" % 50 =!= 0),
          docs.filter($"doc_id" % 50 === 0),
          "doc_id", "text", k = 3, minShared = 4L)
        .orderBy($"doc_id")
    }),

    // Language-mixture rebalancing: deterministic md5-threshold sample
    // targeting ~40 docs per language (en is ~3x over-represented in
    // this corpus). Fractions computed in-plan from the count table —
    // narrow filter, no extra shuffle on the corpus side.
    "q78_lang_rebalance" -> ((s, dir) => {
      import s.implicits._
      Curation.rebalanceSample(t(s, dir, "documents"), "lang", "doc_id",
          perDomainTarget = 40L)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Per-doc n-gram novelty against a standing corpus: the fraction
    // of a new doc's distinct 5-shingles never seen before — the
    // dedup-pressure / freshness metric a crawl scheduler reads (a
    // source whose novelty collapses is re-crawling known content).
    // Docs with doc_id % 10 == 0 play the standing corpus, the rest
    // the new batch. Seen-set = one hash-agg; membership = one
    // h-keyed left join; counts exact, one rounded division.
    "q256_ngram_novelty" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.ngramNovelty(docs.filter($"doc_id" % 10 =!= 0),
          docs.filter($"doc_id" % 10 === 0), "doc_id", "text", k = 5)
        .orderBy($"doc_id")
    }),

    // robots.txt-aware crawl-frontier filtering (RFC 9309; VERDICT r16
    // #8): per-host robots bodies are PARSED (comment strip, first-
    // colon key split, consecutive-User-agent group runs, exact-agent-
    // over-star group selection) into a rule table, URLs take the
    // longest-match verdict with allow winning ties. The fixture
    // exercises: case-insensitive agent match ('GraftBot' vs
    // 'graftbot'), a two-UA-line group run, * wildcards, $ anchors,
    // an empty Allow (matches everything at the lowest precedence),
    // a literal '_' that must NOT wildcard under the LIKE translation
    // (escape '!'), and hosts WITHOUT a graftbot group falling back to
    // the * group (len-5 sources). Output: per-(source, rule) verdict
    // counts — wrong group selection, precedence, or escaping all
    // shift rows across rule attributions.
    "q261_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val rules = Curation.robotsRules(robotsFixture(d), "host",
        "robots_txt", "GraftBot")
      val urls = d.select($"doc_id", $"source",
        concat($"source", lit(".example")).as("host"),
        when($"doc_id" % 6 === 0, concat(lit("/private/"), $"lang",
            lit("/pub")))
          .when($"doc_id" % 6 === 1, concat(lit("/private/"), $"lang"))
          .when($"doc_id" % 6 === 2, lit("/tmp"))
          .when($"doc_id" % 6 === 3, concat(lit("/tmp/"), $"source"))
          // the _ pair pins LIKE escaping BOTH ways: /d_e/x must match
          // the literal '_' rule, /dxe/x must NOT (an unescaped LIKE
          // '_' would match it and flip the verdict)
          .when($"doc_id" % 12 === 4, lit("/d_e/x"))
          .when($"doc_id" % 12 === 10, lit("/dxe/x"))
          .otherwise(lit("/star/s")).as("path"))
      Curation.robotsFilter(urls, "doc_id", "host", "path", rules)
        .join(urls.select($"doc_id", $"source"), "doc_id")
        .groupBy($"source", $"directive", $"rule", $"allowed")
        .agg(count(lit(1)).as("n_urls"))
        .orderBy($"source", $"directive", $"rule", $"allowed")
    }),

    // The closed crawl loop (q262's seed list made concrete): per-host
    // sitemap XML bodies — sitemapindex files for len-4 sources,
    // urlset files for the rest — parsed by the RE2-contract <loc>
    // extractor, paths stripped of the scheme+host prefix, every loc
    // verdict-ed through the SAME robots rule table as q261. Pins the
    // root-element kind detection, whitespace-tolerant loc trimming,
    // nested-index gating (sitemap FILES are robots-gated too), and
    // that /star/s from a sitemap is denied for star-group hosts.
    "q263_crawl_loop" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val rules = Curation.robotsRules(robotsFixture(d), "host",
        "robots_txt", "GraftBot")
      val sm = d.select($"source").distinct().select(
        concat($"source", lit(".example")).as("host"),
        when(length($"source") === 4, concat(
          lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n" +
            "  <sitemap><loc> https://"), $"source",
          lit(".example/sm1.xml </loc></sitemap>\n  <sitemap><loc>" +
            "https://"), $"source",
          lit(".example/sm2.xml</loc></sitemap>\n</sitemapindex>\n"))
          ).otherwise(concat(
          lit("<?xml version=\"1.0\"?>\n<urlset>\n  <url><loc> " +
            "https://"), $"source",
          lit(".example/private/en/pub </loc>" +
            "<lastmod>2026-01-01</lastmod></url>\n  <url><loc>" +
            "https://"), $"source",
          lit(".example/tmp</loc></url>\n  <url><loc>https://"),
          $"source",
          lit(".example/star/s</loc></url>\n  <url><loc>https://"),
          $"source",
          lit(".example/open/a</loc></url>\n</urlset>\n"))).as("xml"))
      val locs = Curation.sitemapLocs(sm, "host", "xml")
        .withColumn("path", expr("replace(loc, 'https://' || host, '')"))
      Curation.robotsFilter(locs.select($"loc", $"host", $"path"),
          "loc", "host", "path", rules)
        .join(locs.select($"loc", $"kind"), "loc")
        .groupBy($"host", $"kind", $"allowed")
        .agg(count(lit(1)).as("n_locs"),
          array_join(array_sort(collect_list($"path")), "|").as("paths"))
        .orderBy($"host", $"kind", $"allowed")
    }),

    // Crawl-delay politeness (the de-facto Bing/Yandex extension):
    // min delay across the agent's chosen groups; the bogus
    // 'Crawl-delay: fast' line pins try_cast tolerance, and the two
    // delay populations pin group selection again (graftbot hosts 2.0
    // vs star-fallback hosts 7.0). These same lines sit in the
    // q261/q263 fixture, where the rule parser must IGNORE them
    // (unknown-key tolerance, oracle-checked there).
    "q264_crawl_delay" -> ((s, dir) => {
      import s.implicits._
      Curation.robotsCrawlDelays(robotsFixture(t(s, dir, "documents")),
          "host", "robots_txt", "GraftBot")
        .orderBy($"host")
    }),

    // Sitemap declarations from the same robots bodies (group-
    // independent per the RFC) — the other half of the crawl-loop
    // feedback (robots gate + sitemap seed list).
    "q262_robots_sitemaps" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val robots = d.select($"source").distinct().select(
        concat($"source", lit(".example")).as("host"),
        concat(lit("User-agent: *\nDisallow: /star/  # gated\n"),
          lit("Sitemap: https://"), $"source",
          lit(".example/sitemap.xml\n# Sitemap: https://commented.out\n"),
          when(length($"source") === 4, concat(lit("sitemap: https://"),
            $"source", lit(".example/extra.xml\n"))).otherwise(lit("")))
          .as("robots_txt"))
      Curation.robotsSitemaps(robots, "host", "robots_txt")
        .groupBy($"host").agg(count(lit(1)).as("n_sitemaps"),
          array_join(array_sort(collect_list($"sitemap")), "|")
            .as("sitemaps"))
        .orderBy($"host")
    }),

    // Full sitemap-entry parse with the freshness fields a scheduler
    // consumes (VERDICT r18 missing #3 — Curation.sitemapEntries):
    // <lastmod>/<changefreq>/<priority> per <url>/<sitemap> block,
    // the declared-freshness seed for crawlSchedule before any
    // capture history exists (PipelineSpec wires the composition).
    // Fixture pins: whitespace-tolerant loc, UPPER-case changefreq
    // lowered, junk priority nulled by try_cast, a loc-less block
    // dropped, absent fields null, and the <sitemap> block arm via
    // len-4 hosts' sitemapindex bodies (lastmod on an index entry —
    // the nested-sitemap recrawl hint). Narrow block split + per-field
    // regexp, zero shuffles (the sitemapLocs posture).
    "q276_sitemap_freshness" -> ((s, dir) => {
      import s.implicits._
      val sm = t(s, dir, "documents").select($"source").distinct().select(
        concat($"source", lit(".example")).as("host"),
        when(length($"source") === 4, concat(
          lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n  <sitemap>" +
            "<loc> https://"), $"source",
          lit(".example/sm1.xml </loc><lastmod>2026-03-03</lastmod>" +
            "</sitemap>\n</sitemapindex>\n")))
          .otherwise(concat(
            lit("<?xml version=\"1.0\"?>\n<urlset>\n  <url><loc> " +
              "https://"), $"source",
            lit(".example/a </loc><lastmod>2026-01-0"),
            length($"source").cast("string"),
            lit("</lastmod><changefreq>DAILY</changefreq>" +
              "<priority>0.8</priority></url>\n  <url><loc>https://"),
            $"source",
            lit(".example/b</loc><changefreq>weekly</changefreq>" +
              "</url>\n  <url><lastmod>2026-02-02</lastmod></url>\n" +
              "  <url><loc>https://"),
            $"source",
            lit(".example/c</loc><priority>junk</priority></url>\n" +
              "</urlset>\n"))).as("xml"))
      Curation.sitemapEntries(sm, "host", "xml")
        .orderBy($"host", $"loc")
    }),

    // Per-source Jensen-Shannon divergence against the corpus unigram
    // distribution — the mixture-design statistic (a source with high
    // JSD is lexically unlike the blend; Lin 1991). Decomposed so the
    // work is linear in each source's SUPPORT: the off-support half of
    // KL(corpus||mix) collapses to ln2·(1−Σ_support q). Per-word terms
    // are fixed-order doubles quantized decimal(30,12) pre-sum (the LM
    // family discipline), so the exact sum is partition-order-free and
    // the oracle replays it bit-for-bit. Plan: two word-keyed
    // hash-aggs, one vocab-keyed equi-join, per-source hash-agg;
    // totals are 1-row broadcasts.
    "q254_source_jsd" -> ((s, dir) => {
      import s.implicits._
      Curation.unigramJsd(t(s, dir, "documents"), "source", "text")
        .orderBy($"source")
    }),

    // Temperature-resampled mixture (Curation.temperatureRebalance):
    // language l gets share n_l^α / Σ n^α of a total budget — the
    // mT5/UNIMAX multilingual mixing rule (α between 0 and 1 boosts
    // tail languages without flattening the head). α = 0.5 here
    // because pow(x, 0.5) is the sqrt special case in BOTH engines'
    // libm (fdlibm/glibc), so the per-row md5 threshold replays
    // bit-exactly; other α values are engine-internal only.
    "q252_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      Curation.temperatureRebalance(t(s, dir, "documents"), "lang",
          "doc_id", totalTarget = 250L, alpha = 0.5)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Cross-document boilerplate share: fraction of a doc's distinct
    // 5-shingles seen in >= 2 docs corpus-wide; keep if <= 0.5 (near
    // duplicates and template pages fail). Two hash-aggs, (long,long)
    // shuffle payloads.
    "q74_boilerplate_share" -> ((s, dir) => {
      import s.implicits._
      Curation.boilerplateShare(t(s, dir, "documents"), "doc_id", "text",
          k = 5, minDf = 2L, maxShare = 0.5)
        .select($"doc_id", $"n_shingles", $"n_boiler",
          round($"boiler_share", 4).as("boiler_share"), $"keep")
        .orderBy($"doc_id")
    }),

    // Hard-negative mining: per anchor (vec_id % 64 == 0), top-3 most
    // cosine-similar vectors with a DIFFERENT label. Anchors broadcast,
    // one corpus scan, per-anchor window top-k.
    "q75_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter($"vec_id" % 64 === 0),
          "vec_id", "embedding", "label", k = 3)
        .select($"anchor_id", $"vec_id", round($"sim", 4).as("sim"), $"rk")
        .orderBy($"anchor_id", $"rk")
    }),

    // Context-window chunking: 32-token windows every 24 tokens per
    // doc (8-token overlap) — narrow generator, zero shuffles; chunk
    // text travels as an md5-prefix fingerprint.
    "q79_doc_chunks" -> ((s, dir) => {
      import s.implicits._
      Curation.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Sequence packing: per-source quality-ordered docs assigned to
    // consecutive 2048-token training bins. One window shuffle.
    "q80_seq_pack" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"source",
        TextFunctions.qualityScore($"text").as("quality"),
        TextFunctions.bpeTokenEstimate($"text").cast("long").as("toks"))
      Curation.packSequences(docs, "source",
          Seq($"quality".desc, $"doc_id".asc), "toks", binTokens = 2048L)
        .select($"doc_id", $"source", $"toks", $"bin")
        .orderBy($"doc_id")
    }),

    // Reciprocal-rank fusion of two retrieval signals over bounded
    // top-100 pools: BM25 (q64's scorer, shared code) and the quality
    // score. Pools are TakeOrdered-bounded BEFORE the rank windows, so
    // no full-corpus single-partition sort exists in the plan.
    "q76_rrf_fusion" -> ((s, dir) => {
      import s.implicits._
      def pool(scored: DataFrame, sc: String): DataFrame = {
        val top = scored.orderBy(col(sc).desc, $"doc_id".asc).limit(100)
        top.withColumn("rk", row_number().over(
            Window.orderBy(col(sc).desc, $"doc_id".asc)))
          .select($"doc_id", $"rk")
      }
      val bm = pool(TextQueries.bm25Scored(s, dir), "score")
      val ql = pool(t(s, dir, "documents")
        .select($"doc_id", TextFunctions.qualityScore($"text").as("q")), "q")
      val fused = Curation.rrfFuse(Seq(bm, ql), "doc_id")
      val top = fused.orderBy($"rrf".desc, $"doc_id".asc).limit(20)
      top.withColumn("rk", row_number().over(
          Window.orderBy($"rrf".desc, $"doc_id".asc)))
        .select($"doc_id", round($"rrf", 6).as("rrf"), $"rk")
        .orderBy($"rk")
    }),

    // Global row enumeration (Ops.assignIds): contiguous 0-based ids
    // in doc_id order WITHOUT the single-task row_number() OVER
    // (ORDER BY) trap — range partition + zipWithIndex. The oracle is
    // the SQL form it replaces.
    "q100_assign_ids" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Ops.assignIds(
          t(s, dir, "documents").select($"doc_id", $"lang"),
          Seq($"doc_id"))
        .select($"row_id", $"doc_id", $"lang")
        .orderBy($"row_id")
    }),

    // Deterministic train/val/test split (Ops.hashSplit, portable md5
    // threshold convention): per-split counts + per-split lang spread
    // prove assignment and stability; the split column itself is
    // hash-exact against the DuckDB replay.
    "q101_hash_split" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Ops.hashSplit(
          t(s, dir, "documents").select($"doc_id", $"lang"),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          salt = "v1")
        .groupBy($"split")
        .agg(count(lit(1)).as("n"),
          countDistinct($"lang").as("n_langs"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy($"split")
    }),

    // Dataset-release manifest: per training shard (the q166
    // deterministic shuffle assignment), row count, token budget, and
    // an ORDER-INVARIANT content fingerprint — the exact decimal sum
    // of per-row md5 draws over (id, md5(text)), so any engine, any
    // partitioning, any row order reproduces the same 38-digit
    // integer. This is the integrity record a 100 TB release ships
    // with: a consumer re-running the manifest query over a shard
    // proves bit-level content identity without ordering guarantees.
    // One hash-agg with map-side partials; zero windows beyond the
    // shard assignment itself.
    "q214_shard_manifest" -> ((s, dir) => {
      import s.implicits._
      // The fingerprint leaves the operator as decimal(38,0) (the
      // exact-merge type the streaming twin needs) but ships as a
      // canonical digit string: raw wide-decimal output columns proved
      // driver-environment-sensitive three rounds straight (r13
      // VERDICT directive #1; DecimalCanonSpec pins the rendering).
      Ops.shardManifest(
          t(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", nShards = 8, seed = "rel1")
        .withColumn("fingerprint", $"fingerprint".cast("string"))
        .orderBy($"shard")
    }),

    // Atomic first-fit bin packing (Ops.binPack — the PAD-regime
    // training-batch assembly, vs q80's cumulative-offset CONCAT
    // regime): documents into 90-whitespace-token contexts,
    // md5-sharded 8 ways, first-fit in ascending-id order. budget=90
    // sits inside the fixture's 10-99 token range, so both regimes
    // are exercised: multi-doc bins AND oversized docs (>90 tokens)
    // sitting alone in their own bin. The assignment is a pure
    // function of (doc_id, shards, budget) — the oracle recomputes it
    // with a recursive CTE walking each shard in the same order. ONE
    // hash shuffle + in-partition sort + one sequential pass
    // (ScaleSpec gates the shape).
    "q285_bin_pack" -> ((s, dir) => {
      import s.implicits._
      Ops.binPack(
          t(s, dir, "documents").select($"doc_id",
            size(split($"text", " ")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", budget = 90L, shards = 8)
        .orderBy($"doc_id")
    }),

    // Packing-efficiency report (the manifest a q285 packing run
    // ships with — the number a 100 TB batch-assembly job is judged
    // on): per shard, contexts built, docs packed, token totals, and
    // exact integer utilization (sum_tokens·10⁶ div n_bins·budget;
    // an oversized solo doc can push a bin past budget, so padding
    // waste clamps at 0 per bin). Composition row: binPack → one
    // (shard, bin) hash-agg → one shard hash-agg.
    "q286_pack_efficiency" -> ((s, dir) => {
      import s.implicits._
      val budget = 90L
      Ops.binPack(
          t(s, dir, "documents").select($"doc_id",
            size(split($"text", " ")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", budget = budget, shards = 8)
        .groupBy($"shard", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("fill"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_bins"),
          sum($"n_docs").as("n_docs"),
          sum($"fill").as("sum_tokens"),
          sum(greatest(lit(budget) - $"fill", lit(0L))).as("padding"))
        .withColumn("util_e6",
          expr(s"sum_tokens * 1000000L div (n_bins * $budget)"))
        .orderBy($"shard")
    }),

    // Release-gate manifest diff (Ops.manifestDiff over two
    // Ops.shardManifest runs): the old release misses the doc_id%97
    // residue class AND its shard-7 manifest row (a lost shard), so
    // the diff must report shard 7 'added', the shards the missing
    // docs hashed into 'changed' with exact row/token deltas, and any
    // untouched shard 'unchanged'. Fingerprints ship as canonical
    // digit strings (the q198/q202/q214 driver-proofing convention).
    // The diff itself joins two 8-row relations — data never rescans.
    // Incremental manifest maintenance (VERDICT r14 #7): the daily
    // release loop — a standing manifest (yesterday = every doc not in
    // the %11 residue class) folded forward with today's delta batch
    // via Ops.manifestUpdate (one hash-agg over ONLY the delta +
    // the exact additive merge), then diffed against yesterday. The
    // merge is exact by construction, so `new_*` equals a full-corpus
    // rebuild and the diff shows precisely which shards today's batch
    // touched and by how many rows/tokens.
    // DSIR importance resampling (Curation.dsirSelect): src0 is the
    // "curated" target; every other doc gets a hashed-bigram (512
    // bins) log importance weight ln p_target/p_raw, then Gumbel-top-k
    // (the paper's sampling-without-replacement trick) picks 60 docs
    // with the deterministic md5-uniform perturbation. Both the weight
    // and the perturbed score are exact decimals, so rank AND score
    // replay bit-for-bit in the oracle.
    "q240_dsir_select" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.dsirSelect(docs, "doc_id", "text",
          $"source" === "src0", k = 60, buckets = 512)
        .select($"doc_id", $"n_feat",
          round($"logw".cast("double"), 6).as("logw"),
          round($"score".cast("double"), 6).as("score"), $"rk")
        .orderBy($"rk")
    }),

    "q239_manifest_update" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val standing = Ops.shardManifest(docs.filter($"doc_id" % 11 =!= 0),
        "doc_id", "text", nShards = 8, seed = "rel2")
      val updated = Ops.manifestUpdate(standing,
        docs.filter($"doc_id" % 11 === 0), "doc_id", "text",
        nShards = 8, seed = "rel2")
      Ops.manifestDiff(standing, updated)
        .select($"shard", $"status", $"old_rows", $"new_rows",
          $"d_rows", $"d_tokens",
          $"old_fp".cast("string").as("old_fp"),
          $"new_fp".cast("string").as("new_fp"))
        .orderBy($"shard")
    }),

    "q231_manifest_diff" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val oldRel = Ops.shardManifest(docs.filter($"doc_id" % 97 =!= 0),
          "doc_id", "text", nShards = 8, seed = "rel1")
        .filter($"shard" =!= 7)
      val newRel = Ops.shardManifest(docs, "doc_id", "text",
        nShards = 8, seed = "rel1")
      Ops.manifestDiff(oldRel, newRel)
        .select($"shard", $"status", $"old_rows", $"new_rows",
          $"d_rows", $"d_tokens",
          $"old_fp".cast("string").as("old_fp"),
          $"new_fp".cast("string").as("new_fp"))
        .orderBy($"shard")
    }),

    // BM25 sparse retrieval (Curation.bm25TopK): every 100th document's
    // first 5 tokens form a query; top-5 docs per query by the Lucene
    // BM25 variant. The query doc itself should rank — self-retrieval
    // is the sanity property the spec pins. Per-term contributions
    // quantize to decimal(30,12) before the per-pair sum and ranking
    // compares the exact decimal, so both engines replay rank AND
    // score bit-for-bit (the q132 ln-ULP precedent).
    "q232_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val qs = docs.filter($"doc_id" % 100 === 0)
        .select($"doc_id".as("query_id"),
          array_join(slice(filter(split($"text", " "), t => t =!= ""),
            1, 5), " ").as("qtext"))
      // maxDfFrac=1.0 HERE ONLY: the synthetic corpus draws from a
      // ~31-word vocabulary, so every term sits in >50% of docs and
      // the production default (0.5) would cut the entire query — BM25
      // still discriminates via tf and dl. Real crawls keep the cut.
      Curation.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext",
          k = 5, maxDfFrac = 1.0)
        .orderBy($"query_id", $"rk")
    }),

    // Probability-calibration report + exact Brier decomposition: the
    // model-eval step a training pipeline runs on every scored
    // snapshot. Predicted probability is a 2-decimal rational
    // (p = k/100), so every squared error (p - y)² has denominator
    // 10⁴ — the per-bin Brier numerator Σ(100p - 100y)² is an exact
    // integer tally (decimal-accumulated per repo convention) and the
    // final division is the only float op. |bins| = 10 rows of
    // metadata from ONE scan; nothing here grows with the data.
    "q215_calibration_brier" -> ((s, dir) => {
      import s.implicits._
      val scored = t(s, dir, "customer").select(
        pmod($"c_custkey" * 37, lit(100)).cast("long").as("p100"),
        when($"c_acctbal" > 0, 1L).otherwise(0L).as("y"))
      scored
        .withColumn("bin", floor($"p100" / 10.0).cast("int"))
        .groupBy($"bin").agg(
          count(lit(1)).as("n"),
          sum($"p100").as("sp"),
          sum($"y").as("positives"),
          sum((($"p100" - $"y" * 100) * ($"p100" - $"y" * 100))
            .cast("decimal(38,0)")).as("sq"))
        .select($"bin", $"n",
          round($"sp".cast("double") / ($"n" * 100), 4).as("mean_pred"),
          $"positives",
          round($"positives".cast("double") / $"n", 4).as("frac_pos"),
          round($"sq".cast("double") / ($"n" * 10000), 6).as("brier"))
        .orderBy($"bin")
    }),

    // PII scrubbing (Curation.redactPii): the synthetic corpus carries
    // no PII, so the query plants a deterministic email / IPv4 / SSN /
    // phone quartet derived from doc_id (identical expression on both
    // engines), scrubs it, and emits redacted text + per-category
    // counts. Entirely narrow codegen'd regexp work — zero shuffles.
    "q109_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val id = $"doc_id".cast("string")
      val withPii = t(s, dir, "documents").select($"doc_id",
        concat($"text",
          lit(" contact user"), id, lit("@example.com from 10."),
          ($"doc_id" % 256).cast("string"), lit(".0.1 ssn "),
          lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(($"doc_id" % 100).cast("string"), 2, "0"), lit("-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"), lit(" call 555-"),
          lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")).as("text"))
      Curation.redactPii(withPii, "text")
        .select($"doc_id", $"text", $"n_email", $"n_ipv4", $"n_ssn", $"n_phone")
    }),

    // Exact segment dedup (Lee et al. EXACTSUBSTR at 20-token windows):
    // first global occurrence of each distinct segment survives, docs
    // are rebuilt from their retained segments. Hub-safe hash-agg
    // first-occurrence + dup-class join (r15) + one per-doc agg;
    // hash-exact replay incl. the reassembled text (the oracle keeps
    // the bit-equal rank-window form).
    "q111_segment_dedup" -> ((s, dir) => {
      import s.implicits._
      Curation.segmentDedup(t(s, dir, "documents"), "doc_id", "text",
          segTokens = 20)
        .select($"id".as("doc_id"), $"n_segs", $"n_kept", $"retained")
        .orderBy($"doc_id")
    }),

    // URL canonicalization over a deterministic hostile-URL corpus
    // derived from documents (upper-case scheme/host, default port,
    // %6f-encoded path octet, tracking params, fragments, unsorted
    // query, empty query) — every rule lands in at least one doc_id
    // residue class. Oracle replays the identical corpus construction
    // and every normalization stage, with the percent-decode replace
    // chain GENERATED from the same (encoded, decoded) list.
    "q223_urlnorm" -> ((s, dir) => {
      import s.implicits._
      val url = concat(lit("HTTP://WWW.EXAMPLE-"), $"source",
        lit(".COM:80/D%6fC/"), $"doc_id".cast("string"),
        when($"doc_id" % 4 === 0,
            lit("?utm_source=feed&b=2&a=1&gclid=x#frag"))
          .when($"doc_id" % 4 === 1, lit("?z=%7E1&A=2#x"))
          .when($"doc_id" % 4 === 2, lit(""))
          .otherwise(lit("?utm_campaign=c&utm_medium=m")))
      t(s, dir, "documents").select($"doc_id",
          Curation.urlNormalize(url).as("url_norm"))
        .orderBy($"doc_id")
    }),

    // Frontier URL canonicalization (the crawl loop's missing first
    // step, q223 composed into the q258 extraction): every page links
    // the SAME resource twice under different spellings — uppercase
    // host vs uppercase scheme + explicit :443, a %6F-encoded path
    // octet vs its literal, tracking params + unsorted query vs
    // sorted + a fragment — plus one genuinely distinct link. Without
    // urlNormalize the frontier sees 2 distinct URLs per resource
    // (double-fetch = wasted politeness budget); with it the variants
    // collapse, so per source n_resources < n_raw_distinct, pinned
    // exactly. Narrow kernel map + explode + one hash-agg with two
    // distinct-counts.
    "q268_frontier_urlnorm" -> ((s, dir) => {
      import s.implicits._
      val id = $"doc_id".cast("string")
      val page = concat(
        lit("<p><a href=\"https://"), upper($"source"),
        lit(".example/d%6Fc/"), id,
        lit("?utm_source=feed&b=2&a=1\">x</a> <a href=\"HTTPS://"),
        $"source", lit(".EXAMPLE:443/doc/"), id,
        lit("?a=1&b=2#frag\">y</a> <a href=\"https://"), $"source",
        lit(".example/other/"), ($"doc_id" % 7).cast("string"),
        lit("\">z</a></p>"))
      t(s, dir, "documents")
        .select($"source",
          explode(graft.functions.HtmlExpr.anchorHrefs(page)).as("href"))
        .select($"source", $"href",
          Curation.urlNormalize($"href").as("u"))
        .groupBy($"source").agg(count(lit(1)).as("n_links"),
          countDistinct($"href").as("n_raw_distinct"),
          countDistinct($"u").as("n_resources"))
        .orderBy($"source")
    }),

    // Variable-span EXACTSUBSTR (q111's fixed 20-token windows at
    // multi-granularity 100/50/20 with containment collapse): per doc,
    // the merged duplicated-token spans — a long repeated block counts
    // as ONE span. All-integer arithmetic + md5 identity: the oracle
    // replays segmentation, first-occurrence ranks, and the island
    // merge stage for stage.
    "q222_dup_spans" -> ((s, dir) => {
      import s.implicits._
      Curation.segmentDedupSpans(t(s, dir, "documents"), "doc_id", "text",
          grans = Seq(100, 50, 20))
        .select($"id".as("doc_id"), $"n_tokens", $"dup_tokens", $"n_spans")
        .orderBy($"doc_id")
    }),

    // Cross-doc EXACTSUBSTR provenance (q222's spans, attributed):
    // each merged duplicated span traced to the doc that FIRST owned
    // it — first occurrence per (granularity, window-hash) class is
    // min(doc_id) over the class (rides the same exchange as the dup
    // rank), spans take the smallest owner among constituent windows.
    // The takedown/licensing record: "whose text is this a copy of?"
    "q230_span_owners" -> ((s, dir) => {
      import s.implicits._
      Curation.segmentDedupSpanOwners(t(s, dir, "documents"), "doc_id",
          "text", grans = Seq(100, 50, 20))
        .select($"id".as("doc_id"), $"start".cast("long").as("start"),
          $"end".cast("long").as("end"), $"owner")
        .orderBy($"doc_id", $"start")
    }),

    // Hybrid retrieval end-to-end (VERDICT r14 #6): the composition
    // proof for the retrieval family — BM25 top-20 (lexical pool,
    // q232's scorer) + brute-force cosine top-20 over the aligned
    // embeddings (dense pool, q53's scorer) fused per query with
    // reciprocal-rank fusion (rrfFuseKeyed on (query_id, doc_id)),
    // then the skew-safe top-5. Queries = every 50th doc: text prefix
    // feeds the lexical side, its embedding row feeds the dense side.
    "q238_hybrid_retrieval" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val emb = t(s, dir, "embeddings")
      val qs = docs.filter($"doc_id" % 50 === 0)
        .select($"doc_id".as("query_id"),
          array_join(slice(filter(split($"text", " "), t => t =!= ""),
            1, 5), " ").as("qtext"))
      val lex = Curation.bm25TopK(docs, "doc_id", "text", qs,
          "query_id", "qtext", k = 20, maxDfFrac = 1.0)
        .select($"query_id", $"doc_id", $"rk")
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter($"vec_id" % 50 === 0), "vec_id", "embedding", k = 20)
        .select($"query_id", $"vec_id".as("doc_id"), $"rk")
      val fused = Curation.rrfFuseKeyed(Seq(lex, dense),
        Seq("query_id", "doc_id"))
      Ops.saltedTopKPerGroup(fused, part = Seq("query_id"),
          order = Seq($"rrf".desc, $"doc_id".asc), k = 5,
          saltCol = $"doc_id")
        .select($"query_id", $"rk", $"doc_id", round($"rrf", 6).as("rrf"))
        .orderBy($"query_id", $"rk")
    }),

    // UNALIGNED EXACTSUBSTR via content-defined anchors (VERDICT r14
    // #2): each doc gets a twin that copies its full text at a junk
    // offset of 1..7 tokens — never a multiple of any aligned
    // granularity, so q222's fixed windows see nothing, while anchor
    // segmentation (boundaries = tokens with md5 prefix = 0 mod 16)
    // makes the copied interior collide at any offset. The oracle
    // replays boundary detection, segment assembly, the
    // first-occurrence rule, and the island merge stage for stage.
    "q237_anchored_spans" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val junk = array_join(transform(
        sequence(lit(1), ($"doc_id" % 7 + 1).cast("int")),
        k => concat(lit("j"), $"doc_id".cast("string"), lit("x"),
          k.cast("string"))), " ")
      val fixture = docs.select(($"doc_id" * 2).as("doc_id"), $"text")
        .unionByName(docs.select(($"doc_id" * 2 + 1).as("doc_id"),
          concat(junk, lit(" "), $"text").as("text")))
      Curation.anchoredDedupSpans(fixture, "doc_id", "text",
          anchorMod = 16, minTok = 5, maxRun = 512)
        .select($"id".as("doc_id"), $"n_tokens", $"dup_tokens", $"n_spans")
        .orderBy($"doc_id")
    }),

    // Per-domain quota (crawl curation: no source contributes more
    // than 15 docs, best-quality-first) via the skew-safe two-phase
    // exact top-k — bit-identical to a plain per-domain rank, which is
    // exactly what the oracle computes.
    "q112_domain_cap" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Ops.saltedTopKPerGroup(
          t(s, dir, "documents").select($"doc_id", $"source", $"n_chars"),
          part = Seq("source"),
          order = Seq($"n_chars".desc, $"doc_id".asc),
          k = 15, saltCol = $"doc_id", saltParts = 8)
        .select($"source", $"doc_id", $"n_chars", $"rk")
        .orderBy($"source", $"rk")
    }),

    // Mixture-drift monitoring: KL(source-language-mix || corpus-mix)
    // per source — the drift alarm a continuously-ingesting training
    // pipeline runs on every crawl batch. Two tiny aggregates joined
    // back; per-term products go through decimal accumulation so the
    // divergence (and the alarm boolean) is partition- and
    // engine-stable. Sources whose subset mixes diverge past 0.10 nats
    // get flagged.
    "q132_mixture_drift" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val c = docs.groupBy($"lang").agg(count(lit(1)).as("nc"))
      val tot = docs.agg(count(lit(1)).as("n_tot"))
      val sl = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("ns"))
      val st = docs.groupBy($"source").agg(count(lit(1)).as("n_src"))
      val kl = sum($"t".cast("decimal(30,12)")).cast("double")
      sl.join(st, "source").join(broadcast(c), "lang")
        .crossJoin(broadcast(tot))
        .withColumn("t", ($"ns".cast("double") / $"n_src") *
          log(($"ns".cast("double") / $"n_src") /
            ($"nc".cast("double") / $"n_tot")))
        .groupBy($"source")
        .agg(max($"n_src").as("n_docs"), round(kl, 6).as("kl"),
          (kl > lit(0.10)).as("drifted"))
        .orderBy($"source")
    }),

    // Chi-square contingency (source × lang): q132's KL sibling for
    // the drift family — per-cell (observed·N − rowN·colN)²/(N·rowN·
    // colN) contributions, integer-exact numerators, per-cell doubles
    // quantized to decimal before the sum (partition-order invariant,
    // the q132 convention). Per-source partial χ² localizes WHICH
    // source shifted the mix; all inputs are tiny hash-aggs of one
    // documents scan, dims broadcast.
    "q186_chisq_drift" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sl = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("nsl"))
      val st = docs.groupBy($"source").agg(count(lit(1)).as("ns"))
      val lt = docs.groupBy($"lang").agg(count(lit(1)).as("nl"))
      val tot = docs.agg(count(lit(1)).as("n_tot"))
      val num = ($"nsl" * $"n_tot" - $"ns" * $"nl").cast("double")
      val cellT = ((num * num) /
        ($"n_tot".cast("double") * $"ns" * $"nl")).cast("decimal(30,12)")
      val chi2 = sum(cellT).cast("double")
      sl.join(st, "source").join(broadcast(lt), "lang")
        .crossJoin(broadcast(tot))
        .groupBy($"source")
        .agg(max($"ns").as("n_docs"), round(chi2, 6).as("chi2"),
          count(lit(1)).as("n_cells"))
        .orderBy($"source")
    }),

    // Welch two-sample t-test per source vs the REST of the corpus
    // (doc length): the third drift lens beside KL (q132) and χ²
    // (q186) — "is this source's length distribution shifting?".
    // Sufficient statistics are exact integer sums from ONE scan;
    // the complement's stats are global-minus-source (broadcast 1-row
    // global), so no second scan and no pair join. The t statistic is
    // one fixed-order double expression over exact integers.
    "q191_ttest_drift" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val per = docs.groupBy($"source").agg(
        count(lit(1)).as("n1"),
        sum(dec($"n_chars")).as("s1"),
        sum(dec($"n_chars") * dec($"n_chars")).as("q1"))
      val glob = docs.agg(
        count(lit(1)).as("ng"),
        sum(dec($"n_chars")).as("sg"),
        sum(dec($"n_chars") * dec($"n_chars")).as("qg"))
      val j = per.crossJoin(broadcast(glob))
        .withColumn("n2", $"ng" - $"n1")
        .withColumn("s2", ($"sg" - $"s1").cast("decimal(38,0)"))
        .withColumn("q2", ($"qg" - $"q1").cast("decimal(38,0)"))
      def meanv(n: String, sx: String) =
        col(sx).cast("double") / col(n).cast("double")
      // variance via doubles over the exact sums: a decimal(38,0)
      // product n·q (or s·s) overflows precision 38 → NULL for
      // wide-valued columns; both engines evaluate the identical
      // fixed-order IEEE expression (ADVICE r11, Drift.welch twin);
      // numerator clamped at 0 so double cancellation on a
      // near-constant group can't drive sqrt to NaN (ADVICE r12)
      def varv(n: String, sx: String, qx: String) =
        greatest(col(n).cast("double") * col(qx).cast("double") -
          col(sx).cast("double") * col(sx).cast("double"), lit(0.0)) /
          (col(n).cast("double") * (col(n).cast("double") - 1.0))
      val tstat = (meanv("n1", "s1") - meanv("n2", "s2")) /
        sqrt(varv("n1", "s1", "q1") / $"n1".cast("double") +
             varv("n2", "s2", "q2") / $"n2".cast("double"))
      j.filter($"n1" > 1 && $"n2" > 1)
        .select($"source", $"n1".as("n_docs"),
          round(tstat, 6).as("t_stat"),
          (abs(tstat) > 2.0).as("shifted"))
        .orderBy($"source")
    }),

    // EXACT ROC AUC of the q190 hash score as an English-detector:
    // Mann-Whitney form — concordant pairs counted from per-score
    // (pos, neg) tallies and a cumulative-negatives prefix, ALL in
    // integers (numerator2 = Σ np·(2·cum_neg_below + nn) counts ties
    // at half weight; denominator2 = 2·P·N). No per-pair join (P·N
    // pairs never materialize) and no global-order window over data
    // rows — the prefix runs on the per-score table via the
    // distributed runningTotal (score domain ≪ row count). The only
    // double is the final reported ratio.
    "q198_auc_exact" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val scored = graft.operators.Ops.hashedFeatureScore(
          docs, "doc_id", "text", HashWeights, bias = 2L)
        .join(docs.select($"doc_id", ($"lang" === "en").as("pos")),
          "doc_id")
      val per = scored.groupBy($"score").agg(
        sum(when($"pos", 1L).otherwise(0L)).as("np"),
        sum(when(!$"pos", 1L).otherwise(0L)).as("nn"))
      val c = graft.operators.Ops.runningTotal(per, Seq($"score"), "nn",
          buckets = 16, outCol = "cum_nn")
        .withColumn("cumb", $"cum_nn" - $"nn")
      // The Mann-Whitney numerator is ~P·N — the very pair count the
      // comment above says never materializes — so a raw BIGINT sum
      // silently wraps at large corpora while the oracle promotes to
      // HUGEINT. Accumulate numerator AND denominator in
      // decimal(38,0) (q191's convention); the OUTPUT carries them as
      // canonical digit strings (scale-0 decimal → string is plain
      // digits on both engines, spec-pinned DecimalCanonSpec) because
      // raw DECIMAL(38,0) output columns proved driver-environment-
      // sensitive three rounds straight (r13 VERDICT directive #1).
      c.agg(
          sum($"np").as("p"), sum($"nn").as("n"),
          // np cast to decimal BEFORE the multiply: the per-row
          // product is ~P·N-sized and wraps a BIGINT long before the
          // sum does (ADVICE r11)
          sum(($"np".cast("decimal(38,0)") *
              (lit(2L) * $"cumb" + $"nn"))
            .cast("decimal(38,0)")).as("auc_num2"))
        .select($"p", $"n",
          $"auc_num2".cast("string").as("auc_num2"),
          ($"p".cast("decimal(38,0)") * $"n" * 2L)
            .cast("decimal(38,0)").cast("string").as("auc_den2"),
          round($"auc_num2".cast("double") /
            ($"p".cast("decimal(38,0)") * $"n" * 2L).cast("double"), 6)
            .as("auc"))
    }),

    // Paired Poissonized-bootstrap significance test
    // (Drift.bootstrapDiff): did operating point ">80" genuinely beat
    // ">60" as the q190 hash-score English detector (sf0.01 accuracy
    // 257 vs 242 — a modest +15/500 edge, the regime the test is
    // FOR), or is
    // the accuracy gap resampling noise? Per-doc diff = correct(A) −
    // correct(B) ∈ {−1,0,1}; 200 deterministic Poisson(1)-weighted
    // resamples report how many land positive — the eval release
    // gate. Everything replays: md5-unit draws, one shared
    // PoissonCdf threshold list, exact integer resample sums.
    "q233_bootstrap_eval" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val d = graft.operators.Ops.hashedFeatureScore(
          docs, "doc_id", "text", HashWeights, bias = 2L)
        .join(docs.select($"doc_id", ($"lang" === "en").as("pos")), "doc_id")
        .select($"doc_id",
          (when(($"score" > 80) === $"pos", 1L).otherwise(0L) -
            when(($"score" > 60) === $"pos", 1L).otherwise(0L)).as("d"))
      graft.operators.Drift.bootstrapDiff(d, "doc_id", $"d",
        resamples = 200, salt = "bs1")
    }),

    // CCNet-style LM quality filter (Curation.bigramCrossEntropy): an
    // add-0.5-smoothed bigram LM trained on the English reference
    // slice scores EVERY doc's cross-entropy — the KenLM-perplexity
    // filter pattern, fully distributed (counts never leave the
    // cluster). English docs should score low, other languages high.
    "q234_lm_quality" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.bigramCrossEntropy(docs.filter($"lang" === "en"), docs,
          "doc_id", "text", k = 0.5)
        .orderBy($"doc_id")
    }),

    // Bradley-Terry preference strengths (Ops.bradleyTerry): contests
    // between SOURCES — consecutive doc ids from different sources
    // "compete", the higher qualityScore wins (ties to the earlier
    // doc) — fitted by 8 MM rounds with add-half smoothing. The
    // pairwise-leaderboard model (RLHF comparisons, model arenas);
    // the oracle unrolls the rounds as CTEs like q242's power
    // iteration.
    "q248_bradley_terry" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"source",
        graft.functions.TextFunctions.qualityScore($"text").as("q"))
      val a = docs.select($"doc_id", $"source".as("sa"), $"q".as("qa"))
      val b = docs.select(($"doc_id" - 1).as("doc_id"),
        $"source".as("sb"), $"q".as("qb"))
      val ct = a.join(b, "doc_id").filter($"sa" =!= $"sb")
        .select(when($"qa" >= $"qb", $"sa").otherwise($"sb").as("w"),
          when($"qa" >= $"qb", $"sb").otherwise($"sa").as("l"))
      graft.operators.Ops.bradleyTerry(ct, "w", "l", iters = 8)
        .orderBy($"item")
    }),

    // Kneser-Ney smoothed LM filter (Curation.kneserNeyCrossEntropy):
    // the smoothing production KenLM filters actually use — absolute
    // discounting (D=0.75) + the continuation-count backoff — trained
    // on the English slice, scoring every doc. The add-k sibling is
    // q234; same determinism contract (exact counts, one fixed-order
    // double per bigram quantized pre-sum).
    "q246_kneser_ney" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.kneserNeyCrossEntropy(docs.filter($"lang" === "en"), docs,
          "doc_id", "text", discount = 0.75, contK = 0.5)
        .orderBy($"doc_id")
    }),

    // Moore-Lewis cross-entropy difference (Curation.mooreLewisScore):
    // target LM = English docs, raw LM = the whole pool; mls =
    // xent_raw - xent_target ranks docs by how much more target-like
    // than pool-like they read — the classic LM data-selection score,
    // the exact-LM sibling of q240's hashed DSIR.
    "q243_moore_lewis" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.mooreLewisScore(docs.filter($"lang" === "en"),
          docs, docs, "doc_id", "text", k = 0.5)
        .orderBy($"doc_id")
    }),

    // CCNet perplexity tertiles (Curation.perplexityBuckets): each doc
    // scored against its OWN language's bigram LM, languages split
    // head/middle/tail at histogram-derived tertile cutoffs — the
    // scale-safe replacement for ntile(3)-per-language (which would
    // sort whole languages in single tasks). Integer cutoff tests +
    // the rounded-double histogram key replay exactly in the oracle.
    "q241_ppl_buckets" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.perplexityBuckets(docs, "lang", docs,
          "doc_id", "lang", "text", k = 0.5)
        .orderBy($"doc_id")
    }),

    // Statistical language ID (Curation.bigramLangId): one bigram LM
    // per language trained in ONE pass, every doc scored against all
    // five, prediction = exact-decimal argmin cross-entropy. Output is
    // the confusion matrix vs the true labels — no float ever reaches
    // the decision OR the output (the argmin compares exact decimal
    // log-prob sums; ties go to label order).
    "q235_lm_langid" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Curation.bigramLangId(docs, "lang", docs, "doc_id", "text", k = 0.5)
        .join(docs.select($"doc_id", $"lang"), "doc_id")
        .groupBy($"lang", $"pred").agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang", $"pred")
    }),

    // Char-bigram language ID on an UNSEGMENTED corpus (VERDICT r14
    // #5): a deterministic two-"language" fixture with no whitespace
    // at all — lang 'aa' = documents text with spaces stripped, lang
    // 'bb' = the same stripped text REVERSED (different adjacent-char
    // statistics, e.g. "th" vs "ht"). Word tokenization sees ONE
    // token per doc and classifies nothing (CurationSpec pins that
    // degeneracy); ngramMode="char" discriminates. Same exact-decimal
    // argmin machinery as q235; output is the confusion matrix.
    "q236_lm_char_langid" -> ((s, dir) => {
      import s.implicits._
      val stripped = regexp_replace($"text", " ", "")
      // the regex strip + reverse fixture prep is itself a CPU-dense
      // narrow pass — spread it off the single-split scan (r19), or it
      // serializes ~1.3 s/pass into one task before the LM kernel
      val unseg = graft.operators.Ops.spreadForKernel(
        t(s, dir, "documents")).select($"doc_id",
        when($"doc_id" % 2 === 0, "aa").otherwise("bb").as("lang"),
        when($"doc_id" % 2 === 0, stripped).otherwise(reverse(stripped))
          .as("text"))
      Curation.bigramLangId(unseg, "lang", unseg, "doc_id", "text",
          k = 0.5, ngramMode = "char")
        // true label is a pure function of doc_id in this fixture —
        // recompute it instead of joining a fourth corpus pass in
        .withColumn("lang",
          when($"doc_id" % 2 === 0, "aa").otherwise("bb"))
        .groupBy($"lang", $"pred").agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang", $"pred")
    }),

    // Feature-hashing linear inference (the production shape of a
    // cheap learned quality filter): token -> md5 bucket -> literal
    // weight table via element_at (no join, codegen projection),
    // exact integer score per doc. Oracle replays the identical hash
    // arithmetic and weight list.
    "q190_hashed_inference" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Ops.hashedFeatureScore(
          t(s, dir, "documents"), "doc_id", "text",
          HashWeights, bias = 2L)
        .select($"doc_id", $"score", $"n_feats",
          ($"score" > 0).as("keep"))
        .orderBy($"doc_id")
    }),

    // Registrable-domain (eTLD+1) annotation under publicsuffix.org
    // rule semantics — the site-identity key crawl caps/dedup/
    // schedules should group on (host keys over-split `*.blogspot
    // .com`-class sites; "last two labels" merges distinct `co.uk`
    // sites). The fixture hosts exercise every rule class: a plain
    // TLD, a private-domain rule (blogspot.com), a multi-label
    // suffix (co.uk beating uk), wildcard (*.ck), the exception
    // (!www.ck prevailing over the wildcard), and a host with NO
    // matching rule (implicit-* fallback); the rule list itself
    // carries a comment and a blank line (file-format tolerance).
    // Rules are collected bounded side data compiled into the
    // codegen kernel — the query plan is a narrow scan, zero joins.
    "q290_registrable_domain" -> ((s, dir) => {
      import s.implicits._
      val m = $"doc_id" % 6
      val host = when(m === 0, concat($"source", lit(".com")))
        .when(m === 1, concat(lit("a"), ($"doc_id" % 7).cast("string"),
          lit("."), $"source", lit(".blogspot.com")))
        .when(m === 2, concat(lit("www."), $"source", lit(".co.uk")))
        .when(m === 3, lit("x.www.ck"))
        .when(m === 4, concat(lit("y"), ($"doc_id" % 3).cast("string"),
          lit(".z.ck")))
        .otherwise(concat($"source", lit(".example")))
      val rules = PslFixtureRules.toDF("rule")
      Curation.registrableDomain(
          t(s, dir, "documents").select($"doc_id", host.as("host")),
          "host", rules)
        .orderBy($"doc_id")
    }),

    // The PSL key doing its job: the q112 domain cap re-keyed on
    // reg_domain — every `a<k>.<source>.blogspot.com` host collapses
    // into ONE `<source>.blogspot.com` cap group (the whole point:
    // a host-keyed cap would admit 7 sub-hosts separately), while
    // co.uk sites stay distinct per source. Same salted top-k
    // machinery as q112 (hub-safe, never a bare class window).
    "q291_regdomain_cap" -> ((s, dir) => {
      import s.implicits._
      val m = $"doc_id" % 6
      val host = when(m === 1, concat(lit("a"), ($"doc_id" % 7).cast("string"),
          lit("."), $"source", lit(".blogspot.com")))
        .otherwise(concat(lit("www."), $"source", lit(".co.uk")))
      val annotated = Curation.registrableDomain(
        t(s, dir, "documents")
          .select($"doc_id", $"n_chars", host.as("host")),
        "host", PslFixtureRules.toDF("rule"))
      graft.operators.Ops.saltedTopKPerGroup(
          annotated.select($"doc_id", $"n_chars", $"reg_domain"),
          part = Seq("reg_domain"),
          order = Seq($"n_chars".desc, $"doc_id".asc),
          k = 10, saltCol = $"doc_id", saltParts = 8)
        .select($"reg_domain", $"doc_id", $"n_chars", $"rk")
        .orderBy($"reg_domain", $"rk")
    }),

    // Crawl-budget apportionment — the quota step between a ranking
    // and a schedule: a total of 997 fetches (prime, so fractional
    // remainders actually fire) split across sources proportional to
    // their doc counts by the largest-remainder (Hamilton) method,
    // exact long arithmetic throughout. Σ(budget) == 997 EXACTLY —
    // the invariant a float split cannot give and the property the
    // oracle replays term-for-term.
    "q294_crawl_budget" -> ((s, dir) => {
      import s.implicits._
      val weights = t(s, dir, "documents")
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      graft.operators.Ops.apportionBudget(weights, "source", "n_docs",
          total = 997L)
        .orderBy($"source")
    })
  )

  /** Mini-PSL shared verbatim by the q290/q291 plans; the oracle
    * replays its semantics inline (the q277 side-input precedent).
    * Includes a comment and a blank line — the list file format.
    */
  private val PslFixtureRules: Seq[String] = Seq(
    "// test snapshot", "com", "co.uk", "uk", "blogspot.com",
    "*.ck", "!www.ck", "")

  /** Deterministic 64-bucket weight table shared verbatim by q190's
    * Spark plan and its DuckDB oracle.
    */
  private val HashWeights: Seq[Int] = (0 until 64).map(i => (i * 37) % 13 - 6)

  val oracleSql: Map[String, String] = Map(

    "q77_decontaminate" ->
      s"""WITH sh AS (
         |  ${shinglesCte(3)})
         |SELECT tr.doc_id, count(DISTINCT tr.h) AS n_shared,
         |  count(DISTINCT ev.eval_id) AS n_eval_docs,
         |  (count(DISTINCT tr.h) >= 4) AS contaminated
         |FROM (SELECT * FROM sh WHERE doc_id % 50 != 0) tr
         |JOIN (SELECT doc_id AS eval_id, h FROM sh WHERE doc_id % 50 = 0) ev
         |  ON tr.h = ev.h
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    "q78_lang_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
        |SELECT doc_id, lang FROM documents JOIN c USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |  < least(1.0, 40.0 / CAST(n AS DOUBLE)) * 4294967296.0
        |ORDER BY doc_id""".stripMargin,

    // q256 oracle: the shared shingle CTE split into standing corpus
    // and new batch, the same left-join membership test.
    "q256_ngram_novelty" ->
      s"""WITH sh AS (
         |  ${shinglesCte(5)}),
         |ref AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0),
         |tgt AS (SELECT doc_id, h FROM sh WHERE doc_id % 10 != 0)
         |SELECT t.doc_id, count(*) AS n_shingles,
         |  count(CASE WHEN r.h IS NULL THEN 1 END) AS n_novel,
         |  round(CAST(count(CASE WHEN r.h IS NULL THEN 1 END) AS DOUBLE)
         |    / count(*), 4) AS novelty
         |FROM tgt t LEFT JOIN ref r ON t.h = r.h
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // q261 oracle: the FULL RFC 9309 replay — the identical fixture
    // bodies rebuilt with the same concat, parsed with the same
    // comment-strip / first-colon / UA-run-group / exact-over-star
    // logic (strpos+substr mirror locate+substring; the lag/sum group
    // id is the same two-step window), the identical pattern → LIKE
    // translation with ESCAPE '!', and the same longest-match /
    // allow-wins-ties precedence (row_number over (plen DESC, rank,
    // pattern) == Spark's min(struct(−plen, rank, pattern))).
    "q261_robots_filter" -> (s"WITH $RobotsRulesPreludeSql,\n" +
      """urls AS (SELECT doc_id, source, source || '.example' AS host,
        |  CASE WHEN doc_id % 6 = 0 THEN '/private/' || lang || '/pub'
        |    WHEN doc_id % 6 = 1 THEN '/private/' || lang
        |    WHEN doc_id % 6 = 2 THEN '/tmp'
        |    WHEN doc_id % 6 = 3 THEN '/tmp/' || source
        |    WHEN doc_id % 12 = 4 THEN '/d_e/x'
        |    WHEN doc_id % 12 = 10 THEN '/dxe/x'
        |    ELSE '/star/s' END AS path FROM documents),
        |m AS (SELECT u.doc_id, r.directive, r.pattern, r.plen
        |  FROM urls u JOIN rl r ON u.host = r.host
        |    AND u.path LIKE r.like_pat ESCAPE '!'),
        |best AS (SELECT doc_id, directive, pattern FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY plen DESC,
        |      CASE directive WHEN 'allow' THEN 0 ELSE 1 END,
        |      pattern) AS rk FROM m) WHERE rk = 1)
        |SELECT u.source, b.directive, b.pattern AS rule,
        |  (b.doc_id IS NOT NULL AND b.directive = 'allow')
        |    OR b.doc_id IS NULL AS allowed,
        |  count(*) AS n_urls
        |FROM urls u LEFT JOIN best b ON u.doc_id = b.doc_id
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin),

    // q263 oracle: the shared robots prelude + the identical sitemap
    // fixture, the same RE2 <loc> extraction, prefix-strip via the
    // same replace, and the q261 precedence replay keyed by loc.
    "q263_crawl_loop" -> (s"WITH $RobotsRulesPreludeSql,\n" +
      """sm AS (SELECT source || '.example' AS host,
        |  CASE WHEN len(source) = 4 THEN
        |    '<?xml version="1.0"?>' || chr(10) || '<sitemapindex>' ||
        |    chr(10) || '  <sitemap><loc> https://' || source ||
        |    '.example/sm1.xml </loc></sitemap>' || chr(10) ||
        |    '  <sitemap><loc>https://' || source ||
        |    '.example/sm2.xml</loc></sitemap>' || chr(10) ||
        |    '</sitemapindex>' || chr(10)
        |  ELSE
        |    '<?xml version="1.0"?>' || chr(10) || '<urlset>' ||
        |    chr(10) || '  <url><loc> https://' || source ||
        |    '.example/private/en/pub </loc>' ||
        |    '<lastmod>2026-01-01</lastmod></url>' || chr(10) ||
        |    '  <url><loc>https://' || source ||
        |    '.example/tmp</loc></url>' || chr(10) ||
        |    '  <url><loc>https://' || source ||
        |    '.example/star/s</loc></url>' || chr(10) ||
        |    '  <url><loc>https://' || source ||
        |    '.example/open/a</loc></url>' || chr(10) ||
        |    '</urlset>' || chr(10) END AS xml FROM hosts),
        |locs AS (SELECT host,
        |  CASE WHEN contains(lower(xml), '<sitemapindex')
        |    THEN 'index' ELSE 'urlset' END AS kind,
        |  unnest(regexp_extract_all(xml,
        |    '(?is)<loc>\s*([^<]+?)\s*</loc>', 1)) AS loc FROM sm),
        |lp AS (SELECT host, kind, loc,
        |  replace(loc, 'https://' || host, '') AS path FROM locs
        |  WHERE loc != ''),
        |m AS (SELECT l.loc, r.directive, r.plen, r.pattern
        |  FROM lp l JOIN rl r ON l.host = r.host
        |    AND l.path LIKE r.like_pat ESCAPE '!'),
        |best AS (SELECT loc, directive FROM (
        |  SELECT *, row_number() OVER (PARTITION BY loc
        |    ORDER BY plen DESC,
        |      CASE directive WHEN 'allow' THEN 0 ELSE 1 END,
        |      pattern) AS rk FROM m) WHERE rk = 1)
        |SELECT l.host, l.kind,
        |  (b.loc IS NOT NULL AND b.directive = 'allow')
        |    OR b.loc IS NULL AS allowed,
        |  count(*) AS n_locs,
        |  string_agg(l.path, '|' ORDER BY l.path) AS paths
        |FROM lp l LEFT JOIN best b ON l.loc = b.loc
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // q264 oracle: the shared prelude's chosen-group machinery, keyed
    // to crawl-delay lines; TRY_CAST drops the bogus value, MIN is
    // the conservative multi-group rule.
    "q264_crawl_delay" -> (s"WITH $RobotsRulesPreludeSql\n" +
      """SELECT gr.host, min(TRY_CAST(gr.v AS DOUBLE)) AS crawl_delay
        |FROM grp gr JOIN chosen c ON gr.host = c.host AND gr.g = c.g
        |WHERE gr.k = 'crawl-delay'
        |  AND TRY_CAST(gr.v AS DOUBLE) IS NOT NULL
        |GROUP BY gr.host ORDER BY gr.host""".stripMargin),

    // q262 oracle: same line/comment/key machinery, Sitemap lines are
    // group-independent; the commented-out line must NOT surface.
    "q262_robots_sitemaps" ->
      """WITH hosts AS (SELECT DISTINCT source FROM documents),
        |rob AS (SELECT source || '.example' AS host,
        |  'User-agent: *' || chr(10) || 'Disallow: /star/  # gated' ||
        |  chr(10) || 'Sitemap: https://' || source ||
        |  '.example/sitemap.xml' || chr(10) ||
        |  '# Sitemap: https://commented.out' || chr(10) ||
        |  CASE WHEN len(source) = 4 THEN 'sitemap: https://' || source
        |    || '.example/extra.xml' || chr(10) ELSE '' END
        |  AS robots_txt FROM hosts),
        |lns AS (SELECT host, rtrim(raw0, chr(13)) AS raw FROM (
        |  SELECT host, unnest(string_split(robots_txt, chr(10)))
        |    AS raw0 FROM rob)),
        |kv AS (SELECT host, strpos(nc, ':') AS pos, nc FROM (
        |  SELECT host, CASE WHEN strpos(raw, '#') > 0
        |    THEN substr(raw, 1, strpos(raw, '#') - 1) ELSE raw END AS nc
        |  FROM lns)),
        |sm AS (SELECT host,
        |  trim(substr(nc, pos + 1)) AS sitemap FROM kv
        |  WHERE pos > 0
        |    AND lower(trim(substr(nc, 1, pos - 1))) = 'sitemap'
        |    AND trim(substr(nc, pos + 1)) != '')
        |SELECT host, count(*) AS n_sitemaps,
        |  string_agg(sitemap, '|' ORDER BY sitemap) AS sitemaps
        |FROM sm GROUP BY host ORDER BY host""".stripMargin,

    // q276 oracle: identical fixture XML (byte-for-byte concat), the
    // same block split + per-field RE2 extraction, nullif-empty,
    // lower(changefreq), TRY_CAST priority, loc-less blocks dropped.
    "q276_sitemap_freshness" ->
      """WITH hosts AS (SELECT DISTINCT source FROM documents),
        |sm AS (SELECT source || '.example' AS host,
        |  CASE WHEN len(source) = 4 THEN
        |    '<?xml version="1.0"?>' || chr(10) || '<sitemapindex>' ||
        |    chr(10) || '  <sitemap><loc> https://' || source ||
        |    '.example/sm1.xml </loc><lastmod>2026-03-03</lastmod>' ||
        |    '</sitemap>' || chr(10) || '</sitemapindex>' || chr(10)
        |  ELSE
        |    '<?xml version="1.0"?>' || chr(10) || '<urlset>' ||
        |    chr(10) || '  <url><loc> https://' || source ||
        |    '.example/a </loc><lastmod>2026-01-0' ||
        |    CAST(len(source) AS VARCHAR) ||
        |    '</lastmod><changefreq>DAILY</changefreq>' ||
        |    '<priority>0.8</priority></url>' || chr(10) ||
        |    '  <url><loc>https://' || source ||
        |    '.example/b</loc><changefreq>weekly</changefreq></url>' ||
        |    chr(10) || '  <url><lastmod>2026-02-02</lastmod></url>' ||
        |    chr(10) || '  <url><loc>https://' || source ||
        |    '.example/c</loc><priority>junk</priority></url>' ||
        |    chr(10) || '</urlset>' || chr(10)
        |  END AS xml FROM hosts),
        |e AS (SELECT host,
        |  CASE WHEN lower(xml) LIKE '%<sitemapindex%' THEN 'index'
        |    ELSE 'urlset' END AS kind,
        |  unnest(regexp_extract_all(xml,
        |    '(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)) AS b
        |  FROM sm),
        |p AS (SELECT host, kind,
        |  nullif(regexp_extract(b,
        |    '(?is)<loc>\s*([^<]+?)\s*</loc>', 1), '') AS loc,
        |  nullif(regexp_extract(b,
        |    '(?is)<lastmod>\s*([^<]+?)\s*</lastmod>', 1), '')
        |    AS lastmod,
        |  lower(nullif(regexp_extract(b,
        |    '(?is)<changefreq>\s*([^<]+?)\s*</changefreq>', 1), ''))
        |    AS changefreq,
        |  TRY_CAST(nullif(regexp_extract(b,
        |    '(?is)<priority>\s*([^<]+?)\s*</priority>', 1), '')
        |    AS DOUBLE) AS priority
        |  FROM e)
        |SELECT host, kind, loc, lastmod, changefreq, priority FROM p
        |WHERE loc IS NOT NULL ORDER BY host, loc""".stripMargin,

    // q254 oracle: identical count tables, the identical fixed-order
    // per-word term (inlined p/q/m subexpressions in the same tree
    // shape), decimal(30,12) quantization pre-sum, and the same
    // ln2-closed-form off-support mass.
    "q254_source_jsd" ->
      """WITH w0 AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wf AS (SELECT source, w FROM w0 WHERE w != ''),
        |sc AS (SELECT source, w, count(*) AS ns FROM wf
        |       GROUP BY source, w),
        |cc AS (SELECT w, count(*) AS nw FROM wf GROUP BY w),
        |ts AS (SELECT source, CAST(sum(ns) AS BIGINT) AS tn FROM sc
        |       GROUP BY source),
        |tot AS (SELECT CAST(sum(nw) AS BIGINT) AS n FROM cc),
        |j AS (SELECT sc.source, cc.nw,
        |  CAST(
        |    (CAST(ns AS DOUBLE) / CAST(tn AS DOUBLE))
        |      * ln((CAST(ns AS DOUBLE) / CAST(tn AS DOUBLE))
        |        / ((CAST(ns AS DOUBLE) / CAST(tn AS DOUBLE)
        |            + CAST(nw AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
        |    + (CAST(nw AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln((CAST(nw AS DOUBLE) / CAST(n AS DOUBLE))
        |        / ((CAST(ns AS DOUBLE) / CAST(tn AS DOUBLE)
        |            + CAST(nw AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
        |    AS DECIMAL(30,12)) AS t
        |  FROM sc JOIN cc USING (w) JOIN ts USING (source), tot),
        |a AS (SELECT source, count(*) AS support,
        |        CAST(sum(nw) AS BIGINT) AS qsum, sum(t) AS st
        |      FROM j GROUP BY source)
        |SELECT a.source, tn AS n_tokens, support,
        |  round(0.5 * (CAST(st AS DOUBLE) + 0.6931471805599453
        |    * (1.0 - CAST(qsum AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        |    AS jsd,
        |  round(0.5 * (CAST(st AS DOUBLE) + 0.6931471805599453
        |    * (1.0 - CAST(qsum AS DOUBLE) / CAST(n AS DOUBLE)))
        |    / 0.6931471805599453, 6) AS jsd_norm
        |FROM a JOIN ts USING (source), tot ORDER BY a.source""".stripMargin,

    // q252 oracle: the temperatureRebalance arithmetic verbatim —
    // n^0.5 weights, the DECIMAL(38,15)-summed normalizer, the same
    // per-row md5 threshold draw.
    "q252_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, pow(CAST(n AS DOUBLE), 0.5) AS wv FROM c),
        |z AS (SELECT CAST(sum(CAST(wv AS DECIMAL(38,15))) AS DOUBLE) AS zv
        |      FROM w)
        |SELECT doc_id, lang FROM documents JOIN w USING (lang), z
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT)
        |  < least(1.0, (wv / zv) * 250.0 / CAST(n AS DOUBLE)) * 4294967296.0
        |ORDER BY doc_id""".stripMargin,

    "q74_boilerplate_share" ->
      s"""WITH sh AS (
         |  ${shinglesCte(5)}),
         |dfc AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS boiler_share,
         |  (CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) <= 0.5) AS keep
         |FROM sh JOIN dfc USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q75_hard_negatives" ->
      s"""SELECT anchor_id, vec_id, round(sim, 4) AS sim, rk FROM (
         |  SELECT anchor_id, vec_id, sim, row_number() OVER (
         |    PARTITION BY anchor_id ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM (
         |    SELECT q.vec_id AS anchor_id, c.vec_id,
         |      ${DedupSim.cosSql} AS sim
         |    FROM (SELECT vec_id, embedding AS ea, label AS la
         |          FROM embeddings) c,
         |         (SELECT vec_id, embedding AS eb, label AS lb
         |          FROM embeddings WHERE vec_id % 64 = 0) q
         |    WHERE c.la != q.lb))
         |WHERE rk <= 3 ORDER BY anchor_id, rk""".stripMargin,

    "q79_doc_chunks" ->
      s"""SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_idx,
         |  len(list_slice(ws, start + 1, start + 32)) AS n_tok,
         |  ${md5Long("array_to_string(list_slice(ws, start + 1, start + 32), ' ')")}
         |    AS chunk_fp
         |FROM (
         |  SELECT doc_id, ws, unnest(range(0, len(ws), 24)) AS start
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q80_seq_pack" ->
      s"""SELECT doc_id, source, toks,
         |  CAST(floor(CAST(cum - toks AS DOUBLE) / 2048.0) AS BIGINT) AS bin
         |FROM (
         |  SELECT doc_id, source, toks,
         |    sum(toks) OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id ASC) AS cum
         |  FROM (
         |    SELECT doc_id, source,
         |      ${TextQueries.qualitySql()} AS quality,
         |      CAST(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]')) AS BIGINT) AS toks
         |    FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "q76_rrf_fusion" ->
      s"""WITH ${TextQueries.bm25ScoredSql},
         |b AS (SELECT doc_id,
         |        row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
         |      FROM scored),
         |ql AS (SELECT doc_id,
         |        row_number() OVER (ORDER BY q DESC, doc_id ASC) AS rk
         |      FROM (SELECT doc_id, ${TextQueries.qualitySql()} AS q
         |            FROM documents)),
         |u AS (
         |  SELECT doc_id, CAST(1.0 AS DOUBLE) / (60.0 + CAST(rk AS DOUBLE)) AS c
         |  FROM b WHERE rk <= 100
         |  UNION ALL
         |  SELECT doc_id, CAST(1.0 AS DOUBLE) / (60.0 + CAST(rk AS DOUBLE)) AS c
         |  FROM ql WHERE rk <= 100),
         |f AS (SELECT doc_id, sum(c) AS rrf FROM u GROUP BY doc_id)
         |SELECT doc_id, round(rrf, 6) AS rrf, rk FROM (
         |  SELECT doc_id, rrf,
         |    row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rk
         |  FROM f)
         |WHERE rk <= 20 ORDER BY rk""".stripMargin,

    // assignIds oracle: the very SQL shape the operator replaces.
    "q100_assign_ids" ->
      """SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id,
        |  doc_id, lang
        |FROM documents
        |ORDER BY row_id""".stripMargin,

    // hashSplit oracle: cumulative md5-hex thresholds — cccccccc is
    // floor(0.8 * 2^32) in hex, e6666666 is floor(0.9 * 2^32); the
    // last split absorbs the tail (Ops.hashSplit convention).
    "q101_hash_split" ->
      """SELECT split, count(*) AS n, count(DISTINCT lang) AS n_langs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (
        |  SELECT doc_id, lang,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)
        |           < 'cccccccc' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)
        |           < 'e6666666' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split
        |ORDER BY split""".stripMargin,

    // Shard-manifest oracle: q166's md5 shard assignment + the exact
    // decimal fingerprint sum — order-invariant, so GROUP BY replays
    // it regardless of row order.
    "q214_shard_manifest" ->
      """WITH h AS (
        |  SELECT doc_id, text,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'rel1'),
        |      1, 15) AS BIGINT) % 8 AS shard
        |  FROM documents)
        |SELECT CAST(shard AS INTEGER) AS shard,
        |  count(*) AS n_rows,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(CAST(CAST('0x' || substr(md5(
        |      CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15) AS BIGINT)
        |    AS DECIMAL(38,0))) AS VARCHAR) AS fingerprint,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin,

    // Seq-pack oracle: the greedy first-fit walk replayed with a
    // recursive CTE — each recursion step advances EVERY shard by one
    // doc (rn + 1), carrying (bin, fill) exactly as the engine's
    // sequential pass does; the close-the-bin condition is the same
    // fill > 0 AND fill + tok > budget on both sides.
    "q285_bin_pack" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 8 AS shard
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM d),
        |rec AS (
        |  SELECT shard, rn, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn, n.doc_id, n.n_tokens,
        |    CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 90
        |      THEN r.bin + 1 ELSE r.bin END,
        |    CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 90
        |      THEN n.n_tokens ELSE r.fill + n.n_tokens END
        |  FROM rec r JOIN o n ON n.shard = r.shard AND n.rn = r.rn + 1)
        |SELECT doc_id, n_tokens, shard, bin
        |FROM rec ORDER BY doc_id""".stripMargin,

    // Pack-efficiency oracle: the q285 recursive walk aggregated —
    // same (shard, bin) fills, exact integer utilization.
    "q286_pack_efficiency" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 8 AS shard
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM d),
        |rec AS (
        |  SELECT shard, rn, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn, n.doc_id, n.n_tokens,
        |    CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 90
        |      THEN r.bin + 1 ELSE r.bin END,
        |    CASE WHEN r.fill > 0 AND r.fill + n.n_tokens > 90
        |      THEN n.n_tokens ELSE r.fill + n.n_tokens END
        |  FROM rec r JOIN o n ON n.shard = r.shard AND n.rn = r.rn + 1),
        |bins AS (
        |  SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    sum(n_tokens) AS fill
        |  FROM rec GROUP BY shard, bin)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(fill) AS BIGINT) AS sum_tokens,
        |  CAST(sum(greatest(90 - fill, 0)) AS BIGINT) AS padding,
        |  CAST(sum(fill) * 1000000 // (count(*) * 90) AS BIGINT) AS util_e6
        |FROM bins GROUP BY shard ORDER BY shard""".stripMargin,

    // BM25 oracle: identical tokenization, identical FIXED-ORDER
    // double arithmetic (constants written as the same runtime
    // additions Spark's expression tree performs — '1.2 + 1.0', never
    // a pre-folded 2.2, which is 1 ULP away), per-term decimal(30,12)
    // quantization before the sum, rank over the exact decimal score.
    "q232_bm25_topk" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
        |dt AS (
        |  SELECT doc_id, dl, tok AS term, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base)
        |  GROUP BY doc_id, dl, tok),
        |st AS (SELECT count(*) AS n, sum(dl) AS tot FROM base),
        |dfr AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
        |q AS (
        |  SELECT doc_id AS query_id, array_to_string(toks[1:5], ' ') AS qt
        |  FROM d WHERE doc_id % 100 = 0),
        |qterm AS (
        |  SELECT DISTINCT query_id, tok AS term
        |  FROM (SELECT query_id,
        |          unnest(list_filter(string_split(qt, ' '), t -> t != ''))
        |            AS tok
        |        FROM q)),
        |qside AS (
        |  SELECT query_id, qterm.term, df, n, tot
        |  FROM qterm JOIN dfr ON dfr.term = qterm.term, st
        |  WHERE df <= floor(1.0 * n)),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    sum(CAST(
        |      ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |           / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
        |           / (CAST(tf AS DOUBLE)
        |              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
        |                  / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))
        |      AS DECIMAL(30,12))) AS s
        |  FROM dt JOIN qside ON qside.term = dt.term
        |  GROUP BY query_id, doc_id)
        |SELECT query_id, CAST(rk AS INT) AS rk, doc_id,
        |  round(CAST(s AS DOUBLE), 6) AS score
        |FROM (
        |  SELECT query_id, doc_id, s,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY s DESC, doc_id ASC) AS rk
        |  FROM scored)
        |WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,

    // q240 oracle: identical tokenization + position-indexed bigrams
    // (the q234 CTE), md5-hash into 512 bins, add-one multinomials
    // for target (src0) vs raw, per-occurrence decimal log-ratio
    // sums, Gumbel perturbation from the md5-uniform, exact-decimal
    // top-60.
    "q240_dsir_select" ->
      """WITH base AS (
        |  SELECT doc_id, source = 'src0' AS tgt,
        |    list_filter(string_split(text, ' '), t -> t != '') AS t,
        |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n
        |  FROM documents),
        |fe AS (
        |  SELECT doc_id, tgt,
        |    CAST('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 8) AS BIGINT)
        |      % 512 AS b
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |tc AS (SELECT b, count(*) AS ct FROM fe WHERE tgt GROUP BY b),
        |rc AS (SELECT b, count(*) AS cr FROM fe WHERE NOT tgt GROUP BY b),
        |tot AS (SELECT sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tt,
        |               sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS tr FROM fe),
        |lr AS (
        |  SELECT b,
        |    CAST(ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0)
        |        / (CAST(tt AS DOUBLE) + 512.0)) AS DECIMAL(30,12))
        |    - CAST(ln((CAST(coalesce(cr, 0) AS DOUBLE) + 1.0)
        |        / (CAST(tr AS DOUBLE) + 512.0)) AS DECIMAL(30,12)) AS lr
        |  FROM tc FULL JOIN rc USING (b), tot),
        |w AS (
        |  SELECT doc_id, count(*) AS n_feat,
        |    CAST(sum(lr) AS DECIMAL(30,12)) AS logw
        |  FROM fe JOIN lr USING (b) WHERE NOT tgt GROUP BY doc_id),
        |sc AS (
        |  SELECT doc_id, n_feat, logw,
        |    logw + CAST(-ln(-ln((CAST(CAST('0x' ||
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      AS DOUBLE) + 0.5) / 4294967296.0)) AS DECIMAL(30,12)) AS score
        |  FROM w),
        |top AS (
        |  SELECT doc_id, n_feat, logw, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM sc)
        |SELECT doc_id, n_feat, round(CAST(logw AS DOUBLE), 6) AS logw,
        |  round(CAST(score AS DOUBLE), 6) AS score, CAST(rk AS INT) AS rk
        |FROM top WHERE rk <= 60 ORDER BY rk""".stripMargin,

    // q239 oracle: standing manifest (%11 residue held out), delta
    // manifest over ONLY the residue, additive merge (union + group
    // sums — the manifestUpdate algebra), then q231's diff rules.
    "q239_manifest_update" -> {
      def manifest(where: String) =
        s"""SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_rows,
           |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |    sum(CAST(CAST('0x' || substr(md5(
           |        CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15) AS BIGINT)
           |      AS DECIMAL(38,0))) AS fp
           |  FROM h $where GROUP BY shard"""
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'rel2'),
         |      1, 15) AS BIGINT) % 8 AS shard
         |  FROM documents),
         |mo AS (
         |  ${manifest("WHERE doc_id % 11 != 0")}),
         |md AS (
         |  ${manifest("WHERE doc_id % 11 = 0")}),
         |mn AS (
         |  SELECT shard, CAST(sum(n_rows) AS BIGINT) AS n_rows,
         |    CAST(sum(ws_tokens) AS BIGINT) AS ws_tokens,
         |    CAST(sum(fp) AS DECIMAL(38,0)) AS fp
         |  FROM (SELECT * FROM mo UNION ALL SELECT * FROM md)
         |  GROUP BY shard)
         |SELECT coalesce(o.shard, n.shard) AS shard,
         |  CASE WHEN o.fp IS NULL THEN 'added'
         |       WHEN n.fp IS NULL THEN 'removed'
         |       WHEN o.fp = n.fp AND o.n_rows = n.n_rows
         |         AND o.ws_tokens = n.ws_tokens THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  o.n_rows AS old_rows, n.n_rows AS new_rows,
         |  coalesce(n.n_rows, 0) - coalesce(o.n_rows, 0) AS d_rows,
         |  coalesce(n.ws_tokens, 0) - coalesce(o.ws_tokens, 0) AS d_tokens,
         |  CAST(o.fp AS VARCHAR) AS old_fp, CAST(n.fp AS VARCHAR) AS new_fp
         |FROM mo o FULL OUTER JOIN mn n ON n.shard = o.shard
         |ORDER BY shard""".stripMargin
    },

    // Manifest-diff oracle: the q214 manifest replayed twice (old =
    // %97-filtered minus shard 7; new = full), full-outer joined on
    // shard with the same status rules; fingerprints as VARCHAR.
    "q231_manifest_diff" -> {
      // NOT stripMargin'd here: the block is interpolated into the
      // outer stripMargin template, which must strip each line exactly
      // once (a pre-stripped block's '||' operators would lose their
      // first '|' to the outer pass — the r11 nested-builder pitfall).
      def manifest(where: String) =
        s"""SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_rows,
           |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |    sum(CAST(CAST('0x' || substr(md5(
           |        CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15) AS BIGINT)
           |      AS DECIMAL(38,0))) AS fp
           |  FROM h $where GROUP BY shard"""
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'rel1'),
         |      1, 15) AS BIGINT) % 8 AS shard
         |  FROM documents),
         |mo AS (
         |  SELECT * FROM (
         |  ${manifest("WHERE doc_id % 97 != 0")})
         |  WHERE shard != 7),
         |mn AS (
         |  ${manifest("")})
         |SELECT coalesce(o.shard, n.shard) AS shard,
         |  CASE WHEN o.fp IS NULL THEN 'added'
         |       WHEN n.fp IS NULL THEN 'removed'
         |       WHEN o.fp = n.fp AND o.n_rows = n.n_rows
         |         AND o.ws_tokens = n.ws_tokens THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  o.n_rows AS old_rows, n.n_rows AS new_rows,
         |  coalesce(n.n_rows, 0) - coalesce(o.n_rows, 0) AS d_rows,
         |  coalesce(n.ws_tokens, 0) - coalesce(o.ws_tokens, 0) AS d_tokens,
         |  CAST(o.fp AS VARCHAR) AS old_fp, CAST(n.fp AS VARCHAR) AS new_fp
         |FROM mo o FULL OUTER JOIN mn n ON n.shard = o.shard
         |ORDER BY shard""".stripMargin
    },

    // Calibration/Brier oracle: identical integer tallies; the only
    // float ops are the final divisions and rounds.
    "q215_calibration_brier" ->
      """WITH s AS (
        |  SELECT (c_custkey * 37) % 100 AS p100,
        |    CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
        |  FROM customer)
        |SELECT CAST(floor(p100 / 10.0) AS INTEGER) AS bin,
        |  count(*) AS n,
        |  round(CAST(sum(p100) AS DOUBLE) / (count(*) * 100), 4) AS mean_pred,
        |  CAST(sum(y) AS BIGINT) AS positives,
        |  round(CAST(sum(y) AS DOUBLE) / count(*), 4) AS frac_pos,
        |  round(CAST(sum(CAST((p100 - y * 100) * (p100 - y * 100)
        |      AS DECIMAL(38,0))) AS DOUBLE) / (count(*) * 10000), 6) AS brier
        |FROM s GROUP BY 1 ORDER BY bin""".stripMargin,

    // DuckDB replay of redactPii: same pattern strings verbatim (the
    // shared Java/RE2 regex subset), counts on the raw text, 'g'-flag
    // global replace in the same category order. The CTE keeps the
    // pre-redaction text under a distinct name so the count exprs
    // can't accidentally bind to the redacted alias.
    "q109_pii_redact" ->
      """WITH withpii AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.0.1 ssn '
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' call 555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS rawtext
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(rawtext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g') AS text,
        |  CAST(len(regexp_extract_all(rawtext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(rawtext,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(rawtext,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(rawtext,
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS n_phone
        |FROM withpii""".stripMargin,

    // Segment dedup: same 20-token windows, same md5 partition key,
    // same (doc_id, seg_idx) first-occurrence order, same reassembly.
    "q111_segment_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS seg_idx,
        |    array_to_string(t[((i-1)*20+1):((i-1)*20+20)], ' ') AS seg
        |  FROM toks, LATERAL unnest(
        |    range(1, greatest(CAST(ceil(len(t)/20.0) AS BIGINT), 1) + 1)) AS u(i)),
        |flag AS (
        |  SELECT doc_id, seg_idx, seg,
        |    (row_number() OVER (PARTITION BY md5(seg)
        |       ORDER BY doc_id, seg_idx) = 1) AS keep
        |  FROM segs)
        |SELECT doc_id, count(*) AS n_segs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(
        |    list(seg ORDER BY seg_idx) FILTER (WHERE keep), ' '), '') AS retained
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // URL canonicalization: identical corpus construction, identical
    // stage order (trim -> fragment strip -> generated unreserved
    // percent-decode chain -> scheme/authority case -> default port ->
    // empty-path '/' -> tracking strip + param sort). The replace
    // chain interpolates Curation.unreservedEncodings — ONE source
    // list for both engines.
    "q223_urlnorm" ->
      (s"""WITH u0 AS (
         |  SELECT doc_id,
         |    trim('HTTP://WWW.EXAMPLE-' || source || '.COM:80/D%6fC/' ||
         |      CAST(doc_id AS VARCHAR) ||
         |      CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1&gclid=x#frag'
         |           WHEN doc_id % 4 = 1 THEN '?z=%7E1&A=2#x'
         |           WHEN doc_id % 4 = 2 THEN ''
         |           ELSE '?utm_campaign=c&utm_medium=m' END) AS t0
         |  FROM documents),
         |""".stripMargin + urlNormChainSql("doc_id") + "\n" +
        """SELECT doc_id, url_norm
          |FROM u8 ORDER BY doc_id""".stripMargin),

    // q268 oracle: the same page build, the RE2 href contract, then
    // the SHARED normalization chain (urlNormChainSql — byte-for-byte
    // the q223 replay) keyed by (source, href), and the two distinct
    // counts.
    "q268_frontier_urlnorm" ->
      (s"""WITH h AS (SELECT source,
         |    '<p><a href="https://' || upper(source) || '.example/d%6Fc/' ||
         |    CAST(doc_id AS VARCHAR) ||
         |    '?utm_source=feed&b=2&a=1">x</a> <a href="HTTPS://' ||
         |    source || '.EXAMPLE:443/doc/' || CAST(doc_id AS VARCHAR) ||
         |    '?a=1&b=2#frag">y</a> <a href="https://' || source ||
         |    '.example/other/' || CAST(doc_id % 7 AS VARCHAR) ||
         |    '">z</a></p>' AS html
         |  FROM documents),
         |u0 AS (SELECT source, href, href AS t0 FROM (
         |  SELECT source, unnest(regexp_extract_all(html,
         |    '(?is)<a\\b[^>]*?href="([^"]*)"', 1)) AS href FROM h) x),
         |""".stripMargin + urlNormChainSql("source, href") + "\n" +
        """SELECT source, count(*) AS n_links,
          |  count(DISTINCT href) AS n_raw_distinct,
          |  count(DISTINCT url_norm) AS n_resources
          |FROM u8 GROUP BY source ORDER BY source""".stripMargin),

    // Variable-span EXACTSUBSTR: per-granularity segmentation blocks
    // (UNION ALL, one per window size), the same (g, md5(seg))
    // first-occurrence rank, the same gaps-and-islands merge
    // (cum-max-end over preceding rows, RANGE-framed island sum), all
    // integers — stage-for-stage identical to segmentDedupSpans.
    "q222_dup_spans" -> {
      val granBlocks = Seq(100, 50, 20).map { g =>
        s"""  SELECT doc_id, n_tokens, $g AS g, CAST(i - 1 AS BIGINT) AS seg_idx,
           |    array_to_string(t[((i-1)*$g+1):((i-1)*$g+$g)], ' ') AS seg,
           |    CAST((i-1)*$g AS BIGINT) AS s,
           |    CAST(least((i-1)*$g + $g, n_tokens) AS BIGINT) AS e
           |  FROM base, LATERAL unnest(
           |    range(1, greatest(CAST(ceil(n_tokens/$g.0) AS BIGINT), 1) + 1)) AS u(i)""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |segs AS (
         |$granBlocks),
         |dups AS (
         |  SELECT doc_id, s, e FROM (
         |    SELECT doc_id, s, e,
         |      row_number() OVER (PARTITION BY g, md5(seg)
         |        ORDER BY doc_id, seg_idx) AS rk
         |    FROM segs)
         |  WHERE rk > 1),
         |isl AS (
         |  SELECT doc_id, s, e,
         |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |         OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      THEN 1 ELSE 0 END AS nw
         |  FROM dups),
         |isl2 AS (
         |  SELECT doc_id, s, e,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s, e DESC) AS island
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, island, min(s) AS ss, max(e) AS ee
         |  FROM isl2 GROUP BY doc_id, island),
         |per AS (
         |  SELECT doc_id, CAST(sum(ee - ss) AS BIGINT) AS dup_tokens,
         |    count(*) AS n_spans
         |  FROM spans GROUP BY doc_id)
         |SELECT b.doc_id AS doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  coalesce(p.dup_tokens, 0) AS dup_tokens,
         |  coalesce(p.n_spans, 0) AS n_spans
         |FROM base b LEFT JOIN per p ON b.doc_id = p.doc_id
         |ORDER BY b.doc_id""".stripMargin
    },

    // q230 oracle: q222's segmentation + rank + island stages with the
    // owner carried through — first occurrence per (g, hash) class =
    // min(doc_id) over the class; merged spans take the min owner.
    "q230_span_owners" -> {
      val granBlocks = Seq(100, 50, 20).map { g =>
        s"""  SELECT doc_id, n_tokens, $g AS g, CAST(i - 1 AS BIGINT) AS seg_idx,
           |    array_to_string(t[((i-1)*$g+1):((i-1)*$g+$g)], ' ') AS seg,
           |    CAST((i-1)*$g AS BIGINT) AS s,
           |    CAST(least((i-1)*$g + $g, n_tokens) AS BIGINT) AS e
           |  FROM base, LATERAL unnest(
           |    range(1, greatest(CAST(ceil(n_tokens/$g.0) AS BIGINT), 1) + 1)) AS u(i)""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |segs AS (
         |$granBlocks),
         |dups AS (
         |  SELECT doc_id, s, e, owner FROM (
         |    SELECT doc_id, s, e,
         |      row_number() OVER (PARTITION BY g, md5(seg)
         |        ORDER BY doc_id, seg_idx) AS rk,
         |      min(doc_id) OVER (PARTITION BY g, md5(seg)) AS owner
         |    FROM segs)
         |  WHERE rk > 1),
         |isl AS (
         |  SELECT doc_id, s, e, owner,
         |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         |         OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      THEN 1 ELSE 0 END AS nw
         |  FROM dups),
         |isl2 AS (
         |  SELECT doc_id, s, e, owner,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s, e DESC) AS island
         |  FROM isl)
         |SELECT doc_id, min(s) AS start, max(e) AS "end", min(owner) AS owner
         |FROM isl2 GROUP BY doc_id, island
         |ORDER BY doc_id, start""".stripMargin
    },

    // q238 oracle: q232's BM25 CTE chain (k=20, %50 queries) + q53's
    // cosine expression for the dense pool + q76's RRF union-agg, all
    // keyed (query_id, doc_id), top-5 per query.
    "q238_hybrid_retrieval" -> {
      val cos = graft.queries.DedupSim.cosSql
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), t -> t != '') AS toks
         |  FROM documents),
         |base AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
         |dt AS (
         |  SELECT doc_id, dl, tok AS term, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base)
         |  GROUP BY doc_id, dl, tok),
         |st AS (SELECT count(*) AS n, sum(dl) AS tot FROM base),
         |dfr AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
         |q AS (
         |  SELECT doc_id AS query_id, array_to_string(toks[1:5], ' ') AS qt
         |  FROM d WHERE doc_id % 50 = 0),
         |qterm AS (
         |  SELECT DISTINCT query_id, tok AS term
         |  FROM (SELECT query_id,
         |          unnest(list_filter(string_split(qt, ' '), t -> t != ''))
         |            AS tok
         |        FROM q)),
         |qside AS (
         |  SELECT query_id, qterm.term, df, n, tot
         |  FROM qterm JOIN dfr ON dfr.term = qterm.term, st
         |  WHERE df <= floor(1.0 * n)),
         |scored AS (
         |  SELECT query_id, doc_id,
         |    sum(CAST(
         |      ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |           / (CAST(df AS DOUBLE) + 0.5) + 1.0)
         |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
         |           / (CAST(tf AS DOUBLE)
         |              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
         |                  / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))
         |      AS DECIMAL(30,12))) AS s
         |  FROM dt JOIN qside ON qside.term = dt.term
         |  GROUP BY query_id, doc_id),
         |lex AS (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY s DESC, doc_id ASC) AS rk
         |  FROM scored),
         |dsc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    $cos AS sim
         |  FROM (SELECT vec_id, embedding AS ea FROM embeddings) c,
         |       (SELECT vec_id, embedding AS eb FROM embeddings
         |        WHERE vec_id % 50 = 0) q
         |  WHERE c.vec_id != q.vec_id),
         |dense AS (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, doc_id ASC) AS rk
         |  FROM dsc),
         |u AS (
         |  SELECT query_id, doc_id,
         |    CAST(1.0 AS DOUBLE) / (60.0 + CAST(rk AS DOUBLE)) AS c
         |  FROM lex WHERE rk <= 20
         |  UNION ALL
         |  SELECT query_id, doc_id,
         |    CAST(1.0 AS DOUBLE) / (60.0 + CAST(rk AS DOUBLE)) AS c
         |  FROM dense WHERE rk <= 20),
         |f AS (
         |  SELECT query_id, doc_id, sum(c) AS rrf
         |  FROM u GROUP BY query_id, doc_id)
         |SELECT query_id, CAST(rk AS INT) AS rk, doc_id,
         |  round(rrf, 6) AS rrf
         |FROM (
         |  SELECT query_id, doc_id, rrf,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, doc_id ASC) AS rk
         |  FROM f)
         |WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin
    },

    // q237 oracle: identical twin fixture (junk prefix of 1 + doc_id%7
    // unique tokens), anchor boundaries as positional md5 tests,
    // lead() successor = Spark's try_element_at(starts, j+2), then
    // q222's rank + island + rollup stages.
    "q237_anchored_spans" ->
      """WITH fixture AS (
        |  SELECT doc_id * 2 AS doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id * 2 + 1 AS doc_id,
        |    array_to_string(list_transform(range(1, (doc_id % 7 + 1) + 1),
        |      k -> 'j' || CAST(doc_id AS VARCHAR) || 'x' ||
        |        CAST(k AS VARCHAR)), ' ') || ' ' || text AS text
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM fixture),
        |starts AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s
        |  FROM base, LATERAL unnest(range(0, n_tokens)) u(i)
        |  WHERE i = 0 OR i % 512 = 0
        |     OR (CAST('0x' || substr(md5(t[CAST(i + 1 AS INTEGER)]), 1, 4)
        |           AS INTEGER) % 16) = 0),
        |segs0 AS (
        |  SELECT doc_id, s,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS seg_idx,
        |    lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
        |  FROM starts),
        |segs AS (
        |  SELECT s0.doc_id, seg_idx, s,
        |    least(coalesce(nxt, n_tokens), n_tokens) AS e,
        |    array_to_string(t[CAST(s + 1 AS INTEGER):
        |      CAST(least(coalesce(nxt, n_tokens), n_tokens) AS INTEGER)],
        |      ' ') AS seg
        |  FROM segs0 s0 JOIN base USING (doc_id)
        |  WHERE least(coalesce(nxt, n_tokens), n_tokens) - s >= 5),
        |dups AS (
        |  SELECT doc_id, s, e FROM (
        |    SELECT doc_id, s, e,
        |      row_number() OVER (PARTITION BY md5(seg)
        |        ORDER BY doc_id, seg_idx) AS rk
        |    FROM segs)
        |  WHERE rk > 1),
        |isl AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS nw
        |  FROM dups),
        |isl2 AS (
        |  SELECT doc_id, s, e,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s, e DESC) AS island
        |  FROM isl),
        |spans AS (
        |  SELECT doc_id, island, min(s) AS ss, max(e) AS ee
        |  FROM isl2 GROUP BY doc_id, island),
        |per AS (
        |  SELECT doc_id, CAST(sum(ee - ss) AS BIGINT) AS dup_tokens,
        |    count(*) AS n_spans
        |  FROM spans GROUP BY doc_id)
        |SELECT b.doc_id AS doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  coalesce(p.dup_tokens, 0) AS dup_tokens,
        |  coalesce(p.n_spans, 0) AS n_spans
        |FROM base b LEFT JOIN per p ON b.doc_id = p.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // Domain cap: the salted two-phase top-k is bit-identical to the
    // plain per-domain rank (exactness argument in Ops.scaladoc), so
    // the oracle is the direct window form.
    "q112_domain_cap" ->
      """SELECT source, doc_id, n_chars, rk FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rk
        |  FROM documents)
        |WHERE rk <= 15 ORDER BY source, rk""".stripMargin,

    // q290 oracle: the publicsuffix.org algorithm replayed generically
    // over the host's own suffixes — exception prevails (exc_i + 1),
    // else longest match (min i), else implicit * (last label);
    // wildcard matches via the one-label-shorter tail. The fixture
    // rule set is inlined (the q277 side-input precedent).
    "q290_registrable_domain" ->
      """WITH hosts AS (SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 0 THEN source || '.com'
        |    WHEN doc_id % 6 = 1 THEN 'a' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.' || source || '.blogspot.com'
        |    WHEN doc_id % 6 = 2 THEN 'www.' || source || '.co.uk'
        |    WHEN doc_id % 6 = 3 THEN 'x.www.ck'
        |    WHEN doc_id % 6 = 4 THEN 'y' || CAST(doc_id % 3 AS VARCHAR)
        |      || '.z.ck'
        |    ELSE source || '.example' END AS host
        |  FROM documents),
        |lab AS (SELECT doc_id, host, string_split(host, '.') AS labels,
        |  len(string_split(host, '.')) AS n FROM hosts),
        |s AS (SELECT doc_id, labels, n,
        |  unnest(generate_series(1, n)) AS i FROM lab),
        |m AS (SELECT doc_id, i, n,
        |  array_to_string(labels[i:], '.') AS suf,
        |  array_to_string(labels[i+1:], '.') AS tail FROM s),
        |g AS (SELECT doc_id,
        |  min(CASE WHEN suf = 'www.ck' THEN i END) AS exc_i,
        |  min(CASE WHEN suf IN ('com', 'co.uk', 'uk', 'blogspot.com')
        |    OR (i < n AND tail = 'ck') THEN i END) AS match_i
        |  FROM m GROUP BY doc_id),
        |r AS (SELECT l.doc_id, l.host, l.labels,
        |  least(coalesce(g.exc_i + 1, g.match_i, l.n), l.n) AS ps_i
        |  FROM lab l JOIN g USING (doc_id))
        |SELECT doc_id, host,
        |  array_to_string(labels[ps_i:], '.') AS public_suffix,
        |  CASE WHEN ps_i >= 2
        |    THEN array_to_string(labels[ps_i - 1:], '.') END AS reg_domain
        |FROM r ORDER BY doc_id""".stripMargin,

    // q291 oracle: reg_domain derived directly (the generic PSL
    // replay is q290's job — here blogspot sub-hosts collapse to
    // source.blogspot.com, co.uk rows to source.co.uk), then the
    // q112 cap window on the collapsed key.
    "q291_regdomain_cap" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  CASE WHEN doc_id % 6 = 1 THEN source || '.blogspot.com'
        |    ELSE source || '.co.uk' END AS reg_domain
        |  FROM documents)
        |SELECT reg_domain, doc_id, n_chars, rk FROM (
        |  SELECT reg_domain, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY reg_domain
        |      ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rk
        |  FROM d)
        |WHERE rk <= 10 ORDER BY reg_domain, rk""".stripMargin,

    // q294 oracle: Hamilton apportionment replayed in exact integer
    // SQL — floor quotas via //, remainders ranked DESC with key-asc
    // ties, the leftover units (997 − Σfloor) topped up one each.
    "q294_crawl_budget" ->
      """WITH w AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS tot FROM w),
        |b AS (SELECT source, n_docs,
        |  (997 * n_docs) // tot AS quota,
        |  (997 * n_docs) % tot AS rem FROM w CROSS JOIN t),
        |u AS (SELECT sum(quota) AS used FROM b),
        |r AS (SELECT source, n_docs, quota,
        |  row_number() OVER (ORDER BY rem DESC, source ASC) AS rn FROM b)
        |SELECT source, n_docs AS weight,
        |  CAST(quota + CASE WHEN rn <= 997 - used THEN 1 ELSE 0 END
        |    AS BIGINT) AS budget
        |FROM r CROSS JOIN u ORDER BY source""".stripMargin,

    "q132_mixture_drift" ->
      """WITH c AS (SELECT lang, count(*) AS nc FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS n_tot FROM documents),
        |sl AS (SELECT source, lang, count(*) AS ns
        |       FROM documents GROUP BY 1, 2),
        |st AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1)
        |SELECT sl.source, max(st.n_src) AS n_docs,
        |  round(CAST(sum(CAST(
        |    (CAST(sl.ns AS DOUBLE) / st.n_src) *
        |    ln((CAST(sl.ns AS DOUBLE) / st.n_src)
        |       / (CAST(c.nc AS DOUBLE) / tot.n_tot))
        |    AS DECIMAL(30,12))) AS DOUBLE), 6) AS kl,
        |  (CAST(sum(CAST(
        |    (CAST(sl.ns AS DOUBLE) / st.n_src) *
        |    ln((CAST(sl.ns AS DOUBLE) / st.n_src)
        |       / (CAST(c.nc AS DOUBLE) / tot.n_tot))
        |    AS DECIMAL(30,12))) AS DOUBLE) > 0.10) AS drifted
        |FROM sl JOIN st ON sl.source = st.source
        |JOIN c ON sl.lang = c.lang
        |CROSS JOIN tot
        |GROUP BY sl.source
        |ORDER BY sl.source""".stripMargin,

    // identical per-cell arithmetic: integer-exact numerator, double
    // ratio, decimal-quantized sum
    "q186_chisq_drift" ->
      """WITH sl AS (SELECT source, lang, count(*) AS nsl
        |            FROM documents GROUP BY 1, 2),
        |st AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
        |lt AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS n_tot FROM documents)
        |SELECT sl.source, max(st.ns) AS n_docs,
        |  round(CAST(sum(CAST(
        |    (CAST(sl.nsl * tot.n_tot - st.ns * lt.nl AS DOUBLE) *
        |     CAST(sl.nsl * tot.n_tot - st.ns * lt.nl AS DOUBLE)) /
        |    (CAST(tot.n_tot AS DOUBLE) * st.ns * lt.nl)
        |    AS DECIMAL(30,12))) AS DOUBLE), 6) AS chi2,
        |  count(*) AS n_cells
        |FROM sl JOIN st ON sl.source = st.source
        |JOIN lt ON sl.lang = lt.lang
        |CROSS JOIN tot
        |GROUP BY sl.source
        |ORDER BY sl.source""".stripMargin,

    // identical exact integer statistics (HUGEINT = the 128-bit exact
    // twin of Spark's decimal(38,0) sums), identical fixed-order Welch
    // arithmetic — the variance products run in DOUBLES on both sides
    // because n·q / s·s individually outgrow 38 digits (ADVICE r11);
    // numerator clamped with greatest(…, 0.0) exactly as the Spark
    // side so double cancellation can't make sqrt NaN (ADVICE r12)
    "q191_ttest_drift" ->
      """WITH d AS (
        |  SELECT source, CAST(n_chars AS HUGEINT) AS x FROM documents),
        |per AS (
        |  SELECT source, count(*) AS n1, sum(x) AS s1, sum(x * x) AS q1
        |  FROM d GROUP BY source),
        |tot AS (
        |  SELECT count(*) AS ng, sum(x) AS sg, sum(x * x) AS qg FROM d),
        |j AS (
        |  SELECT source, n1, s1, q1,
        |    ng - n1 AS n2, sg - s1 AS s2, qg - q1 AS q2
        |  FROM per CROSS JOIN tot),
        |v AS (
        |  SELECT source, n1, n2, s1, s2,
        |    greatest(CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE), 0.0)
        |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
        |    greatest(CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
        |        - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE), 0.0)
        |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2
        |  FROM j WHERE n1 > 1 AND n2 > 1),
        |ts AS (
        |  SELECT source, n1,
        |    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
        |      AS t
        |  FROM v)
        |SELECT source, n1 AS n_docs, round(t, 6) AS t_stat,
        |  (abs(t) > 2.0) AS shifted
        |FROM ts ORDER BY source""".stripMargin,

    // same per-score tallies, same integer Mann-Whitney algebra; the
    // oracle's plain cumulative window is the relation the
    // distributed runningTotal must reproduce
    "q198_auc_exact" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(text, ' '), t -> t != ''))
         |      AS tok
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(sum((${HashWeights.mkString("[", ",", "]")})[
         |      (CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 64) + 1])
         |      + 2 AS BIGINT) AS score
         |  FROM tok GROUP BY doc_id),
         |lab AS (
         |  SELECT sc.score, (d.lang = 'en') AS pos
         |  FROM sc JOIN documents d USING (doc_id)),
         |per AS (
         |  SELECT score,
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
         |  FROM lab GROUP BY score),
         |c AS (
         |  SELECT score, np, nn,
         |    sum(nn) OVER (ORDER BY score) - nn AS cumb
         |  FROM per)
         |SELECT CAST(sum(np) AS BIGINT) AS p,
         |  CAST(sum(nn) AS BIGINT) AS n,
         |  CAST(CAST(sum(CAST(np AS HUGEINT) * (2 * cumb + nn))
         |    AS DECIMAL(38,0)) AS VARCHAR) AS auc_num2,
         |  CAST(CAST(2 * sum(np) * sum(nn) AS DECIMAL(38,0))
         |    AS VARCHAR) AS auc_den2,
         |  round(CAST(sum(CAST(np AS HUGEINT) * (2 * cumb + nn)) AS DOUBLE)
         |    / CAST(sum(np) * sum(nn) * 2 AS DOUBLE), 6) AS auc
         |FROM c""".stripMargin,

    // q233 oracle: q198's score CTE, the same per-doc accuracy diff,
    // a 200-resample grid with md5-unit Poisson(1) weights — the CASE
    // thresholds interpolate Drift.PoissonCdf (shortest-roundtrip
    // Double.toString parses to the identical double), exact integer
    // resample sums in decimal(38,0), totals as digit strings.
    "q233_bootstrap_eval" -> {
      val caseChain = graft.operators.Drift.PoissonCdf.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(text, ' '), t -> t != ''))
         |      AS tok
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(sum((${HashWeights.mkString("[", ",", "]")})[
         |      (CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 64) + 1])
         |      + 2 AS BIGINT) AS score
         |  FROM tok GROUP BY doc_id),
         |dd AS (
         |  SELECT sc.doc_id,
         |    CAST(CASE WHEN (score > 80) = (d.lang = 'en') THEN 1 ELSE 0 END
         |       - CASE WHEN (score > 60) = (d.lang = 'en') THEN 1 ELSE 0 END
         |      AS BIGINT) AS d
         |  FROM sc JOIN documents d USING (doc_id)),
         |wt AS (
         |  SELECT r, d, CASE $caseChain ELSE 8 END AS w
         |  FROM (
         |    SELECT doc_id, d, r,
         |      CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
         |          || CAST(r AS VARCHAR) || ':bs1'), 1, 8) AS BIGINT)
         |        AS DOUBLE) / 4294967296.0 AS u
         |    FROM dd, range(200) t(r))),
         |ps AS (
         |  SELECT r, CAST(sum(CAST(w * d AS DECIMAL(38,0)))
         |    AS DECIMAL(38,0)) AS s
         |  FROM wt GROUP BY r),
         |obs AS (
         |  SELECT CAST(sum(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tot
         |  FROM dd)
         |SELECT CAST(count(*) AS INT) AS resamples,
         |  CAST(tot AS VARCHAR) AS total_diff,
         |  CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         |  round(CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS frac_pos
         |FROM ps, obs GROUP BY tot""".stripMargin
    },

    // q234 oracle: identical tokenization, position-indexed bigrams
    // (range is end-exclusive = Spark's sequence(1, n-1)), exact
    // integer count tables, ONE fixed-order double logp per bigram
    // quantized to decimal(30,12) pre-sum, final division only.
    "q234_lm_quality" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> t != '') AS t,
        |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n
        |  FROM documents),
        |tb AS (
        |  SELECT t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i)
        |  WHERE lang = 'en' AND n >= 2),
        |btab AS (SELECT bg, count(*) AS b FROM tb GROUP BY bg),
        |utab AS (
        |  SELECT w1, count(*) AS u FROM (
        |    SELECT unnest(t) AS w1 FROM base WHERE lang = 'en')
        |  GROUP BY w1),
        |v AS (SELECT count(*) AS v FROM utab),
        |sb AS (
        |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |lp AS (
        |  SELECT doc_id,
        |    CAST(ln((CAST(coalesce(b, 0) AS DOUBLE) + 0.5)
        |      / (CAST(coalesce(u, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
        |      AS DECIMAL(30,12)) AS lp
        |  FROM sb LEFT JOIN btab USING (bg) LEFT JOIN utab USING (w1), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS xent
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q248 oracle: the contest construction (qualitySql both sides),
    // exact win/game count tables, then 8 MM rounds unrolled as
    // generated CTEs — denominator terms quantized to decimal(30,12)
    // pre-sum exactly like the Spark loop, one double division per
    // update, exact-decimal mean normalization at the end.
    "q248_bradley_terry" -> {
      val qa = TextQueries.qualitySql("a.text")
      val qb = TextQueries.qualitySql("b.text")
      val its = (1 to 8).map { k =>
        val pv = s"v${k - 1}"
        s"""d$k AS (
           |  SELECT p.i, sum(CAST(p.nij / (x.v + y.v) AS DECIMAL(30,12))) AS d
           |  FROM pair p JOIN $pv x ON x.i = p.i JOIN $pv y ON y.i = p.j
           |  GROUP BY p.i),
           |v$k AS MATERIALIZED (
           |  SELECT wt.i, wt.W / CAST(d.d AS DOUBLE) AS v
           |  FROM wt JOIN d$k d ON d.i = wt.i)"""
      }.mkString(",\n")
      s"""WITH ct AS (
         |  SELECT CASE WHEN qa >= qb THEN sa ELSE sb END AS w,
         |         CASE WHEN qa >= qb THEN sb ELSE sa END AS l
         |  FROM (
         |    SELECT a.source AS sa, b.source AS sb,
         |      $qa AS qa,
         |      $qb AS qb
         |    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |    WHERE a.source != b.source)),
         |dir AS (SELECT w, l, count(*) AS n FROM ct GROUP BY w, l),
         |both0 AS (
         |  SELECT i, j, CAST(sum(win) AS BIGINT) AS wn,
         |    CAST(sum(g) AS BIGINT) AS gn
         |  FROM (
         |    SELECT w AS i, l AS j, n AS win, n AS g FROM dir
         |    UNION ALL SELECT l AS i, w AS j, 0 AS win, n AS g FROM dir)
         |  GROUP BY i, j),
         |pair AS MATERIALIZED (
         |  SELECT i, j, CAST(gn AS DOUBLE) + 1.0 AS nij FROM both0),
         |wt AS MATERIALIZED (
         |  SELECT i, CAST(sum(wn) AS DOUBLE)
         |      + CAST(count(*) AS DOUBLE) * 0.5 AS W,
         |    CAST(sum(gn) AS BIGINT) AS n_games,
         |    CAST(sum(wn) AS BIGINT) AS n_wins
         |  FROM both0 GROUP BY i),
         |v0 AS (SELECT i, 1.0 AS v FROM wt),
         |$its,
         |nr AS (
         |  SELECT CAST(sum(CAST(v AS DECIMAL(30,12))) AS DECIMAL(38,12)) AS s,
         |    count(*) AS c FROM v8)
         |SELECT wt.i AS item, n_games, n_wins,
         |  round(v * CAST(c AS DOUBLE) / CAST(s AS DOUBLE), 6) AS score
         |FROM v8 JOIN wt ON wt.i = v8.i, nr ORDER BY item""".stripMargin
    },

    // q246 oracle: exact KN count tables (bigram counts, context
    // rollup c1/nf, continuation rollup nb, 1-row Ntypes/Vcont), then
    // the identical fixed-order double per bigram — discount arm order
    // matches the Spark expression term for term.
    "q246_kneser_ney" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> t != '') AS t,
        |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n
        |  FROM documents),
        |tb AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM base, LATERAL unnest(range(1, n)) u(i)
        |  WHERE lang = 'en' AND n >= 2),
        |btab AS (SELECT w1, w2, count(*) AS b FROM tb GROUP BY w1, w2),
        |ctx AS (
        |  SELECT w1, CAST(sum(b) AS BIGINT) AS c1, count(*) AS nf
        |  FROM btab GROUP BY w1),
        |cont AS (SELECT w2, count(*) AS nb FROM btab GROUP BY w2),
        |gl AS (
        |  SELECT (SELECT count(*) FROM btab) AS nt,
        |    (SELECT count(*) FROM cont) AS vc),
        |sb AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |sc AS (
        |  SELECT doc_id, b, c1, nf,
        |    (CAST(coalesce(nb, 0) AS DOUBLE) + 0.5)
        |      / (CAST(nt AS DOUBLE) + 0.5 * (CAST(vc AS DOUBLE) + 1.0)) AS pc
        |  FROM sb LEFT JOIN btab USING (w1, w2) LEFT JOIN ctx USING (w1)
        |    LEFT JOIN cont USING (w2), gl),
        |lp AS (
        |  SELECT doc_id, CAST(ln(
        |    CASE WHEN c1 IS NULL THEN pc
        |    ELSE greatest(CAST(coalesce(b, 0) AS DOUBLE) - 0.75, 0.0)
        |        / CAST(c1 AS DOUBLE)
        |      + 0.75 * CAST(nf AS DOUBLE) / CAST(c1 AS DOUBLE) * pc END)
        |    AS DECIMAL(30,12)) AS lp
        |  FROM sc)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS xent
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q243 oracle: the q234 chain TWICE — target tables from the
    // English slice, raw tables from the whole pool — joined per doc;
    // mls is a fixed-order difference of the two rounded doubles.
    "q243_moore_lewis" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> t != '') AS t,
        |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n
        |  FROM documents),
        |tbt AS (
        |  SELECT t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i)
        |  WHERE lang = 'en' AND n >= 2),
        |btt AS (SELECT bg, count(*) AS b FROM tbt GROUP BY bg),
        |utt AS (
        |  SELECT w1, count(*) AS u FROM (
        |    SELECT unnest(t) AS w1 FROM base WHERE lang = 'en')
        |  GROUP BY w1),
        |vt AS (SELECT count(*) AS v FROM utt),
        |tbr AS (
        |  SELECT t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |btr AS (SELECT bg, count(*) AS b FROM tbr GROUP BY bg),
        |utr AS (
        |  SELECT w1, count(*) AS u FROM (
        |    SELECT unnest(t) AS w1 FROM base) GROUP BY w1),
        |vr AS (SELECT count(*) AS v FROM utr),
        |sb AS (
        |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |lpt AS (
        |  SELECT doc_id,
        |    CAST(ln((CAST(coalesce(b, 0) AS DOUBLE) + 0.5)
        |      / (CAST(coalesce(u, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
        |      AS DECIMAL(30,12)) AS lp
        |  FROM sb LEFT JOIN btt USING (bg) LEFT JOIN utt USING (w1), vt),
        |lpr AS (
        |  SELECT doc_id,
        |    CAST(ln((CAST(coalesce(b, 0) AS DOUBLE) + 0.5)
        |      / (CAST(coalesce(u, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
        |      AS DECIMAL(30,12)) AS lp
        |  FROM sb LEFT JOIN btr USING (bg) LEFT JOIN utr USING (w1), vr),
        |xt AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS xent_target
        |  FROM lpt GROUP BY doc_id),
        |xr AS (
        |  SELECT doc_id,
        |    round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS xent_raw
        |  FROM lpr GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, xent_target, xent_raw,
        |  round(xent_raw - xent_target, 6) AS mls
        |FROM xt JOIN xr USING (doc_id) ORDER BY doc_id""".stripMargin,

    // q241 oracle: q235's per-language count tables, but each doc
    // scores ONE model (its own language); xent rounded to 6dp for
    // output and 2dp as the histogram bin; tertile cutoffs from the
    // integer 3·cum ≥ n / ≥ 2n tests over the per-language histogram.
    "q241_ppl_buckets" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> t != '') AS t,
        |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n
        |  FROM documents),
        |tb AS (
        |  SELECT lang AS lab, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |btab AS (SELECT lab, bg, count(*) AS b FROM tb GROUP BY lab, bg),
        |utab AS (
        |  SELECT lab, w1, count(*) AS u FROM (
        |    SELECT lang AS lab, unnest(t) AS w1 FROM base)
        |  GROUP BY lab, w1),
        |vtab AS (SELECT lab, count(*) AS v FROM utab GROUP BY lab),
        |sb AS (
        |  SELECT doc_id, lang AS lab, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |lp AS (
        |  SELECT doc_id, sb.lab,
        |    CAST(ln((CAST(coalesce(b, 0) AS DOUBLE) + 0.5)
        |      / (CAST(coalesce(u, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
        |      AS DECIMAL(30,12)) AS lp
        |  FROM sb
        |  LEFT JOIN btab ON btab.lab = sb.lab AND btab.bg = sb.bg
        |  LEFT JOIN utab ON utab.lab = sb.lab AND utab.w1 = sb.w1
        |  JOIN vtab ON vtab.lab = sb.lab),
        |sc AS (
        |  SELECT doc_id, lab,
        |    round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS xent,
        |    round(-CAST(sum(lp) AS DOUBLE) / count(*), 2) AS bin
        |  FROM lp GROUP BY doc_id, lab),
        |hist AS (SELECT lab, bin, count(*) AS c FROM sc GROUP BY lab, bin),
        |cum AS (
        |  SELECT lab, bin,
        |    sum(c) OVER (PARTITION BY lab ORDER BY bin) AS cum,
        |    sum(c) OVER (PARTITION BY lab) AS nl
        |  FROM hist),
        |cuts AS (
        |  SELECT lab,
        |    min(CASE WHEN cum * 3 >= nl THEN bin END) AS c1,
        |    min(CASE WHEN cum * 3 >= nl * 2 THEN bin END) AS c2
        |  FROM cum GROUP BY lab)
        |SELECT doc_id, lab AS lang, xent,
        |  CASE WHEN bin <= c1 THEN 'head' WHEN bin <= c2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM sc JOIN cuts USING (lab) ORDER BY doc_id""".stripMargin,

    // q235 oracle: per-language count tables, the |labels|-fold score
    // grid, the same decimal log-prob sums, and the (s DESC, lab ASC)
    // rank = Spark's min(struct(-s, lab)) argmin.
    "q235_lm_langid" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> t != '') AS t,
        |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n
        |  FROM documents),
        |tb AS (
        |  SELECT lang AS lab, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |btab AS (SELECT lab, bg, count(*) AS b FROM tb GROUP BY lab, bg),
        |utab AS (
        |  SELECT lab, w1, count(*) AS u FROM (
        |    SELECT lang AS lab, unnest(t) AS w1 FROM base)
        |  GROUP BY lab, w1),
        |vtab AS (SELECT lab, count(*) AS v FROM utab GROUP BY lab),
        |sb AS (
        |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |lp AS (
        |  SELECT doc_id, vt.lab,
        |    CAST(ln((CAST(coalesce(b, 0) AS DOUBLE) + 0.5)
        |      / (CAST(coalesce(u, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
        |      AS DECIMAL(30,12)) AS lp
        |  FROM sb CROSS JOIN vtab vt
        |  LEFT JOIN btab ON btab.lab = vt.lab AND btab.bg = sb.bg
        |  LEFT JOIN utab ON utab.lab = vt.lab AND utab.w1 = sb.w1),
        |ps AS (
        |  SELECT doc_id, lab, sum(lp) AS s FROM lp GROUP BY doc_id, lab),
        |pr AS (
        |  SELECT doc_id, lab AS pred FROM (
        |    SELECT doc_id, lab,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY s DESC, lab ASC) AS rk
        |    FROM ps) WHERE rk = 1)
        |SELECT d.lang, pr.pred, count(*) AS n_docs
        |FROM pr JOIN documents d USING (doc_id)
        |GROUP BY d.lang, pr.pred
        |ORDER BY d.lang, pr.pred""".stripMargin,

    // q236 oracle: identical unsegmented fixture (space-strip /
    // reverse), char tokens as positional substr(tx, i, 1) — exactly
    // Spark's filtered split("") — then q235's count tables, decimal
    // log-prob sums, and (s DESC, lab ASC) argmin rank.
    "q236_lm_char_langid" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'aa' ELSE 'bb' END AS lang,
        |    CASE WHEN doc_id % 2 = 0 THEN replace(text, ' ', '')
        |         ELSE reverse(replace(text, ' ', '')) END AS tx
        |  FROM documents),
        |b2 AS (SELECT doc_id, lang, tx, len(tx) AS n FROM base),
        |tb AS (
        |  SELECT lang AS lab,
        |    substr(tx, CAST(i AS INTEGER), 1) || ' ' ||
        |      substr(tx, CAST(i + 1 AS INTEGER), 1) AS bg
        |  FROM b2, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |btab AS (SELECT lab, bg, count(*) AS b FROM tb GROUP BY lab, bg),
        |utab AS (
        |  SELECT lab, w1, count(*) AS u FROM (
        |    SELECT lang AS lab, substr(tx, CAST(i AS INTEGER), 1) AS w1
        |    FROM b2, LATERAL unnest(range(1, n + 1)) u(i))
        |  GROUP BY lab, w1),
        |vtab AS (SELECT lab, count(*) AS v FROM utab GROUP BY lab),
        |sb AS (
        |  SELECT doc_id, substr(tx, CAST(i AS INTEGER), 1) AS w1,
        |    substr(tx, CAST(i AS INTEGER), 1) || ' ' ||
        |      substr(tx, CAST(i + 1 AS INTEGER), 1) AS bg
        |  FROM b2, LATERAL unnest(range(1, n)) u(i) WHERE n >= 2),
        |lp AS (
        |  SELECT doc_id, vt.lab,
        |    CAST(ln((CAST(coalesce(b, 0) AS DOUBLE) + 0.5)
        |      / (CAST(coalesce(u, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
        |      AS DECIMAL(30,12)) AS lp
        |  FROM sb CROSS JOIN vtab vt
        |  LEFT JOIN btab ON btab.lab = vt.lab AND btab.bg = sb.bg
        |  LEFT JOIN utab ON utab.lab = vt.lab AND utab.w1 = sb.w1),
        |ps AS (
        |  SELECT doc_id, lab, sum(lp) AS s FROM lp GROUP BY doc_id, lab),
        |pr AS (
        |  SELECT doc_id, lab AS pred FROM (
        |    SELECT doc_id, lab,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY s DESC, lab ASC) AS rk
        |    FROM ps) WHERE rk = 1)
        |SELECT b.lang, pr.pred, count(*) AS n_docs
        |FROM pr JOIN base b USING (doc_id)
        |GROUP BY b.lang, pr.pred
        |ORDER BY b.lang, pr.pred""".stripMargin,

    // identical md5 bucket, identical literal weight list, bias 2
    "q190_hashed_inference" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(text, ' '), t -> t != ''))
         |      AS tok
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(sum((${HashWeights.mkString("[", ",", "]")})[
         |    (CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 64) + 1])
         |    + 2 AS BIGINT) AS score,
         |  count(*) AS n_feats,
         |  (CAST(sum((${HashWeights.mkString("[", ",", "]")})[
         |    (CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 64) + 1])
         |    + 2 AS BIGINT) > 0) AS keep
         |FROM tok
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
  )
}
