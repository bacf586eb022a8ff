package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.BuildError

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_pipe_$tag").toString

  private def writeCsv(path: String, lines: String*): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath, lines.mkString("\n"))
  }

  private def readOut(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    // explicit UTF-8: Spark writes UTF-8; Source's default codec is the
    // platform charset, which is ASCII in this container
    d.listFiles().filter(_.getName.startsWith("part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
  }

  test("word parsing: args, flags, bad words") {
    val m = Pipeline.parseWord("csvread:in=a:sep=;:header=0:trim")
    assert(m.name == "csvread")
    assert(m.args == Map("in" -> "a", "sep" -> ";", "header" -> "0", "trim" -> "1"))
    intercept[BuildError](Pipeline.parseWord("bad-name:x=1"))
  }

  test("url= keeps its colons but yields to known key= args after it") {
    // the documented usage order (url= first, table=/in= after) parses
    val m = Pipeline.parseWord(
      "jdbcselect:url=jdbc:derby:memory:db;create=true:table=t:in=s")
    assert(m.args("url") == "jdbc:derby:memory:db;create=true")
    assert(m.args("table") == "t" && m.args("in") == "s")
    // url in last position still swallows everything
    val last = Pipeline.parseWord("jdbcinsert:in=s:url=jdbc:h2:mem:test")
    assert(last.args("url") == "jdbc:h2:mem:test" && last.args("in") == "s")
  }

  test("reference example pipeline: fileread csvread ndjsonwrite filewrite") {
    val in = tmp("rt") + "/in.csv"
    writeCsv(in, "a,b", "1,x", "2,y")
    val out = tmp("rt") + "/out.ndjson"
    Pipeline.run(spark, Seq(
      s"fileread:in=$in", "csvread", "ndjsonwrite", s"filewrite:out=$out"))
    val lines = readOut(out).sorted
    assert(lines == Seq("""{"a":"1","b":"x"}""", """{"a":"2","b":"y"}"""))
  }

  test("warcread -> htmlextract -> csvwrite: crawl file to corpus csv") {
    import java.nio.charset.StandardCharsets.UTF_8
    val d = tmp("warcchain")
    def page(i: Int) =
      s"""<html><head><title>Page $i</title><style>.x{color:red}</style>""" +
        """</head><body><nav><a href="/">Home</a> <a href="/a">About""" +
        s"""</a></nav><p>the quick brown fox number $i jumps over the """ +
        s"""lazy dog again and again tonight</p>""" +
        """<footer><a href="/p">privacy</a></footer></body></html>"""
    graft.formats.Warc.write(s"$d/crawl.warc.gz",
      Iterator(("warcinfo", null: String, null: String,
        "meta".getBytes(UTF_8), null: java.lang.Integer, null: String)) ++
        (1 to 3).iterator.map(i =>
          ("response", s"https://h.example/$i", "2026-01-01T00:00:00Z",
            page(i).getBytes(UTF_8), Int.box(200): java.lang.Integer,
            "text/html; charset=utf-8")))
    val out = s"$d/out.csv"
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/*.warc.gz:out=pages",
      "htmlextract:in=pages:html=text:out=ex",
      "column:in=ex:clist=url,title,main_text:out=sel",
      "sort:in=sel:by=url:out=srt",
      "csvwrite:in=srt:out=w", s"filewrite:in=w:out=$out"))
    val lines = readOut(out)
    assert(lines.head == "url,title,main_text")
    assert(lines.size == 4)
    for ((l, i) <- lines.tail.zipWithIndex) {
      assert(l.startsWith(s"https://h.example/${i + 1},Page ${i + 1},"))
      assert(l.contains(s"fox number ${i + 1} jumps"))
      assert(!l.contains("Home") && !l.contains("privacy")) // boilerplate out
    }
  }

  test("implicit stream chaining matches explicit naming") {
    val in = tmp("chain") + "/in.csv"
    writeCsv(in, "a,b", "1,x", "2,y")
    val out = tmp("chain") + "/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$in:out=s1", "csvread:in=s1:out=s2",
      "column:in=s2:clist=b:out=s3", "csvwrite:in=s3:out=s4",
      s"filewrite:in=s4:out=$out"))
    assert(readOut(out) == Seq("b", "x", "y"))
  }

  test("novelty module scores the in-stream against the ref stream") {
    // two-stream read path: ref= names a second registered stream
    val d = tmp("novelty")
    writeCsv(d + "/ref.csv", "id,body",
      "1,alpha beta gamma delta epsilon zeta",
      "2,beta gamma delta epsilon zeta eta")
    writeCsv(d + "/new.csv", "id,body",
      "10,alpha beta gamma delta epsilon zeta", // fully seen -> 0.0
      "11,one two three four five six")         // fully novel -> 1.0
    val out = d + "/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/ref.csv:out=r0", "csvread:in=r0:out=ref",
      s"fileread:in=$d/new.csv:out=n0", "csvread:in=n0:out=nw",
      "novelty:in=nw:ref=ref:key=id:text=body:k=5:out=sc",
      "csvwrite:in=sc:out=w", s"filewrite:in=w:out=$out"))
    val rows = readOut(out).drop(1).map(_.split(",")).map(a => a(0) -> a(3))
    assert(rows.toMap == Map("10" -> "0.0", "11" -> "1.0"), rows.toString)
  }

  test("robotsfilter + sitemaps modules: rules gate the URL stream") {
    val d = tmp("robots")
    // the robots body carries real newlines — ndjson's escapes
    // deliver them through the line-delimited reader. CRLF endings +
    // a robots-side host column named differently from the URL
    // stream's (rhost=) both exercised here.
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "robots.ndjson"),
      ("{\"srv\":\"h.example\",\"body\":\"User-agent: graftbot\\r\\n" +
        "Disallow: /priv/*\\r\\nAllow: /priv/ok$\\r\\nUser-agent: *\\r\\n" +
        "Disallow: /\\r\\nSitemap: https://h.example/sm.xml\\r\\n\"}\n")
        .getBytes("UTF-8"))
    writeCsv(d + "/urls.csv", "id,host,path",
      "1,h.example,/priv/ok",   // allow beats /priv/* on length
      "2,h.example,/priv/no",   // disallowed
      "3,h.example,/open",      // no rule -> allowed
      "4,other.example,/priv/no") // no rules for host -> allowed
    val out = d + "/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/robots.ndjson:out=r0", "ndjsonread:in=r0:out=rob",
      s"fileread:in=$d/urls.csv:out=u0", "csvread:in=u0:out=urls",
      "robotsfilter:in=urls:robots=rob:agent=GraftBot:key=id" +
        ":host=host:rhost=srv:path=path:content=body:out=v",
      "csvwrite:in=v:out=w", s"filewrite:in=w:out=$out"))
    val rows = readOut(out).drop(1).map(_.split(",", -1))
      .map(a => a(0) -> a(3)).toMap
    assert(rows == Map("1" -> "true", "2" -> "false", "3" -> "true",
      "4" -> "true"), rows.toString)
    val out2 = d + "/sm.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/robots.ndjson:out=r1", "ndjsonread:in=r1:out=rb",
      "sitemaps:in=rb:host=srv:content=body:out=s",
      "csvwrite:in=s:out=sw", s"filewrite:in=sw:out=$out2"))
    assert(readOut(out2).drop(1) == Seq("h.example,https://h.example/sm.xml"))
  }

  test("cdxindex module: capture index from a container, SURT-sorted") {
    import java.nio.charset.StandardCharsets.UTF_8
    val d = tmp("cdx")
    graft.formats.Warc.write(s"$d/c.warc.gz", Iterator(
      ("warcinfo", null: String, null: String, "m".getBytes(UTF_8),
        null: java.lang.Integer, null: String),
      ("response", "https://b.example/x", "2026-01-02T03:04:05Z",
        "one".getBytes(UTF_8), Int.box(200): java.lang.Integer, "text/plain"),
      ("response", "https://a.example/y?q=1", "2026-01-02T03:04:06Z",
        "two".getBytes(UTF_8), Int.box(404): java.lang.Integer, "text/plain")))
    val out = s"$d/cdx.csv"
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/*.warc.gz:out=recs",
      "cdxindex:in=recs:out=idx",
      "sort:in=idx:by=urlkey,ts14:out=srt",
      "column:in=srt:clist=urlkey,ts14,status,rec_no:out=sel",
      "csvwrite:in=sel:out=w", s"filewrite:in=w:out=$out"))
    val lines = readOut(out)
    // warcinfo excluded; SURT reverses host parts so a.example sorts
    // first; rec_no is the 1-based in-file ordinal (warcinfo was #1)
    assert(lines == Seq("urlkey,ts14,status,rec_no",
      "\"example,a)/y?q=1\",20260102030406,404,3",
      "\"example,b)/x\",20260102030405,200,2"), lines.mkString("|"))
  }

  test("cdxlookup module: domain scope keeps subdomains, drops the prefix-collision host") {
    import java.nio.charset.StandardCharsets.UTF_8
    val d = tmp("cdxscope")
    graft.formats.Warc.write(s"$d/c.warc.gz", Iterator(
      ("response", "https://a.example/1", "2026-01-01T00:00:00Z",
        "x".getBytes(UTF_8), Int.box(200): java.lang.Integer, "text/plain"),
      ("response", "https://sub.a.example/2", "2026-01-01T00:00:00Z",
        "y".getBytes(UTF_8), Int.box(200): java.lang.Integer, "text/plain"),
      ("response", "https://ab.example/3", "2026-01-01T00:00:00Z",
        "z".getBytes(UTF_8), Int.box(200): java.lang.Integer, "text/plain")))
    val out = s"$d/hits.csv"
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/*.warc.gz:out=recs",
      "cdxindex:in=recs:out=idx",
      "cdxlookup:in=idx:scope=domain:key=example,a:out=hit",
      "sort:in=hit:by=urlkey:out=srt",
      "column:in=srt:clist=urlkey:out=sel",
      "csvwrite:in=sel:out=w", s"filewrite:in=w:out=$out"))
    assert(readOut(out) == Seq("urlkey",
      "\"example,a)/1\"", "\"example,a,sub)/2\""))
  }

  test("crawl loop e2e: warcread -> outlinks -> robotsfilter -> pagerank -> crawlschedule") {
    // VERDICT r17 next #5: the operationally complete crawl loop as
    // ONE pipeline — container in, per-host fetch schedule out. The
    // robots gate is load-bearing: host x.example is linked ONLY via
    // a disallowed path, so it must never reach the frontier or the
    // schedule; b.example declares Crawl-delay 2 for graftbot, a gets
    // the politeness default.
    import java.nio.charset.StandardCharsets.UTF_8
    val d = tmp("crawlsched")
    def page(links: String*) = ("<html><body>" +
      links.map(u => s"""<p><a href="$u">x</a></p>""").mkString +
      "</body></html>")
    graft.formats.Warc.write(s"$d/crawl.warc.gz", Iterator(
      ("response", "https://a.example/p1", "2026-01-01T00:00:00Z",
        page("https://b.example/ok", "https://x.example/priv/no")
          .getBytes(UTF_8), Int.box(200): java.lang.Integer, "text/html"),
      ("response", "https://b.example/p2", "2026-01-01T00:00:00Z",
        page("https://a.example/z").getBytes(UTF_8),
        Int.box(200): java.lang.Integer, "text/html")))
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "robots.ndjson"),
      ("{\"host\":\"x.example\",\"body\":\"User-agent: graftbot\\n" +
        "Disallow: /priv/*\\n\"}\n" +
        "{\"host\":\"b.example\",\"body\":\"User-agent: graftbot\\n" +
        "Crawl-delay: 2\\n\"}\n").getBytes("UTF-8"))
    val out = s"$d/sched.csv"
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/*.warc.gz:out=pages",
      "select:in=pages:out=ph:exprs=url;text as html",
      "outlinks:in=ph:html=html:out=lk",
      "sql:in=lk:out=l2:query=SELECT href, " +
        "substring_index(substr(href, 9, 100000), '/', 1) AS dst, " +
        "substr(substr(href, 9, 100000), " +
        "length(substring_index(substr(href, 9, 100000), '/', 1)) + 1) " +
        "AS path, substring_index(substring_index(url, '/', 3), '/', -1) " +
        "AS src FROM __in WHERE href LIKE 'https://%'",
      s"fileread:in=$d/robots.ndjson:out=r0", "ndjsonread:in=r0:out=rob",
      "robotsfilter:in=l2:robots=rob:agent=GraftBot:key=href:host=dst" +
        ":rhost=host:path=path:content=body:out=v",
      "filter:in=v:expr=allowed:out=g",
      "sql:in=g:views=l2:out=e:query=SELECT DISTINCT l2.src, l2.dst " +
        "FROM __in JOIN l2 ON __in.href = l2.href",
      "pagerank:in=e:iters=2:out=pr",
      "select:in=pr:out=rk:exprs=id as host" +
        ";cast(floor(r * 1e10) as bigint) as r_e10",
      "crawldelays:in=rob:agent=GraftBot:host=host:content=body:out=dl",
      "crawlschedule:in=rk:delays=dl:host=host:rank=r_e10" +
        ":delay=crawl_delay:horizonms=10000:defaultdelayms=5000:out=sc",
      "sort:in=sc:by=t_ms,host:out=ss",
      "csvwrite:in=ss:out=w", s"filewrite:in=w:out=$out"))
    val lines = readOut(out)
    assert(lines.head == "host,r_e10,delay_ms,slot,t_ms")
    val rows = lines.tail.map(_.split(","))
    // x.example gated out of the frontier entirely
    assert(!rows.exists(_(0) == "x.example"), lines.mkString("|"))
    // b: Crawl-delay 2 -> 2000 ms -> slots 0..5; a: default 5000 -> 0..2
    val byHost = rows.groupBy(_(0))
    assert(byHost.keySet == Set("a.example", "b.example"))
    assert(byHost("b.example").length == 6 &&
      byHost("b.example").forall(_(2) == "2000"))
    assert(byHost("a.example").length == 3 &&
      byHost("a.example").forall(_(2) == "5000"))
    // schedule order: t=0 first, both hosts eligible at t=0
    assert(rows.take(2).map(_(4)).toSeq == Seq("0", "0"))
    // symmetric 2-node graph: equal ranks
    assert(rows.map(_(1)).distinct.length == 1)
  }

  test("capture index chain: warcread -> cdxindex -> sortwrite publishes a pruned-lookup artifact") {
    // VERDICT r18 next #1: the index exists so the containers are
    // never scanned for lookups — publish the CDX through the
    // range-clustered sorted path (disjoint per-file urlkey slices),
    // then answer a point lookup from the ARTIFACT alone.
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.sql.functions.{col, min, max}
    val d = tmp("cdxchain")
    graft.formats.Warc.write(s"$d/c.warc.gz",
      (0 until 40).iterator.map(i =>
        ("response", f"https://h$i%02d.example/p", "2026-01-01T00:00:00Z",
          s"body $i".getBytes(UTF_8), Int.box(200): java.lang.Integer,
          "text/plain")))
    Pipeline.run(spark, Seq(
      // :locators → the published index carries each capture's
      // gzip-member (offset, length) — the range-request replay
      // contract, verified below by actually fetching the hit
      s"warcread:in=$d/*.warc.gz:locators:out=recs",
      "cdxindex:in=recs:out=cdx",
      s"sortwrite:in=cdx:by=urlkey,ts14:files=4:out=$d/idx"))
    // disjoint per-file urlkey ranges — the file-pruning precondition
    val spans = new java.io.File(s"$d/idx").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("urlkey")), max(col("urlkey"))).head
        (r.getString(0), r.getString(1))
      }.sortBy(_._1)
    assert(spans.length > 1, "expected a multi-file artifact")
    for (Array((_, hi), (lo2, _)) <- spans.sliding(2))
      assert(hi < lo2, s"overlapping file ranges: ${spans.toSeq}")
    // the lookup answers from the artifact — no container in the plan
    val hit = spark.read.parquet(s"$d/idx")
      .filter(col("urlkey") === "example,h07)/p").collect()
    assert(hit.length == 1 && hit(0).getAs[Long]("rec_no") == 8L,
      hit.mkString(","))
    // …and its locator replays exactly that record by range access:
    // index hit → one-member fetch → payload digest matches the index
    val rec = graft.formats.Warc.fetchMember(s"$d/c.warc.gz",
      hit(0).getAs[Long]("offset"), hit(0).getAs[Long]("length")).head
    assert(new String(rec.body, UTF_8) == "body 7")
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(rec.body).map("%02x".format(_)).mkString
    assert(md5hex == hit(0).getAs[String]("digest"))
  }

  test("warcwrite: distributed WET export round-trips through warcread") {
    // the write half of the container codec: one .warc.gz per
    // partition, conversion records carrying extracted text (the WET
    // derivative C4/CCNet consume) — re-read distributed, text
    // byte-identical, shard count as requested.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val d = tmp("wetexport")
    (1 to 25).map(i => (s"https://w.example/$i",
        "2026-06-01T00:00:00Z", s"extracted text $i"))
      .toDF("url", "ts", "text")
      .write.mode("overwrite").parquet(s"$d/in")
    Pipeline.run(spark, Seq(
      s"parquetread:in=$d/in:out=docs",
      s"warcwrite:in=docs:url=url:ts=ts:body=text:type=conversion" +
        s":files=4:out=$d/wet"))
    assert(new java.io.File(s"$d/wet").listFiles()
      .count(_.getName.endsWith(".warc.gz")) == 4)
    val got = graft.formats.Warc.read(spark, s"$d/wet/*.warc.gz")
      .filter(col("warc_type") === "conversion")
      .selectExpr("url", "cast(payload as string) AS t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == (1 to 25).map(i =>
      s"https://w.example/$i" -> s"extracted text $i").toMap)
  }

  test("regdomain: PSL annotation from a rules side stream") {
    import spark.implicits._
    val d = tmp("regdom")
    Seq("// snapshot", "com", "blogspot.com", "*.ck", "!www.ck")
      .toDF("rule").write.mode("overwrite").parquet(s"$d/rules")
    Seq("a.b.blogspot.com", "x.www.ck", "plain.zz")
      .toDF("host").write.mode("overwrite").parquet(s"$d/in")
    Pipeline.run(spark, Seq(
      s"parquetread:in=$d/rules:out=rules",
      s"parquetread:in=$d/in:out=hosts",
      "regdomain:in=hosts:host=host:rules=rules:out=ann",
      s"parquetwrite:in=ann:out=$d/out"))
    val got = spark.read.parquet(s"$d/out")
      .select("host", "public_suffix", "reg_domain").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("a.b.blogspot.com", "blogspot.com", "b.blogspot.com"),
      ("x.www.ck", "ck", "www.ck"),
      ("plain.zz", "zz", "plain.zz")))
  }

  test("rank-to-budget chain: harmonic -> apportion over a host graph") {
    // the scheduling composition: centrality ranks hosts, the
    // apportionment turns ranks into an exact-integer fetch budget.
    import spark.implicits._
    val d = tmp("rankbudget")
    Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("d", "b"))
      .toDF("src", "dst").write.mode("overwrite").parquet(s"$d/edges")
    Pipeline.run(spark, Seq(
      s"parquetread:in=$d/edges:out=e",
      "harmonic:in=e:hops=4:mode=exact:out=ranks",
      "apportion:in=ranks:key=id:weight=harmonic_e6:total=100:out=budget",
      s"parquetwrite:in=budget:out=$d/out"))
    val rows = spark.read.parquet(s"$d/out")
      .collect().map(r => (r.getString(0), r.getAs[Long]("weight"),
        r.getAs[Long]("budget")))
    assert(rows.map(_._3).sum == 100L, rows.mkString(","))
    // monotone: a strictly higher harmonic weight never gets a
    // strictly smaller budget (Hamilton never inverts order)
    for (x <- rows; y <- rows if x._2 > y._2)
      assert(x._3 >= y._3, s"$x vs $y")
  }

  test("recrawl chain: cdxindex -> changerate -> freshness-weighted crawlschedule") {
    // VERDICT r18 next #2: the fast-changing host outranks the static
    // one inside every time slot once changeRate's estimate
    // cross-multiplies into the schedule rank.
    import java.nio.charset.StandardCharsets.UTF_8
    val d = tmp("recrawl")
    graft.formats.Warc.write(s"$d/h.warc.gz",
      (1 to 3).iterator.flatMap(m => Iterator(
        ("response", "https://a.example/p", f"2026-0$m%d-01T00:00:00Z",
          s"changed $m".getBytes(UTF_8), Int.box(200): java.lang.Integer,
          "text/plain"),
        ("response", "https://b.example/p", f"2026-0$m%d-01T00:00:00Z",
          "static".getBytes(UTF_8), Int.box(200): java.lang.Integer,
          "text/plain"))))
    val out = s"$d/sched.csv"
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/*.warc.gz:out=recs",
      "cdxindex:in=recs:out=cdx",
      "changerate:in=cdx:out=cr",
      // urlkey 'example,a)/p' -> host; equal base rank 1000 weighted
      // by the freshness estimate: the exact integer cross-multiply
      "sql:in=cr:out=rk:query=SELECT substring_index(substring_index(" +
        "urlkey, ')', 1), ',', -1) || '.example' AS host, " +
        "1000 * (1000000 + rate_e6) AS pri FROM __in",
      "sql:in=rk:out=dl:query=SELECT host, 2.0 AS crawl_delay " +
        "FROM __in WHERE 1 = 0", // no declared delays: defaults apply
      "crawlschedule:in=rk:delays=dl:host=host:rank=pri" +
        ":delay=crawl_delay:horizonms=10000:defaultdelayms=5000:out=sc",
      "sort:in=sc:by=t_ms,-pri,host:out=ss",
      "csvwrite:in=ss:out=w", s"filewrite:in=w:out=$out"))
    val rows = readOut(out).tail.map(_.split(","))
    // a changed every capture (rate 1e6): pri 2e9; b never: pri 1e9
    val pri = rows.map(r => r(0) -> r(1).toLong).toMap
    assert(pri == Map("a.example" -> 2000000000L,
      "b.example" -> 1000000000L), pri.toString)
    // inside every shared slot, a.example is served first
    for (Seq(x, y) <- rows.grouped(2))
      assert(x(4) == y(4) && x(0) == "a.example" && y(0) == "b.example",
        rows.map(_.mkString("/")).mkString("|"))
  }

  test("frontier seen chain: outlinks -> seenfilter -> robotsfilter -> crawlschedule") {
    // VERDICT r18 next #7: a re-discovered URL (already in the
    // standing seen set) must not re-enter the schedule; a
    // robots-disallowed URL is gated right after. Only the genuinely
    // new, allowed host reaches the fetch slots.
    import java.nio.charset.StandardCharsets.UTF_8
    import spark.implicits._
    val d = tmp("seenchain")
    val page = "<html><body>" +
      "<p><a href=\"https://new.example/fresh\">n</a></p>" +
      "<p><a href=\"https://old.example/known\">o</a></p>" +
      "<p><a href=\"https://gated.example/priv/x\">g</a></p>" +
      "</body></html>"
    graft.formats.Warc.write(s"$d/c.warc.gz", Iterator(
      ("response", "https://seed.example/p", "2026-01-01T00:00:00Z",
        page.getBytes(UTF_8), Int.box(200): java.lang.Integer,
        "text/html")))
    Seq("https://old.example/known").toDF("url").write
      .mode("overwrite").parquet(s"$d/seen")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "robots.ndjson"),
      ("{\"host\":\"gated.example\",\"body\":\"User-agent: graftbot\\n" +
        "Disallow: /priv/*\\n\"}\n").getBytes("UTF-8"))
    val out = s"$d/sched.csv"
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/*.warc.gz:out=pages",
      "select:in=pages:out=ph:exprs=url;text as html",
      "outlinks:in=ph:html=html:out=lk",
      s"parquetread:in=$d/seen:out=seen",
      "seenfilter:in=lk:seen=seen:key=href:on=url:out=unseen",
      "sql:in=unseen:out=l2:query=SELECT href, " +
        "substring_index(substr(href, 9, 100000), '/', 1) AS dst, " +
        "substr(substr(href, 9, 100000), " +
        "length(substring_index(substr(href, 9, 100000), '/', 1)) + 1) " +
        "AS path FROM __in WHERE href LIKE 'https://%'",
      s"fileread:in=$d/robots.ndjson:out=r0", "ndjsonread:in=r0:out=rob",
      "robotsfilter:in=l2:robots=rob:agent=GraftBot:key=href:host=dst" +
        ":rhost=host:path=path:content=body:out=v",
      "filter:in=v:expr=allowed:out=g",
      "sql:in=g:out=rk:query=SELECT dst AS host, 1000 AS pri " +
        "FROM __in GROUP BY dst",
      "sql:in=rk:out=dl:query=SELECT host, 2.0 AS crawl_delay " +
        "FROM __in WHERE 1 = 0",
      "crawlschedule:in=rk:delays=dl:host=host:rank=pri" +
        ":delay=crawl_delay:horizonms=10000:defaultdelayms=5000:out=sc",
      "sort:in=sc:by=t_ms,host:out=ss",
      "csvwrite:in=ss:out=w", s"filewrite:in=w:out=$out"))
    val hosts = readOut(out).tail.map(_.split(",")(0)).toSet
    assert(hosts == Set("new.example"), hosts.toString)
  }

  test("archive chain: cdxindex -> cdxjwrite, then cdxjread -> revisitdetect on a fresh crawl") {
    // the container write path's dedup decision fed ENTIRELY from the
    // published text index: yesterday's crawl publishes CDXJ, today's
    // crawl reads it back and classifies each capture — unchanged
    // pages would ship as revisit records, not payloads.
    import java.nio.charset.StandardCharsets.UTF_8
    val d = tmp("archchain")
    def resp(u: String, ts: String, body: String) =
      ("response", u, ts, body.getBytes(UTF_8),
        Int.box(200): java.lang.Integer, "text/plain")
    graft.formats.Warc.write(s"$d/standing.warc.gz", Seq(
      resp("https://a.example/p", "2026-01-01T00:00:00Z", "stable"),
      resp("https://b.example/p", "2026-01-01T00:00:00Z", "v1")))
    graft.formats.Warc.write(s"$d/fresh.warc.gz", Seq(
      resp("https://a.example/p", "2026-02-01T00:00:00Z", "stable"),
      resp("https://b.example/p", "2026-02-01T00:00:00Z", "v2"),
      resp("https://c.example/p", "2026-02-01T00:00:00Z", "first")))
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/standing.warc.gz:out=sr",
      "cdxindex:in=sr:out=sc",
      s"cdxjwrite:in=sc:out=$d/idx"))
    // the published index really is sorted text lines
    val raw = new java.io.File(s"$d/idx").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath)
        .toArray(Array.empty[String]))
    assert(raw.length == 2 && raw.forall(_.matches("^\\S+ \\d{14} \\{.*")),
      raw.mkString("|"))
    val out = s"$d/verdicts.csv"
    Pipeline.run(spark, Seq(
      s"cdxjread:in=$d/idx:out=std",
      s"warcread:in=$d/fresh.warc.gz:out=fr",
      "cdxindex:in=fr:out=fc",
      "revisitdetect:in=fc:standing=std:out=v",
      // '|'-swap the urlkey's comma so the CSV assertion splits flat
      "select:in=v:out=vp:exprs=translate(urlkey, ',', '|') as k;verdict",
      "sort:in=vp:by=k:out=vs",
      "csvwrite:in=vs:out=w", s"filewrite:in=w:out=$out"))
    val rows = readOut(out).tail.map(_.split(","))
      .map(r => r(0) -> r(1)).toMap
    assert(rows == Map("example|a)/p" -> "unchanged",
      "example|b)/p" -> "changed", "example|c)/p" -> "new"), rows.toString)
  }

  test("compaction chain: two index segments union+dedup into one sorted artifact") {
    // the q280 LSM step end-to-end in the DSL: overlapping segments'
    // indexes union, the re-shipped captures collapse on the capture
    // identity, and the merged index REPUBLISHES through sortwrite —
    // disjoint per-file key ranges again, so lookups stay O(one file)
    // after every compaction generation.
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.sql.functions.{col, min, max}
    val d = tmp("compact")
    def seg(name: String, urls: Seq[(String, String, String)]): Unit =
      graft.formats.Warc.write(s"$d/$name.warc.gz", urls.map {
        case (u, ts, body) => ("response", u, ts, body.getBytes(UTF_8),
          Int.box(200): java.lang.Integer, "text/plain")
      })
    // month-2 capture of a.example ships in BOTH segments
    seg("seg1", Seq(
      ("https://a.example/p", "2026-01-01T00:00:00Z", "v1"),
      ("https://a.example/p", "2026-02-01T00:00:00Z", "v2"),
      ("https://b.example/p", "2026-01-01T00:00:00Z", "b1")))
    seg("seg2", Seq(
      ("https://a.example/p", "2026-02-01T00:00:00Z", "v2"),
      ("https://a.example/p", "2026-03-01T00:00:00Z", "v3"),
      ("https://c.example/p", "2026-03-01T00:00:00Z", "c1")))
    Pipeline.run(spark, Seq(
      s"warcread:in=$d/seg1.warc.gz:out=r1", "cdxindex:in=r1:out=c1",
      s"warcread:in=$d/seg2.warc.gz:out=r2", "cdxindex:in=r2:out=c2",
      "select:in=c1:out=p1:exprs=urlkey;ts14;url;mime;status;digest",
      "select:in=c2:out=p2:exprs=urlkey;ts14;url;mime;status;digest",
      "union:in=p1:with=p2:out=u",
      "dedup:in=u:key=urlkey,ts14,digest:out=m",
      s"sortwrite:in=m:by=urlkey,ts14:files=2:out=$d/merged"))
    val merged = spark.read.parquet(s"$d/merged")
    assert(merged.count() == 5, "3 + 3 segments - 1 overlap = 5 captures")
    assert(merged.filter(col("urlkey") === "example,a)/p").count() == 3)
    // the republished artifact keeps disjoint per-file key ranges
    val spans = new java.io.File(s"$d/merged").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("urlkey")), max(col("urlkey")),
            min(col("ts14")), max(col("ts14"))).head
        ((r.getString(0), r.getString(2)), (r.getString(1), r.getString(3)))
      }.sortBy(_._1)
    for (Array((_, hi), (lo2, _)) <- spans.sliding(2).filter(_.length == 2))
      assert(hi._1 <= lo2._1, s"file ranges overlap: ${spans.toSeq}")
  }

  test("sitemap freshness chain: sitemapentries seed-priority feeds crawlschedule") {
    // VERDICT r18 missing #3's composition: before any capture
    // history exists, the schedule seeds from DECLARED freshness —
    // priority 0.9 host outranks the 0.1 host in every shared slot.
    val d = tmp("smseed")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "sm.ndjson"),
      ("{\"host\":\"a.example\",\"xml\":\"<urlset><url><loc>" +
        "https://a.example/p</loc><priority>0.9</priority>" +
        "<changefreq>daily</changefreq></url></urlset>\"}\n" +
        "{\"host\":\"b.example\",\"xml\":\"<urlset><url><loc>" +
        "https://b.example/p</loc><priority>0.1</priority>" +
        "</url></urlset>\"}\n").getBytes("UTF-8"))
    val out = s"$d/sched.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/sm.ndjson:out=r0", "ndjsonread:in=r0:out=sm",
      "sitemapentries:in=sm:host=host:xml=xml:out=ent",
      // declared priority -> integer seed rank (floor at e6 scale)
      "sql:in=ent:out=rk:query=SELECT host, CAST(floor(" +
        "coalesce(max(priority), 0.5) * 1000000) AS BIGINT) AS pri " +
        "FROM __in GROUP BY host",
      "sql:in=rk:out=dl:query=SELECT host, 2.0 AS crawl_delay " +
        "FROM __in WHERE 1 = 0",
      "crawlschedule:in=rk:delays=dl:host=host:rank=pri" +
        ":delay=crawl_delay:horizonms=10000:defaultdelayms=5000:out=sc",
      "sort:in=sc:by=t_ms,-pri,host:out=ss",
      "csvwrite:in=ss:out=w", s"filewrite:in=w:out=$out"))
    val rows = readOut(out).tail.map(_.split(","))
    val pri = rows.map(r => r(0) -> r(1).toLong).toMap
    assert(pri == Map("a.example" -> 900000L, "b.example" -> 100000L),
      pri.toString)
    for (Seq(x, y) <- rows.grouped(2))
      assert(x(4) == y(4) && x(0) == "a.example" && y(0) == "b.example",
        rows.map(_.mkString("/")).mkString("|"))
  }

  test("hashsplit + assignids curation modules") {
    val d = tmp("splitids")
    writeCsv(d + "/in.csv", "id,v" +: (1 to 50).map(i => f"$i%03d,x$i"): _*)
    val out = d + "/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread",
      "hashsplit:key=id:weights=train=0.6,val=0.2,test=0.2:salt=v1",
      "assignids:order=id",
      "csvwrite", s"filewrite:out=$out"))
    val lines = readOut(out)
    assert(lines.head == "id,v,split,row_id")
    val rows = lines.tail.map(_.split(","))
    assert(rows.length == 50)
    // ids are contiguous 0..49 following the id order
    assert(rows.sortBy(_(0)).map(_(3).toLong).toSeq == (0L until 50L))
    // every row got a split; all three names can appear, none invalid
    val splits = rows.map(_(2)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("segdedup + domaincap curation modules") {
    val d = tmp("segdom")
    writeCsv(d + "/in.csv", "id,src,txt",
      "1,a,w x y z p q r s",   // segs [w x y z][p q r s]
      "2,a,w x y z",           // dup of doc 1's opener -> drops
      "3,b,m n o p")
    val out = d + "/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread",
      "segdedup:key=id:text=txt:tokens=4",
      "sort:by=id", "csvwrite", s"filewrite:out=$out"))
    val lines = readOut(out)
    assert(lines.head == "id,n_segs,n_kept,retained")
    assert(lines.tail == Seq(
      "1,2,2,w x y z p q r s", "2,1,0,\"\"", "3,1,1,m n o p"))
    val out2 = d + "/out2.csv"
    writeCsv(d + "/docs.csv", "id,dom,score" +:
      (1 to 30).map(i => s"$i,${if (i <= 20) "hub" else "tiny"},${i * 7 % 30}"): _*)
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/docs.csv", "csvread:infer=1",
      "domaincap:domain=dom:order=score.desc,id.asc:cap=3:parts=4",
      "sort:by=dom,rk", "csvwrite", s"filewrite:out=$out2"))
    val rows = readOut(out2).tail.map(_.split(","))
    assert(rows.length == 6, "3 per domain, 2 domains")
    assert(rows.count(_(1) == "hub") == 3)
    // exactness vs the plain rank: the hub winners are the 3 highest
    // (score, -id) among ids 1..20
    val expect = (1 to 20).map(i => (i * 7 % 30, -i)).sorted.reverse.take(3)
      .map { case (s, negId) => (-negId).toString }.toSet
    assert(rows.filter(_(1) == "hub").map(_(0)).toSet == expect)
  }

  test("parquetwrite files= compacts a shattered directory, rows intact") {
    import spark.implicits._
    val d = tmp("compact")
    (1 to 1000).toDF("v").repartition(16).write.parquet(s"$d/shattered")
    assert(new java.io.File(s"$d/shattered").listFiles()
      .count(_.getName.endsWith(".parquet")) == 16)
    val r = Pipeline.run(spark, Seq(
      s"parquetread:in=$d/shattered",
      s"parquetwrite:out=$d/compacted:files=2"))
    assert(r.rowsWritten.values.sum == 1000L, "row count reported")
    assert(new java.io.File(s"$d/compacted").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2, "exactly files=N outputs")
    assert(spark.read.parquet(s"$d/compacted").as[Int].collect().sorted
      .sameElements(1 to 1000))
  }

  test("parquetwrite targetbytes= auto-sizes compaction from plan stats") {
    import spark.implicits._
    val d = tmp("compactauto")
    (1 to 1000).toDF("v").repartition(16).write.parquet(s"$d/shattered")
    // huge target -> single file; tiny target -> multiple, rows intact
    Pipeline.run(spark, Seq(
      s"parquetread:in=$d/shattered",
      s"parquetwrite:out=$d/one:targetbytes=${1L << 40}"))
    assert(new java.io.File(s"$d/one").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    Pipeline.run(spark, Seq(
      s"parquetread:in=$d/shattered",
      s"parquetwrite:out=$d/many:targetbytes=2048"))
    val nMany = new java.io.File(s"$d/many").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nMany > 1, s"expected fan-out, got $nMany")
    assert(spark.read.parquet(s"$d/many").as[Int].collect().sorted
      .sameElements(1 to 1000))
    // both knobs together is a user error
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"parquetread:in=$d/shattered",
      s"parquetwrite:out=$d/x:files=2:targetbytes=100")))
  }

  test("parquetwrite partitionby= writes the hive layout Spark partition-prunes") {
    import spark.implicits._
    val d = tmp("hivepart")
    val df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0))
      .toDF("id", "grp", "v")
    val r = Pipeline.run(spark, Seq(
      s"parquetwrite:in=x:out=$d/out:partitionby=grp:files=1"),
      inputs = Map("x" -> df))
    assert(r.rowsWritten.values.sum == 3L)
    val dirs = new java.io.File(s"$d/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("grp=a", "grp=b"), s"hive layout missing: $dirs")
    // partition pruning: a grp filter must read only that directory
    val plan = spark.read.parquet(s"$d/out").filter($"grp" === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(grp"),
      s"grp not a partition filter:\n$plan")
    assert(spark.read.parquet(s"$d/out").filter($"grp" === "a")
      .select($"id").as[Int].collect().sorted.sameElements(Seq(1, 3)))
  }

  test("sortwrite: disjoint per-file key ranges, globally sorted read-back") {
    import spark.implicits._
    val d = tmp("sortw")
    val df = (1 to 2000).map(i => (i * 37 % 2000, i)).toDF("k", "id")
    val r = Pipeline.run(spark, Seq(
      s"sortwrite:in=x:by=k:files=4:out=$d/out"),
      inputs = Map("x" -> df))
    assert(r.rowsWritten.values.sum == 2000L)
    val files = new java.io.File(s"$d/out").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length == 4)
    // each file covers a DISJOINT slice of k — that is what lets
    // footer min/max prune a range predicate to ~1 file
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f).select("k").as[Int].collect()
      assert(ks.sorted.sameElements(ks), s"not sorted within $f")
      (ks.min, ks.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"file ranges overlap: $hi >= $lo")
      case _ =>
    }
  }

  test("filter/agg/sort extension modules") {
    val in = tmp("agg") + "/in.csv"
    writeCsv(in, "k,v", "a,1", "b,2", "a,3", "b,4", "a,5")
    val out = tmp("agg") + "/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$in", "csvread:infer=1",
      "filter:expr=v >= 2",
      "agg:by=k:exprs=sum(v) as sv;count(*) as n",
      "sort:by=k", "csvwrite", s"filewrite:out=$out"))
    assert(readOut(out) == Seq("k,sv,n", "a,8,2", "b,6,2"))
  }

  test("join module with broadcast") {
    val d = tmp("join")
    writeCsv(s"$d/l.csv", "k,v", "1,a", "2,b", "3,c")
    writeCsv(s"$d/r.csv", "k,w", "1,X", "3,Z")
    val out = s"$d/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/r.csv:out=rraw", "csvread:in=rraw:out=dim",
      s"fileread:in=$d/l.csv", "csvread",
      "join:with=dim:on=k:how=inner:broadcast",
      "sort:by=k", "csvwrite", s"filewrite:out=$out"))
    assert(readOut(out) == Seq("k,v,w", "1,a,X", "3,c,Z"))
  }

  test("@file shortcuts expand to fileread/filewrite") {
    val d = tmp("atfile")
    writeCsv(s"$d/in.csv", "a,b", "1,x")
    Pipeline.run(spark, Seq(
      s"csvread:in=@$d/in.csv", s"csvwrite:out=@$d/out.csv"))
    assert(readOut(s"$d/out.csv") == Seq("a,b", "1,x"))
  }

  test("gzip module arms filewrite codec; gunzip reads transparently") {
    val d = tmp("gz")
    writeCsv(s"$d/in.csv", "a", "1", "2")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "gzip", s"filewrite:out=$d/out"))
    val gzFiles = new java.io.File(s"$d/out").listFiles()
      .filter(_.getName.endsWith(".gz"))
    assert(gzFiles.nonEmpty, "expected gzip-compressed part files")
    // round back through gunzip
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/out", "gunzip", s"filewrite:out=$d/back"))
    assert(readOut(s"$d/back").sorted == Seq("1", "2", "a"))
  }

  test("gunzip decompresses gzip data WITHOUT a .gz extension") {
    val d = tmp("gzraw")
    // gzip bytes in a file with no suffix — the reference sniffs the
    // 1F 8B magic (dbitool.pl:1295-1299); the text reader would parse
    // mojibake.
    val f = new java.io.File(s"$d/data.bin")
    f.getParentFile.mkdirs()
    val os = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(f))
    os.write("hello\nworld\n".getBytes("UTF-8"))
    os.close()
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/data.bin", "gunzip", s"filewrite:out=$d/out"))
    assert(readOut(s"$d/out").sorted == Seq("hello", "world"))
  }

  test("gunzip passes plain text through (sniff finds no gzip magic)") {
    val d = tmp("gzplain")
    writeCsv(s"$d/in.txt", "plain1", "plain2")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.txt", "gunzip", s"filewrite:out=$d/out"))
    assert(readOut(s"$d/out").sorted == Seq("plain1", "plain2"))
  }

  test("gzip codec rides its stream, not pipeline-global state") {
    val d = tmp("gzbranch")
    writeCsv(s"$d/in.txt", "r1", "r2")
    // Branched pipeline: the gzip'd branch compresses, the sibling
    // branch reading the SAME source stream must stay plain.
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.txt:out=s",
      "gzip:in=s:out=g", s"filewrite:in=g:out=$d/zipped",
      s"filewrite:in=s:out=$d/plain"))
    assert(new java.io.File(s"$d/zipped").listFiles()
      .exists(_.getName.endsWith(".gz")), "gzip branch not compressed")
    assert(!new java.io.File(s"$d/plain").listFiles()
      .exists(_.getName.endsWith(".gz")), "plain branch was compressed")
    assert(readOut(s"$d/plain").sorted == Seq("r1", "r2"))
  }

  test("DB selects: one-of query|table|in enforced; in=STREAM assembles SQL") {
    // both query= and table= → one-of violation
    intercept[BuildError](Pipeline.build(spark,
      Seq("sqliteselect:fname=/tmp/x.db:query=SELECT 1:table=t:out=s",
        "dedup:in=s:out=d", "ndjsonwrite:in=d", "filewrite:out=/tmp/never")))
    // neither → one-of violation
    intercept[BuildError](Pipeline.build(spark,
      Seq("sqliteselect:fname=/tmp/x.db:out=s")))
    // in=STREAM: the query text is assembled from the upstream raw
    // stream; the failure must then be the missing JDBC driver (a
    // connector-level error), NOT a BuildError about the query source.
    val d = tmp("sqlstream")
    writeCsv(s"$d/q.sql", "SELECT 1")
    val e = intercept[Throwable](Pipeline.build(spark, Seq(
      s"fileread:in=$d/q.sql:out=q",
      "sqliteselect:fname=/tmp/x.db:in=q:out=s")))
    assert(!e.isInstanceOf[BuildError], s"unexpected BuildError: $e")
  }

  test("cassandraselect: registered, validates args, reports no connector") {
    assert(Pipeline.listModules.map(_._1).contains("cassandraselect"))
    val eKs = intercept[BuildError](Pipeline.build(spark,
      Seq("cassandraselect:host=h:query=SELECT 1:out=s")))
    assert(eKs.getMessage.contains("keyspace"))
    val eConn = intercept[BuildError](Pipeline.build(spark,
      Seq("cassandraselect:host=h:keyspace=k:query=SELECT 1:out=s")))
    assert(eConn.getMessage.contains("connector"))
  }

  test("ndb module dedups by key and persists") {
    val d = tmp("ndb")
    writeCsv(s"$d/in.csv", "k,v", "1,a", "2,b", "1,c")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread", s"ndb:key=k:fname=$d/kv:out=deduped",
      "csvwrite:in=deduped", s"filewrite:out=$d/out.csv"))
    assert(spark.read.parquet(s"$d/kv").count() == 2)
    assert(readOut(s"$d/out.csv").length == 3) // header + 2 rows
  }

  test("validation: unknown module, dangling stream, type mismatch, double writer") {
    intercept[BuildError](Pipeline.build(spark, Seq("nosuchmodule:x=1")))
    val d = tmp("val")
    writeCsv(s"$d/in.csv", "a", "1")
    // dangling: csvread output never consumed
    intercept[BuildError](Pipeline.run(spark,
      Seq(s"fileread:in=$d/in.csv", "csvread:out=dangling")))
    // type mismatch: filter (row) fed a raw stream
    intercept[BuildError](Pipeline.build(spark,
      Seq(s"fileread:in=$d/in.csv:out=r", "filter:in=r:expr=a>1")))
    // two writers to one stream
    intercept[BuildError](Pipeline.build(spark,
      Seq(s"fileread:in=$d/in.csv:out=s", s"fileread:in=$d/in.csv:out=s")))
  }

  test("log channel: in=log consumers run after data sinks") {
    val d = tmp("log")
    writeCsv(s"$d/in.csv", "a", "1", "2")
    val r = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", s"filewrite:out=$d/out.csv",
      "csvwrite:in=log:out=logcsv", s"filewrite:in=logcsv:out=$d/log.csv"))
    val logLines = readOut(s"$d/log.csv")
    assert(logLines.exists(_.contains("filewrite")), logLines.mkString("|"))
    assert(r.log.count() >= 2)
  }

  test("listModules covers the reference module surface") {
    val names = Pipeline.listModules.map(_._1).toSet
    val expected = Set("fileread", "filewrite", "stdin", "stdout", "stderr",
      "csvread", "csvwrite", "ndjsonread", "ndjsonwrite", "jsonread",
      "jsonwrite", "fixedwidthread", "fixedwidthwrite", "xmlwrite",
      "gzip", "gunzip", "column", "ndb",
      "filter", "select", "join", "agg", "sort", "limit", "union", "dedup",
      "asofjoin", "rangejoin", "dedupnear", "dedupcluster", "survivor",
      "shuffleshard", "pagerank", "mediadedup",
      "jaccardjoin", "trianglecount", "hierflatten", "stratsplit", "incragg",
      "parquetread", "parquetwrite", "orcread", "orcwrite",
      "jdbcselect", "jdbcinsert",
      "mysqlselect", "sqliteselect", "sqliteinsert", "cassandraselect",
      "log", "error",
      "bsonread", "bsonwrite", "spreadsheetread", "spreadsheetwrite",
      "xmlread", "zipread", "zipwrite", "dbdumpread", "exec",
      "tcpread", "tcpwrite", "chartwrite", "decontaminate", "mixsample",
      "chunk", "avroread", "avrowrite", "sql", "zorderwrite",
      "eventread", "eventwindow", "streamdedup", "streamwrite", "scd2",
      "kmvsketch", "linkage", "nfcnormalize",
      "linfit", "sssp", "knnclassify", "wquantile", "hashscore",
      "psi", "ks", "welch", "gini", "auc", "attribution",
      "cosinetopk", "anntopk", "ivftopk", "pqtopk", "semdedup",
      "hardneg", "assocrules", "seqpack", "rrf", "boilerplate", "pii",
      "entropy", "safesplit", "randomwalk", "globread", "manifest",
      "incdedup", "qualitygate", "diversity", "zipf", "bpe", "logit",
      "dupspans", "urlnorm", "labelprop", "spanowners", "manifestdiff",
      "bm25", "bootstrap", "lmscore", "lmlangid",
      "dsir", "mlscore", "pplbuckets", "pca",
      "warcread", "robotsfilter", "sitemaps", "novelty", "jsd", "chao1",
      "htmlextract", "kripp",
      "outlinks", "crawldelays", "crawlschedule", "cdxindex", "captures",
      "changerate", "seenfilter", "sitemapentries",
      "cdxjwrite", "cdxjread", "revisitdetect", "embdecontam", "binpack",
      "anchortexts", "warcwrite", "regdomain", "harmonic", "apportion",
      "cdxlookup")
    assert(expected.subsetOf(names), (expected -- names).toString)
  }

  test("selection modules (dsir/mlscore/pca) end-to-end") {
    val d = tmp("selection")
    import spark.implicits._
    // dsir: raw doc 10 mimics the target vocabulary, 11 is alien —
    // with k=1 the Gumbel-perturbed top pick must still respect a
    // large weight gap
    writeCsv(s"$d/tgt.csv", "doc_id,text",
      "1,x y x y x y x y", "2,y x y x y x")
    writeCsv(s"$d/raw.csv", "doc_id,text",
      "10,x y x y x", "11,p q r s t u")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/tgt.csv", "csvread:infer=1:out=tgt",
      s"fileread:in=$d/raw.csv", "csvread:infer=1:out=raw",
      "dsir:in=raw:target=tgt:key=doc_id:text=text:k=1:buckets=64:out=sel",
      "select:in=sel:exprs=doc_id;rk:out=s2",
      "csvwrite:in=s2", s"filewrite:out=$d/sel.csv"))
    assert(readOut(s"$d/sel.csv") == Seq("doc_id,rk", "10,1"))

    // mlscore: identical numbers to the operator
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/tgt.csv", "csvread:infer=1:out=tgt",
      s"fileread:in=$d/raw.csv", "csvread:infer=1:out=raw",
      "mlscore:in=raw:target=tgt:pool=raw:key=doc_id:text=text:out=ml",
      "select:in=ml:exprs=doc_id;mls:out=s3",
      "csvwrite:in=s3", s"filewrite:out=$d/ml.csv"))
    val mlOut = readOut(s"$d/ml.csv")
    val mlOp = graft.operators.Curation.mooreLewisScore(
        Seq((1L, "x y x y x y x y"), (2L, "y x y x y x")).toDF("doc_id", "text"),
        Seq((10L, "x y x y x"), (11L, "p q r s t u")).toDF("doc_id", "text"),
        Seq((10L, "x y x y x"), (11L, "p q r s t u")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").select($"doc_id", $"mls")
      .collect().map(r => s"${r.getLong(0)},${r.getDouble(1)}")
    assert(mlOut.tail.sorted == mlOp.toSeq.sorted, s"$mlOut vs ${mlOp.toSeq}")

    // pca mode=top emits one loading row per dimension
    val emb = Tables(spark, TestSpark.sf, "embeddings").limit(40)
    emb.write.mode("overwrite").parquet(s"$d/emb.parquet")
    Pipeline.run(spark, Seq(
      s"parquetread:in=$d/emb.parquet:out=e",
      "pca:in=e:vec=embedding:mode=top:out=pc",
      "select:in=pc:exprs=dim;loading:out=s4",
      "csvwrite:in=s4", s"filewrite:out=$d/pc.csv"))
    assert(readOut(s"$d/pc.csv").length == 65) // header + 64 dims
  }

  test("drift family modules (psi/ks/welch/gini/auc/attribution) end-to-end") {
    val d = tmp("drift")
    import spark.implicits._
    // psi: identical distributions -> psi ~ 0, not shifted
    writeCsv(s"$d/psi.csv", "g,v,per",
      "a,5,0", "a,15,0", "a,5,1", "a,15,1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/psi.csv", "csvread:infer=1:out=ev",
      "psi:in=ev:group=g:bucket=floor(v / 10):period=per:out=p",
      "select:in=p:exprs=g;n_before;n_after;psi;shifted:out=sel",
      "csvwrite:in=sel", s"filewrite:out=$d/p.csv"))
    assert(readOut(s"$d/p.csv") ==
      Seq("g,n_before,n_after,psi,shifted", "a,2,2,0.0,false"))

    // ks: disjoint supports -> ks = 1
    writeCsv(s"$d/ks.csv", "g,v,per", "a,1,0", "a,2,0", "a,9,1", "a,10,1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/ks.csv", "csvread:infer=1:out=ev",
      "ks:in=ev:group=g:value=v:period=per:out=k",
      "select:in=k:exprs=g;ks:out=sel",
      "csvwrite:in=sel", s"filewrite:out=$d/k.csv"))
    assert(readOut(s"$d/k.csv") == Seq("g,ks", "a,1.0"))

    // welch: matches the operator bit-for-bit
    writeCsv(s"$d/w.csv", "g,v",
      "a,10", "a,12", "a,11", "b,50", "b,52", "b,51", "c,30", "c,31")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/w.csv", "csvread:infer=1:out=ev",
      "welch:in=ev:group=g:value=v:out=t",
      "sort:in=t:by=g:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/t.csv"))
    val wantW = graft.operators.Drift.welch(
        Seq(("a", 10), ("a", 12), ("a", 11), ("b", 50), ("b", 52),
          ("b", 51), ("c", 30), ("c", 31)).toDF("g", "v"), "g", $"v")
      .orderBy($"g").collect()
      .map(r => s"${r.getString(0)},${r.getLong(1)},${r.getDouble(2)},${r.getBoolean(3)}")
    assert(readOut(s"$d/t.csv").tail == wantW.toSeq)

    // gini: perfectly equal values -> gini 0
    writeCsv(s"$d/g.csv", "id,spend", "1,100", "2,100", "3,100", "4,100")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/g.csv", "csvread:infer=1:out=ev",
      "gini:in=ev:key=id:value=spend:out=gi",
      "csvwrite:in=gi", s"filewrite:out=$d/g_out.csv"))
    assert(readOut(s"$d/g_out.csv") == Seq("n,total,gini", "4,400,0.0"))

    // auc: perfectly separating score -> auc 1
    writeCsv(s"$d/a.csv", "s,y", "1,false", "2,false", "9,true", "10,true")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/a.csv", "csvread:infer=1:out=ev",
      "auc:in=ev:score=s:pos=y:out=au",
      "select:in=au:exprs=p;n;auc:out=sel",
      "csvwrite:in=sel", s"filewrite:out=$d/a_out.csv"))
    assert(readOut(s"$d/a_out.csv") == Seq("p,n,auc", "2,2,1.0"))

    // attribution: 2 touches within the hour, 1 outside
    writeCsv(s"$d/touch.csv", "user_id,ts,tid",
      "7,2024-01-01 10:00:00,t1", "7,2024-01-01 10:30:00,t2",
      "7,2024-01-01 08:00:00,t3")
    writeCsv(s"$d/conv.csv", "user_id,ts,cid", "7,2024-01-01 10:45:00,c1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/touch.csv", "csvread:infer=1:out=touch",
      s"fileread:in=$d/conv.csv", "csvread:infer=1:out=conv",
      "attribution:in=touch:conv=conv:key=user_id:id=cid:out=at",
      "select:in=at:exprs=cid;user_id;n_touches:out=sel",
      "csvwrite:in=sel", s"filewrite:out=$d/at.csv"))
    assert(readOut(s"$d/at.csv") ==
      Seq("cid,user_id,n_touches", "c1,7,2"))
  }

  test("similarity + curation DSL modules end-to-end") {
    val d = tmp("simdsl")
    import spark.implicits._
    val emb = s"$sf/embeddings.parquet"

    // cosinetopk: module == operator, bit for bit
    Pipeline.run(spark, Seq(
      s"parquetread:in=$emb:out=corpus",
      "filter:in=corpus:expr=vec_id < 3:out=q",
      "cosinetopk:in=corpus:queries=q:key=vec_id:emb=embedding:k=3:out=nn",
      "select:in=nn:exprs=query_id;vec_id;rk:out=sel",
      "sort:in=sel:by=query_id,rk:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/nn.csv"))
    val corpus = spark.read.parquet(emb)
    val want = graft.operators.Similarity.bruteForceTopK(
        corpus, corpus.filter($"vec_id" < 3), "vec_id", "embedding", 3)
      .select($"query_id", $"vec_id", $"rk")
      .orderBy($"query_id", $"rk").collect()
      .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getInt(2)}")
    assert(readOut(s"$d/nn.csv").tail == want.toSeq)

    // anntopk / ivftopk / pqtopk / semdedup / hardneg: wiring checks
    // (operators have their own exactness/recall specs)
    val r1 = Pipeline.run(spark, Seq(
      s"parquetread:in=$emb:out=corpus",
      "filter:in=corpus:expr=vec_id < 3:out=q",
      "anntopk:in=corpus:queries=q:key=vec_id:emb=embedding:k=3:out=a",
      s"parquetwrite:in=a:out=$d/ann"))
    assert(r1.rowsWritten.values.sum > 0)
    val r2 = Pipeline.run(spark, Seq(
      s"parquetread:in=$emb:out=corpus",
      "filter:in=corpus:expr=vec_id < 3:out=q",
      "ivftopk:in=corpus:queries=q:key=vec_id:emb=embedding:k=3:nlist=4:nprobe=4:out=v",
      s"parquetwrite:in=v:out=$d/ivf"))
    assert(r2.rowsWritten.values.sum > 0)
    val r3 = Pipeline.run(spark, Seq(
      s"parquetread:in=$emb:out=corpus",
      "filter:in=corpus:expr=vec_id < 3:out=q",
      "pqtopk:in=corpus:queries=q:key=vec_id:emb=embedding:k=3:m=4:kcodes=8:out=p",
      s"parquetwrite:in=p:out=$d/pq"))
    assert(r3.rowsWritten.values.sum > 0)
    val r4 = Pipeline.run(spark, Seq(
      s"parquetread:in=$emb:out=corpus",
      "semdedup:in=corpus:key=vec_id:emb=embedding:k=4:tau=0.99:out=sd",
      s"parquetwrite:in=sd:out=$d/sd"))
    assert(r4.rowsWritten.values.sum > 0)

    // assocrules: module == operator on a tiny basket fixture
    writeCsv(s"$d/b.csv", "ck,it",
      "1,A", "1,B", "2,A", "2,B", "3,A", "3,C", "4,B")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/b.csv", "csvread:infer=1:out=b",
      "assocrules:in=b:basket=ck:item=it:minsupport=2:out=r",
      "select:in=r:exprs=ant;cons;n_both:out=sel2",
      "sort:in=sel2:by=ant:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/rules.csv"))
    assert(readOut(s"$d/rules.csv") ==
      Seq("ant,cons,n_both", "A,B,2", "B,A,2"))

    // seqpack: cumulative bins per domain
    writeCsv(s"$d/sp.csv", "dom,ord,tok",
      "x,1,60", "x,2,60", "x,3,60", "y,1,10")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/sp.csv", "csvread:infer=1:out=sp",
      "seqpack:in=sp:domain=dom:order=ord:tokens=tok:bintokens=100:out=pk",
      "select:in=pk:exprs=dom;ord;bin:out=sel3",
      "sort:in=sel3:by=dom,ord:out=sorted3",
      "csvwrite:in=sorted3", s"filewrite:out=$d/pk.csv"))
    assert(readOut(s"$d/pk.csv") == Seq("dom,ord,bin",
      "x,1,0", "x,2,0", "x,3,1", "y,1,0"))

    // rrf: two pools fuse; shared id scores 1/61+1/62
    writeCsv(s"$d/p1.csv", "id,rk", "10,1", "11,2")
    writeCsv(s"$d/p2.csv", "id,rk", "10,2", "12,1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/p1.csv", "csvread:infer=1:out=p1",
      s"fileread:in=$d/p2.csv", "csvread:infer=1:out=p2",
      "rrf:in=p1:pools=p2:key=id:out=f",
      "sort:in=f:by=id:out=sorted4",
      "csvwrite:in=sorted4", s"filewrite:out=$d/f.csv"))
    val fused = readOut(s"$d/f.csv")
    assert(fused.head == "id,rrf" && fused.length == 4)
    assert(fused(1).startsWith("10,") &&
      math.abs(fused(1).split(",")(1).toDouble -
        (1.0 / 61 + 1.0 / 62)) < 1e-12)

    // boilerplate: identical docs share all shingles -> share 1.0
    writeCsv(s"$d/bp.ndjson",
      """{"id": 1, "t": "alpha beta gamma delta epsilon zeta"}""",
      """{"id": 2, "t": "alpha beta gamma delta epsilon zeta"}""",
      """{"id": 3, "t": "one two three four five six seven"}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/bp.ndjson", "ndjsonread:out=docs",
      "boilerplate:in=docs:key=id:text=t:k=3:mindf=2:maxshare=0.5:out=bs",
      "select:in=bs:exprs=id;boiler_share;keep:out=sel5",
      "sort:in=sel5:by=id:out=sorted5",
      "csvwrite:in=sorted5", s"filewrite:out=$d/bs.csv"))
    assert(readOut(s"$d/bs.csv") == Seq("id,boiler_share,keep",
      "1,1.0,false", "2,1.0,false", "3,0.0,true"))

    // pii: email + phone redacted, counters set
    writeCsv(s"$d/pii.ndjson",
      """{"id": 1, "t": "mail a@b.com or call 555-123-4567 now"}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/pii.ndjson", "ndjsonread:out=docs",
      "pii:in=docs:text=t:out=red",
      "select:in=red:exprs=id;t:out=sel6",
      "csvwrite:in=sel6", s"filewrite:out=$d/red.csv"))
    val red = readOut(s"$d/red.csv")(1)
    assert(!red.contains("a@b.com") && !red.contains("555-123-4567"), red)
  }

  test("hybrid retrieval DSL chain: bm25 + cosinetopk + keyed rrf == operators") {
    // VERDICT r14 #6: the q238 recipe as a module chain — lexical
    // pool (bm25) + dense pool (cosinetopk over the aligned
    // embeddings) fused per query by the keyed rrf — bit-equal to the
    // direct operator composition.
    val d = tmp("hybrid")
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_join, filter, round, slice, split}
    val docsPath = s"$sf/documents.parquet"
    val embPath = s"$sf/embeddings.parquet"
    val docs = spark.read.parquet(docsPath).select($"doc_id", $"text")
    val qs = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        array_join(slice(filter(split($"text", " "), t => t =!= ""),
          1, 5), " ").as("qtext"))
    qs.write.mode("overwrite").parquet(s"$d/qs")
    Pipeline.run(spark, Seq(
      s"parquetread:in=$docsPath:out=docs",
      s"parquetread:in=$d/qs:out=qs",
      "bm25:in=docs:queries=qs:key=doc_id:text=text:qkey=query_id:qtext=qtext:k=5:maxdf=1.0:out=lex0",
      "select:in=lex0:exprs=query_id;doc_id;rk:out=lex",
      s"parquetread:in=$embPath:out=corpus",
      "filter:in=corpus:expr=vec_id % 10 = 0:out=qv",
      "cosinetopk:in=corpus:queries=qv:key=vec_id:emb=embedding:k=5:out=nn",
      "select:in=nn:exprs=query_id;vec_id as doc_id;rk:out=dense",
      "rrf:in=lex:pools=dense:key=query_id,doc_id:out=fused",
      "select:in=fused:exprs=query_id;doc_id;round(rrf, 6) as rrf:out=sel",
      "sort:in=sel:by=query_id,doc_id:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/hybrid.csv"))
    val emb = spark.read.parquet(embPath)
    val lex = graft.operators.Curation.bm25TopK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 5, maxDfFrac = 1.0)
      .select($"query_id", $"doc_id", $"rk")
    val dense = graft.operators.Similarity.bruteForceTopK(emb,
        emb.filter($"vec_id" % 10 === 0), "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id".as("doc_id"), $"rk")
    val want = graft.operators.Curation.rrfFuseKeyed(Seq(lex, dense),
        Seq("query_id", "doc_id"))
      .select($"query_id", $"doc_id", round($"rrf", 6).as("rrf"))
      .orderBy($"query_id", $"doc_id").collect()
      .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getDouble(2)}")
    val got = readOut(s"$d/hybrid.csv")
    assert(got.head == "query_id,doc_id,rrf")
    assert(got.tail == want.toSeq)
    assert(want.nonEmpty)
  }

  test("wquantile + hashscore modules end-to-end") {
    val d = tmp("wqhash")
    // weighted median of (v=10 w=1, v=20 w=3) -> 20; p250 -> 10
    writeCsv(s"$d/wv.csv", "g,v,w", "a,10,1", "a,20,3")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/wv.csv", "csvread:infer=1:out=wv",
      "wquantile:in=wv:group=g:value=v:weight=w:permilles=250,500:out=q",
      "sort:in=q:by=permille:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/q.csv"))
    assert(readOut(s"$d/q.csv") ==
      Seq("g,permille,value,total_weight", "a,250,10,4", "a,500,20,4"))

    // hashscore matches the operator's score exactly
    writeCsv(s"$d/docs.ndjson",
      """{"id": 1, "body": "alpha beta gamma"}""",
      """{"id": 2, "body": "delta epsilon"}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/docs.ndjson", "ndjsonread:out=docs",
      "hashscore:in=docs:key=id:text=body:weights=1,-2,3,5:bias=7:out=sc",
      "select:in=sc:exprs=id;score;n_feats:out=sel",
      "sort:in=sel:by=id:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/sc.csv"))
    import spark.implicits._
    val want = graft.operators.Ops.hashedFeatureScore(
        Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
          .toDF("id", "body"), "id", "body", Seq(1, -2, 3, 5), 7L)
      .select($"id", $"score", $"n_feats")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
      .map { case (i, s, n) => s"$i,$s,$n" }.toSeq
    assert(readOut(s"$d/sc.csv") == ("id,score,n_feats" +: want))
  }

  test("linfit + sssp + knnclassify modules end-to-end") {
    val d = tmp("fitpath")
    // linfit: exact line y = 2x + 1 -> slope 2, intercept 1, r2 1
    writeCsv(s"$d/xy.csv",
      ("g,x,y" +: (0 to 3).map(x => s"a,$x,${2 * x + 1}")): _*)
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/xy.csv", "csvread:infer=1:out=xy",
      "linfit:in=xy:group=g:x=x:y=y:out=fit",
      "csvwrite:in=fit", s"filewrite:out=$d/fit.csv"))
    assert(readOut(s"$d/fit.csv") ==
      Seq("g,n,slope,intercept,r2", "a,4,2.0,1.0,1.0"))

    // sssp: direct 1->2 costs 10, detour 1->3->2 costs 2
    writeCsv(s"$d/edges.csv", "src,dst,w", "1,2,10", "1,3,1", "3,2,1")
    writeCsv(s"$d/seeds.csv", "id", "1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/seeds.csv", "csvread:infer=1:out=seeds",
      s"fileread:in=$d/edges.csv", "csvread:infer=1:out=e",
      "sssp:in=e:seeds=seeds:maxhops=4:out=dist",
      "sort:in=dist:by=id:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/dist.csv"))
    assert(readOut(s"$d/dist.csv") ==
      Seq("id,dist", "1,0", "2,2", "3,1"))

    // knnclassify: axis-aligned corpus, query on the x axis -> label 0
    writeCsv(s"$d/corpus.ndjson",
      """{"id": 1, "emb": [1.0, 0.0], "lab": 0}""",
      """{"id": 2, "emb": [0.9, 0.1], "lab": 0}""",
      """{"id": 3, "emb": [0.0, 1.0], "lab": 1}""")
    writeCsv(s"$d/q.ndjson", """{"id": 10, "emb": [0.95, 0.05], "lab": 9}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/q.ndjson", "ndjsonread:out=q",
      s"fileread:in=$d/corpus.ndjson", "ndjsonread:out=corpus",
      "knnclassify:in=corpus:queries=q:key=id:emb=emb:label=lab:k=3:out=pred",
      "csvwrite:in=pred", s"filewrite:out=$d/pred.csv"))
    assert(readOut(s"$d/pred.csv") ==
      Seq("query_id,predicted", "10,0"))

    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/edges.csv", "csvread:infer=1:out=e2",
      "sssp:in=e2:seeds=nosuch", "csvwrite", s"filewrite:out=$d/x.csv")))
  }

  test("qualitygate + diversity + zipf text-analytics modules") {
    val d = tmp("tqual")
    val good = ("the cat sat on the mat and then the dog ran to the park " +
      "with a ball and it was a good day for everyone in the town").trim
    writeCsv(s"$d/in.csv", "id,body", s"1,$good", "2,tiny doc")
    // qualitygate: keep flag appended; drop filters
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=docs",
      "qualitygate:in=docs:text=body:minwords=10:out=g",
      "select:in=g:exprs=id;keep:out=gs", "sort:in=gs:by=id:out=go",
      "csvwrite:in=go", s"filewrite:out=$d/g.csv"))
    assert(readOut(s"$d/g.csv") == Seq("id,keep", "1,true", "2,false"))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=docs2",
      "qualitygate:in=docs2:text=body:minwords=10:drop:out=g2",
      "select:in=g2:exprs=id:out=g2s",
      "csvwrite:in=g2s", s"filewrite:out=$d/g2.csv"))
    assert(readOut(s"$d/g2.csv") == Seq("id", "1"))

    // diversity: 'a b a b' has 3 bigrams, 2 distinct
    writeCsv(s"$d/div.csv", "src,body", "s1,a b a b")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/div.csv", "csvread:out=dv",
      "diversity:in=dv:group=src:text=body:n=2:out=dd",
      "csvwrite:in=dd", s"filewrite:out=$d/dd.csv"))
    assert(readOut(s"$d/dd.csv") ==
      Seq("src,total_ngrams,distinct_ngrams,diversity", "s1,3,2,0.666667"))

    // zipf: three frequency tiers -> negative slope, n = vocab size
    writeCsv(s"$d/z.csv", "src,body",
      "s1," + (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++
        Seq.fill(2)("cc") ++ Seq("dd")).mkString(" "))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/z.csv", "csvread:out=zz",
      "zipf:in=zz:group=src:text=body:top=10:out=zo",
      "csvwrite:in=zo", s"filewrite:out=$d/zo.csv"))
    val zo = readOut(s"$d/zo.csv")
    assert(zo.head == "src,n,slope")
    val parts = zo(1).split(",")
    assert(parts(1) == "4" && parts(2).toDouble < -0.9, zo.toString)
  }

  test("repetition module: boilerplate dropped, clean text kept") {
    val d = tmp("trep")
    val boiler = Seq.fill(30)("buy now").mkString(" ")
    val clean = (1 to 20).map(i => s"word$i").mkString(" ")
    writeCsv(s"$d/in.csv", "id,body", s"1,$clean", s"2,$boiler")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=docs",
      "repetition:in=docs:text=body:out=r",
      "select:in=r:exprs=id;keep:out=rs", "sort:in=rs:by=id:out=ro",
      "csvwrite:in=ro", s"filewrite:out=$d/r.csv"))
    assert(readOut(s"$d/r.csv") == Seq("id,keep", "1,true", "2,false"))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=docs2",
      "repetition:in=docs2:text=body:drop:out=r2",
      "select:in=r2:exprs=id:out=r2s",
      "csvwrite:in=r2s", s"filewrite:out=$d/r2.csv"))
    assert(readOut(s"$d/r2.csv") == Seq("id", "1"))
  }

  test("lmscore module: smoothing=kn routes to Kneser-Ney, matches the operator") {
    import spark.implicits._
    val d = tmp("tkn")
    writeCsv(s"$d/tr.csv", "doc_id,body", "1,a b a b a c")
    writeCsv(s"$d/sc.csv", "doc_id,body", "10,a b")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/tr.csv", "csvread:infer=1:out=tr",
      s"fileread:in=$d/sc.csv", "csvread:infer=1:out=sc",
      "lmscore:in=sc:train=tr:key=doc_id:text=body:smoothing=kn:out=kn",
      "csvwrite:in=kn", s"filewrite:out=$d/kn.csv"))
    val got = readOut(s"$d/kn.csv")
    val want = graft.operators.Curation.kneserNeyCrossEntropy(
        Seq((1L, "a b a b a c")).toDF("doc_id", "body"),
        Seq((10L, "a b")).toDF("doc_id", "body"), "doc_id", "body")
      .as[(Long, Long, Double)].collect().head
    assert(got == Seq("doc_id,n_bigrams,xent", s"10,1,${want._3}"), got.toString)
  }

  test("logit module: IRLS training end-to-end, matches the operator") {
    val d = tmp("logit")
    writeCsv(s"$d/t.csv", "x,y",
      "1.0,1", "2.0,1", "0.4,1", "-1.0,0", "-2.0,0", "-0.4,0",
      "0.2,0", "-0.2,1") // two flipped points keep the MLE finite
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/t.csv", "csvread:infer=1:out=tr",
      "logit:in=tr:label=y:features=x:iters=4:out=m",
      "csvwrite:in=m", s"filewrite:out=$d/m.csv"))
    val out = readOut(s"$d/m.csv")
    assert(out.head == "idx,beta" && out.size == 3, out.toString)
    val b1 = out(2).split(",")(1).toDouble
    assert(b1 > 0, out.toString)
    // bit-identical to the operator called directly
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val want = graft.operators.Ops.logisticTrainIRLS(
      Seq((1.0, 1.0), (2.0, 1.0), (0.4, 1.0), (-1.0, 0.0), (-2.0, 0.0),
        (-0.4, 0.0), (0.2, 0.0), (-0.2, 1.0)).toDF("x", "y"),
      Seq(lit(1.0), col("x")), col("y"), iters = 4)
      .orderBy("idx").collect().map(_.getDouble(1)).toSeq
    assert(out.drop(1).map(_.split(",")(1).toDouble) == want, s"$out vs $want")
  }

  test("urlnorm module: canonicalized column appended") {
    val d = tmp("urln")
    writeCsv(s"$d/u.csv", "id,u",
      "1,HTTP://A.COM:80/X?utm_source=s&b=1#f", "2,plain")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/u.csv", "csvread:infer=1:out=uu",
      "urlnorm:in=uu:url=u:out=n",
      "select:in=n:exprs=id;url_norm:out=sel", "sort:in=sel:by=id:out=so",
      "csvwrite:in=so", s"filewrite:out=$d/n.csv"))
    assert(readOut(s"$d/n.csv") ==
      Seq("id,url_norm", "1,http://a.com/X?b=1", "2,plain"))
  }

  test("incdedup module: delta verdicts against a standing corpus") {
    val d = tmp("incd")
    val big = (1 to 60).map(i => s"w${i % 37}x$i").mkString(" ")
    writeCsv(s"$d/corpus.csv", "id,body",
      s"1,$big", "2," + (1 to 40).map(i => s"z$i").mkString(" "))
    writeCsv(s"$d/delta.csv", "id,body",
      "101," + big.split(" ").take(20).mkString(" "),
      "102," + (1 to 30).map(i => s"y$i").mkString(" "))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/delta.csv", "csvread:infer=1:out=delta",
      s"fileread:in=$d/corpus.csv", "csvread:infer=1:out=corpus",
      "incdedup:in=corpus:delta=delta:key=id:text=body:method=containment:threshold=0.8",
      "select:exprs=id;status;dup_of:out=v",
      "sort:in=v:by=id:out=vo",
      "csvwrite:in=vo", s"filewrite:out=$d/v.csv"))
    assert(readOut(s"$d/v.csv") ==
      Seq("id,status,dup_of", "101,dup_corpus,1", "102,new,"))

    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/corpus.csv", "csvread:infer=1:out=c2",
      "incdedup:in=c2:delta=nosuch:key=id:text=body",
      "csvwrite", s"filewrite:out=$d/x.csv")))
  }

  test("manifest module: per-shard counts and exact fingerprint") {
    val d = tmp("man")
    writeCsv(s"$d/in.csv", "id,body", "1,a b c", "2,d e", "3,f")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=docs",
      "manifest:in=docs:key=id:text=body:shards=2:salt=m1:out=mf",
      "sort:in=mf:by=shard:out=mo",
      "csvwrite:in=mo", s"filewrite:out=$d/mf.csv"))
    val lines = readOut(s"$d/mf.csv")
    assert(lines.head == "shard,n_rows,ws_tokens,fingerprint,min_id,max_id")
    val rows = lines.tail.map(_.split(","))
    assert(rows.map(_(1).toLong).sum == 3L, lines.toString) // all docs counted
    assert(rows.map(_(2).toLong).sum == 6L)                 // 3+2+1 tokens
    // fingerprint: re-running over the same data reproduces it exactly
    import spark.implicits._
    val again = graft.operators.Ops.shardManifest(
        Seq((1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("id", "body"),
        "id", "body", nShards = 2, seed = "m1")
      .orderBy($"shard").collect()
      .map(r => (r.getInt(0), r.getDecimal(3).toString)).toSeq
    assert(again == rows.map(r => (r(0).toInt, r(3))).toSeq)
  }

  test("globread: one raw stream per matched file + manifest") {
    val d = tmp("glob")
    writeCsv(s"$d/a.csv", "id,v", "1,x")
    writeCsv(s"$d/b.csv", "id,v", "2,y", "3,z")
    writeCsv(s"$d/ignore.txt", "nope")
    // address one generated stream (part1 = b.csv, lexicographic) and
    // consume the manifest; part0 stays unread — read-optional
    Pipeline.run(spark, Seq(
      s"globread:in=$d/*.csv:prefix=part:out=mf",
      "csvread:in=part1:infer=1:out=rows",
      "select:in=rows:exprs=id:out=ids",
      "csvwrite:in=ids", s"filewrite:out=$d/ids.csv",
      "csvwrite:in=mf", s"filewrite:out=$d/mf.csv"))
    assert(readOut(s"$d/ids.csv") == Seq("id", "2", "3"))
    val mf = readOut(s"$d/mf.csv")
    assert(mf.head == "stream,path")
    assert(mf.tail.map(_.split(",")(0)) == Seq("part0", "part1"))
    assert(mf.tail(0).endsWith("a.csv") && mf.tail(1).endsWith("b.csv"))

    intercept[BuildError](Pipeline.run(spark, Seq(
      s"globread:in=$d/*.nope:prefix=x:out=m2",
      "csvwrite:in=m2", s"filewrite:out=$d/x.csv")))
  }

  test("progress relay: per-stream row counts observed during the run") {
    val d = tmp("prog")
    writeCsv(s"$d/in.csv", "id,v", "1,a", "2,b", "3,c")
    // the self-join reads the observed stream 'kept' TWICE inside one
    // sink plan — the relay must survive (same CollectMetrics subtree
    // on two paths), and counts must match the data
    val res = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
      "filter:in=rows:expr=id > 1:out=kept",
      "select:in=kept:exprs=id:out=k1",
      "join:in=k1:with=k1:on=id:out=j",
      "csvwrite:in=j", s"filewrite:out=$d/out.csv"),
      progress = true)
    import spark.implicits._
    val prog = res.log.filter($"mod" === "progress")
      .select($"msg").as[String].collect().toSet
    assert(prog.contains("rows rows=3"), prog.toString)
    assert(prog.contains("kept rows=2"), prog.toString)
    assert(prog.contains("k1 rows=2"), prog.toString)
    assert(prog.contains("j rows=2"), prog.toString)
    // progress costs no extra actions, so rowsWritten is unchanged
    // (2 data rows + the csv header line)
    assert(res.rowsWritten.values.toSeq == Seq(3L))
  }

  test("entropy + safesplit + randomwalk modules end-to-end") {
    val d = tmp("curve")
    // entropy: uniform single char -> 0; 'ab' -> ln 2 rounded
    writeCsv(s"$d/docs.csv", "id,body", "1,aaaa", "2,ab")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/docs.csv", "csvread:out=docs",
      "entropy:in=docs:text=body:out=e",
      "select:in=e:exprs=id;entropy:out=sel",
      "sort:in=sel:by=id:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/e.csv"))
    assert(readOut(s"$d/e.csv") == Seq("id,entropy", "1,0.0", "2,0.6931"))

    // safesplit: docs 1,2 share cluster rep 1 -> SAME split always;
    // doc 4 has no cluster row -> routes by its own id (singleton)
    writeCsv(s"$d/sdocs.csv", "id,v", "1,a", "2,b", "3,c", "4,d")
    writeCsv(s"$d/clus.csv", "id,rep", "1,1", "2,1", "3,3")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/clus.csv", "csvread:infer=1:out=clus",
      s"fileread:in=$d/sdocs.csv", "csvread:infer=1:out=sdocs",
      "safesplit:in=sdocs:clusters=clus:key=id:weights=train=0.5,test=0.5:salt=v1:out=sp",
      "sort:in=sp:by=id:out=spo",
      "csvwrite:in=spo", s"filewrite:out=$d/sp.csv"))
    val spLines = readOut(s"$d/sp.csv")
    assert(spLines.head == "id,v,split")
    val byId = spLines.tail.map(_.split(",")).map(r => r(0) -> r(2)).toMap
    assert(byId.size == 4)
    assert(byId("1") == byId("2"), "clustered docs must share a split")
    assert(byId.values.forall(Set("train", "test")))

    // randomwalk: triangle 1->2->3->1; 3 steps from seed 1 must emit
    // step 0..3, each hop a real edge (deterministic hash pick)
    writeCsv(s"$d/we.csv", "src,dst", "1,2", "2,3", "3,1")
    writeCsv(s"$d/ws.csv", "id", "1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/ws.csv", "csvread:infer=1:out=ws",
      s"fileread:in=$d/we.csv", "csvread:infer=1:out=we",
      "randomwalk:in=we:seeds=ws:steps=3:out=walk",
      "sort:in=walk:by=step:out=wo",
      "csvwrite:in=wo", s"filewrite:out=$d/w.csv"))
    assert(readOut(s"$d/w.csv") ==
      Seq("seed,step,node", "1,0,1", "1,1,2", "1,2,3", "1,3,1"))

    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/sdocs.csv", "csvread:infer=1:out=s2",
      "safesplit:in=s2:clusters=nosuch:key=id:weights=train=1.0",
      "csvwrite", s"filewrite:out=$d/x2.csv")))
  }

  test("dedupcluster + survivor modules: DSL clustering chain end-to-end") {
    val d = tmp("clus")
    // docs 1 and 2 are identical (one near-dup cluster), 3 stands alone
    writeCsv(s"$d/in.ndjson",
      """{"id": 1, "body": "the quick brown fox jumps over the lazy dog today"}""",
      """{"id": 2, "body": "the quick brown fox jumps over the lazy dog today"}""",
      """{"id": 3, "body": "a completely different document about spark pipelines here"}""")
    // VERDICT r9 #5 chain: ndjsonread -> dedupcluster -> csvwrite
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.ndjson", "ndjsonread:out=docs",
      "dedupcluster:in=docs:key=id:text=body:threshold=0.9:out=clus",
      "sort:in=clus:by=id:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/clusters.csv"))
    assert(readOut(s"$d/clusters.csv") ==
      Seq("id,rep", "1,1", "2,1", "3,3"))

    // ...and survivorship on top: equal-quality duplicates tie-break to
    // the smallest id; family carries the cluster size
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.ndjson", "ndjsonread:out=docs2",
      "dedupcluster:in=docs2:key=id:text=body:threshold=0.9:out=clus2",
      "survivor:in=docs2:clusters=clus2:key=id:text=body:out=surv",
      "select:in=surv:exprs=id;rep;family:out=sel",
      "sort:in=sel:by=id:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/surv.csv"))
    assert(readOut(s"$d/surv.csv") ==
      Seq("id,rep,family", "1,1,2", "3,3,1"))

    // survivor honors an explicit numeric quality= column
    writeCsv(s"$d/q.ndjson",
      """{"id": 1, "body": "same text here", "score": 0.2}""",
      """{"id": 2, "body": "same text here", "score": 0.9}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/q.ndjson", "ndjsonread:out=docs3",
      "dedupcluster:in=docs3:key=id:text=body:threshold=0.9:out=clus3",
      "survivor:in=docs3:clusters=clus3:key=id:quality=score:out=surv3",
      "select:in=surv3:exprs=id;rep;family:out=sel3",
      "csvwrite:in=sel3", s"filewrite:out=$d/surv3.csv"))
    assert(readOut(s"$d/surv3.csv") == Seq("id,rep,family", "2,1,2"))

    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.ndjson", "ndjsonread:out=dx",
      "survivor:in=dx:clusters=nosuch:key=id:text=body",
      "csvwrite", s"filewrite:out=$d/x.csv")))
  }

  test("shuffleshard + pagerank modules: export draw and centrality from the DSL") {
    val d = tmp("shardpr")
    writeCsv(s"$d/in.csv", ("id,v" +: (1 to 20).map(i => s"$i,x$i")): _*)
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
      "shuffleshard:in=rows:key=id:shards=4:seed=t:out=sharded",
      "select:in=sharded:exprs=id;shard;pos:out=sel",
      "sort:in=sel:by=id:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/out.csv"))
    val rows = readOut(s"$d/out.csv").filterNot(_ == "id,shard,pos")
      .map(_.split(",")).map(a => (a(0).toInt, a(1).toInt, a(2).toInt))
    assert(rows.length == 20 && rows.map(_._2).forall(s => s >= 0 && s < 4))
    // matches the operator's draw exactly
    import spark.implicits._
    val want = graft.operators.Ops.shuffleShardAssign(
        (1 to 20).map(_.toLong).toDF("id"), "id", 4, "t")
      .select($"id", $"shard", $"pos").as[(Long, Int, Int)].collect()
      .map(t => (t._1.toInt, t._2, t._3)).sortBy(_._1).toSeq
    assert(rows.sortBy(_._1) == want)

    // pagerank over a 3-node symmetric path a-b-c: b is the center and
    // must rank strictly highest; ranks sum to ~1
    writeCsv(s"$d/edges.csv", "src,dst",
      "1,2", "2,1", "2,3", "3,2")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/edges.csv", "csvread:infer=1:out=e",
      "pagerank:in=e:iters=5:out=pr",
      "sort:in=pr:by=id:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/pr.csv"))
    val pr = readOut(s"$d/pr.csv").filterNot(_ == "id,r")
      .map(_.split(",")).map(a => (a(0).toInt, a(1).toDouble)).toMap
    assert(pr.keySet == Set(1, 2, 3))
    assert(pr(2) > pr(1) && pr(2) > pr(3), pr.toString)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, pr.toString)
  }

  test("jaccardjoin + trianglecount + hierflatten modules end-to-end") {
    val d = tmp("graphjac")
    // jaccardjoin: 1/2 are word-identical, 3 is disjoint
    writeCsv(s"$d/docs.ndjson",
      """{"id": 1, "body": "alpha beta gamma delta epsilon"}""",
      """{"id": 2, "body": "alpha beta gamma delta epsilon"}""",
      """{"id": 3, "body": "zeta eta theta iota kappa"}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/docs.ndjson", "ndjsonread:out=docs",
      "jaccardjoin:in=docs:key=id:text=body:threshold=0.8:out=pairs",
      "select:in=pairs:exprs=idA;idB;round(jac, 4) as jac:out=sel",
      "sort:in=sel:by=idA:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/pairs.csv"))
    assert(readOut(s"$d/pairs.csv") == Seq("idA,idB,jac", "1,2,1.0"))

    // trianglecount: triangle 1-2-3 (listed once per direction +
    // duplicates, canonicalized by the module) plus pendant 3-4
    writeCsv(s"$d/edges.csv", "src,dst",
      "1,2", "2,3", "3,1", "2,1", "3,4")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/edges.csv", "csvread:infer=1:out=e",
      "trianglecount:in=e:out=tc",
      "sort:in=tc:by=node:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/tc.csv"))
    assert(readOut(s"$d/tc.csv") ==
      Seq("node,triangles", "1,1", "2,1", "3,1"))

    // hierflatten: 1 <- 2 <- 3 chain, parent blank = root
    writeCsv(s"$d/h.ndjson",
      """{"k": 1}""",
      """{"k": 2, "par": 1}""",
      """{"k": 3, "par": 2}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/h.ndjson", "ndjsonread:out=h",
      "hierflatten:in=h:key=k:parent=par:rounds=2:out=f",
      "sort:in=f:by=id:out=sorted3",
      "csvwrite:in=sorted3", s"filewrite:out=$d/f.csv"))
    assert(readOut(s"$d/f.csv") ==
      Seq("id,root,depth", "1,1,0", "2,1,1", "3,1,2"))
  }

  test("kcore + hits modules end-to-end") {
    val d = tmp("graphcore")
    // triangle 1-2-3 with pendant tail 3-4-5: 2-core = the triangle
    writeCsv(s"$d/edges.csv", "a,b",
      "1,2", "2,3", "3,1", "3,4", "4,5")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/edges.csv", "csvread:infer=1:out=e",
      "kcore:in=e:u=a:v=b:k=2:out=core",
      "sort:in=core:by=node:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/core.csv"))
    assert(readOut(s"$d/core.csv") ==
      Seq("node,deg", "1,2", "2,2", "3,2"))

    // hits: hub 1 covers 10/11/12, hub 2 only 10 (OpsSpec fixture)
    writeCsv(s"$d/de.csv", "s,t", "1,10", "1,11", "1,12", "2,10")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/de.csv", "csvread:infer=1:out=e2",
      "hits:in=e2:src=s:dst=t:iters=2:out=sc",
      "select:in=sc:exprs=id;round(hub, 4) as hub;round(auth, 4) as auth:out=sel",
      "sort:in=sel:by=id:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/hits.csv"))
    assert(readOut(s"$d/hits.csv") == Seq("id,hub,auth",
      "1,1.0,0.0", "2,0.4286,0.0",
      "10,0.0,1.0", "11,0.0,0.6667", "12,0.0,0.6667"))
  }

  test("manifestdiff module end-to-end") {
    val d = tmp("mdiff")
    // old release = rows 1-4; new release adds row 5 (same shard count)
    writeCsv(s"$d/old.csv", "id,body",
      "1,alpha beta", "2,gamma", "3,delta", "4,eps")
    writeCsv(s"$d/new.csv", "id,body",
      "1,alpha beta", "2,gamma", "3,delta", "4,eps", "5,zeta eta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/old.csv", "csvread:infer=1:out=o",
      "manifest:in=o:key=id:text=body:shards=2:salt=r:out=mo",
      s"fileread:in=$d/new.csv", "csvread:infer=1:out=n",
      "manifest:in=n:key=id:text=body:shards=2:salt=r:out=mn",
      "manifestdiff:in=mn:old=mo:out=diff",
      "select:in=diff:exprs=shard;status;d_rows:out=sel",
      "sort:in=sel:by=shard:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/diff.csv"))
    // rows 1-4 all hash into shard 0 under salt=r; row 5 lands alone
    // in shard 1, so the diff reads: shard 0 unchanged, shard 1 added
    assert(readOut(s"$d/diff.csv") ==
      Seq("shard,status,d_rows", "0,unchanged,0", "1,added,1"))
  }

  test("labelprop module end-to-end") {
    val d = tmp("labelprop")
    // two triangles, no bridge: each settles on its min id
    writeCsv(s"$d/edges.csv", "a,b",
      "1,2", "2,3", "3,1", "10,11", "11,12", "12,10")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/edges.csv", "csvread:infer=1:out=e",
      "labelprop:in=e:u=a:v=b:out=lp",
      "sort:in=lp:by=node:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/lp.csv"))
    assert(readOut(s"$d/lp.csv") == Seq("node,label",
      "1,1", "2,1", "3,1", "10,10", "11,10", "12,10"))
  }

  test("heaps + precedence modules end-to-end") {
    val d = tmp("heapsprec")
    // two buckets (ids 0-1, 2-3): T=(4,8), V=(4,5) → the exact
    // 2-point fit beta=ln(5/4)/ln 2=0.3219, ln_k=0.94
    writeCsv(s"$d/docs.ndjson",
      """{"g": "en", "id": 0, "body": "a b"}""",
      """{"g": "en", "id": 1, "body": "c d"}""",
      """{"g": "en", "id": 2, "body": "a b"}""",
      """{"g": "en", "id": 3, "body": "c e"}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/docs.ndjson", "ndjsonread:out=docs",
      "heaps:in=docs:group=g:id=id:text=body:buckets=2:out=h",
      "csvwrite:in=h", s"filewrite:out=$d/h.csv"))
    assert(readOut(s"$d/h.csv") == Seq("g,n,beta,ln_k", "en,2,0.3219,0.94"))

    // u1 signup->purchase, u2 purchase->signup → ratio 0.5
    writeCsv(s"$d/ev.csv", "u,t,typ",
      "1,10,signup", "1,20,purchase",
      "2,10,purchase", "2,20,signup", "3,5,signup")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/ev.csv", "csvread:infer=1:out=ev",
      "precedence:in=ev:actor=u:type=typ:order=t,u:out=p",
      "csvwrite:in=p", s"filewrite:out=$d/p.csv"))
    assert(readOut(s"$d/p.csv") ==
      Seq("ta,tb,n_ab,n_ba,n_both,ratio", "purchase,signup,1,1,2,0.5"))
  }

  test("stratsplit + incragg modules end-to-end") {
    val d = tmp("stratincr")
    // stratsplit: strata a (4 rows) and b (2 rows), 50/50 split —
    // exact allocation: a gets 2+2, b gets 1+1
    writeCsv(s"$d/rows.csv",
      ("id,g" +: ((1 to 4).map(i => s"$i,a") ++ (5 to 6).map(i => s"$i,b"))): _*)
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/rows.csv", "csvread:infer=1:out=rows",
      "stratsplit:in=rows:key=id:stratum=g:weights=500,500:names=l,r:out=sp",
      "select:in=sp:exprs=g;split:out=sel",
      "agg:in=sel:by=g,split:exprs=count(1) as n:out=cnt",
      "sort:in=cnt:by=g,split:out=sorted",
      "csvwrite:in=sorted", s"filewrite:out=$d/sp.csv"))
    assert(readOut(s"$d/sp.csv") ==
      Seq("g,split,n", "a,l,2", "a,r,2", "b,l,1", "b,r,1"))

    // incragg: base agg + CDC deltas → merged view (worked example
    // from OpsSpec: repricing, a group move, a delete, an insert)
    writeCsv(s"$d/base.csv", "g,cnt,s", "a,2,30.0", "b,1,7.0")
    writeCsv(s"$d/cdc.ndjson",
      """{"change_type": "update", "old_g": "a", "new_g": "a", "old_m": 10.0, "new_m": 11.5}""",
      """{"change_type": "update", "old_g": "a", "new_g": "b", "old_m": 20.0, "new_m": 20.0}""",
      """{"change_type": "delete", "old_g": "b", "old_m": 7.0}""",
      """{"change_type": "insert", "new_g": "b", "new_m": 3.0}""")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/base.csv", "csvread:infer=1:out=base",
      s"fileread:in=$d/cdc.ndjson", "ndjsonread:out=cdc",
      "incragg:in=cdc:base=base:group=g:measure=m:cnt=cnt:sum=s:out=m2",
      "select:in=m2:exprs=g;cnt;cast(s as double) as s:out=sel2",
      "sort:in=sel2:by=g:out=sorted2",
      "csvwrite:in=sorted2", s"filewrite:out=$d/m.csv"))
    assert(readOut(s"$d/m.csv") ==
      Seq("g,cnt,s", "a,1,11.5", "b,2,23.0"))
  }

  test("mediadedup module: mixed image/audio/video corpus pairs per modality") {
    import graft.multimodal.{AviCodec, WavCodec, Multimodal}
    val d = tmp("mediadedup")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/$name"), bytes)
    // images: a1/a2 one-pixel edit near-dups, z one far-off pattern
    val px = Seq.tabulate(64)(i => if (i % 3 == 0) 230 else 20)
    put("img_a1.png", Multimodal.renderGray8x8(px))
    put("img_a2.png", Multimodal.renderGray8x8(px.updated(9, 235)))
    put("img_z.png", Multimodal.renderGray8x8(px.map(255 - _)))
    // audio: b1/b2 half-gain re-master (hash-equal), z different shape
    val sv = Seq.tabulate(64)(i => (if (i % 2 == 0) 3000 else 12000) * 1)
      .map(_ / 4 * 4)
    def clip(s: Seq[Int]) = WavCodec.encodePcm16(s.flatMap(v => Seq.fill(4)(v)))
    put("aud_b1.wav", clip(sv))
    put("aud_b2.wav", clip(sv.map(_ / 2)))
    put("aud_z.wav", clip(sv.map(v => if (v > 4000) 100 else 15000)))
    // video: c1/c2 one-block edit in one frame, z inverted everywhere
    val cells = (0 until 4).map(f => Seq.tabulate(64)(j =>
      if (j < 4) 255 else if (j < 8) 0
      else if ((j + f) % 2 == 0) 255 else 0))
    def avi(fs: Seq[Seq[Int]]) =
      AviCodec.buildAvi(fs.map(c => AviCodec.renderBlockFrame(c)), 64, 64)
    put("vid_c1.avi", avi(cells))
    put("vid_c2.avi", avi(cells.updated(2, cells(2).updated(10, 255 - cells(2)(10)))))
    put("vid_z.avi", avi(cells.map(fr => fr.take(8) ++ fr.drop(8).map(255 - _))))
    put("junk.bin", Array[Byte](9, 9, 9))
    Pipeline.run(spark, Seq(
      s"binaryread:in=$d:glob=*:out=media",
      "mediadedup:in=media:key=path:out=pairs",
      "select:in=pairs:exprs=idA;idB;kind:out=sel",
      "csvwrite:in=sel", s"filewrite:out=$d/out.csv"))
    def base(s: String) = s.substring(s.lastIndexOf('/') + 1)
    val got = readOut(s"$d/out.csv").filterNot(_ == "idA,idB,kind")
      .map(_.split(",")).map(a => (base(a(0)), base(a(1)), a(2))).toSet
    assert(got == Set(
      ("img_a1.png", "img_a2.png", "image"),
      ("aud_b1.wav", "aud_b2.wav", "audio"),
      ("vid_c1.avi", "vid_c2.avi", "video")), got.toString)
  }

  test("profile module: one-scan per-column quality report") {
    val d = tmp("profile")
    writeCsv(s"$d/in.csv", "id,name",
      "1,alpha", "2,", "2,beta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
      "profile:in=rows:out=rep",
      "csvwrite:in=rep", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted == Seq(
      "col_name,n_null,n_distinct,min_val,max_val",
      "id,0,2,1,2",
      "name,1,2,alpha,beta").sorted)
  }

  test("linkage module: blocked jaro-winkler pairs above threshold") {
    val d = tmp("linkage")
    writeCsv(s"$d/in.csv", "id,name,blk",
      "1,martha,b1", "2,marhta,b1", "3,zzzzzz,b1", "4,martha,b2")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
      "linkage:in=rows:id=id:text=name:block=blk:threshold=0.9:out=links",
      "csvwrite:in=links", s"filewrite:out=$d/out.csv"))
    // only the in-block near-identical pair links; b2 has one row
    assert(readOut(s"$d/out.csv").sorted == Seq(
      "id1,id2,score", "1,2,0.9611111111111111").sorted)
  }

  test("linkage module: loud errors on bad args") {
    val d = tmp("linkbad")
    writeCsv(s"$d/in.csv", "id,name,blk", "1,x,b")
    def err(spec: String) =
      intercept[BuildError](Pipeline.run(spark, Seq(
        s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
        spec, "csvwrite:in=links", s"filewrite:out=$d/out.csv"))).getMessage
    assert(err("linkage:in=rows:text=name:block=blk:out=links")
      .contains("id= required"))
    assert(err("linkage:in=rows:id=id:text=name:block=blk:threshold=1.5:out=links")
      .contains("threshold"))
    assert(err("linkage:in=rows:id=id:text=nope:block=blk:out=links")
      .contains("unknown columns"))
  }

  test("nfcnormalize module: combining marks compose in place") {
    val d = tmp("nfc")
    writeCsv(s"$d/in.csv", "id,t", "1,café", "2,plain")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
      "nfcnormalize:in=rows:col=t:out=norm",
      "csvwrite:in=norm", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted ==
      Seq("id,t", "1,caf\u00e9", "2,plain").sorted)
  }

  test("kmvsketch module: per-group distinct estimate, exact below k") {
    val d = tmp("kmv")
    writeCsv(s"$d/in.csv", "g,k",
      "a,x", "a,y", "a,x", "a,z", "b,x", "b,x")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=rows",
      "kmvsketch:in=rows:key=k:by=g:k=16:out=est",
      "csvwrite:in=est", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted ==
      Seq("a,3.0", "b,1.0", "g,est_distinct").sorted)
  }

  test("scd2 module: change batch re-versions touched keys only") {
    val d = tmp("scd2")
    writeCsv(s"$d/current.csv", "k,attr,valid_from,valid_to,is_current",
      "u1,a,2024-01-01T00:00:00,2024-01-02T00:00:00,false",
      "u1,b,2024-01-02T00:00:00,,true",
      "u2,c,2024-01-01T12:00:00,,true")
    writeCsv(s"$d/changes.csv", "k,attr,ts",
      "u1,d,2024-01-03T00:00:00")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/current.csv", "csvread:infer=1:out=cur",
      s"fileread:in=$d/changes.csv", "csvread:infer=1:out=chg",
      "scd2:in=cur:with=chg:key=k:attrs=attr:out=dim",
      "select:in=dim:exprs=k;attr;is_current:out=p",
      "csvwrite:in=p", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted == Seq(
      "k,attr,is_current",
      "u1,a,false",  // closed history untouched
      "u1,b,false",  // open row closed by the batch
      "u1,d,true",   // change becomes the open version
      "u2,c,true"    // untouched key passes through open
    ).sorted)
  }

  test("decontaminate module drops train rows overlapping the eval stream") {
    val d = tmp("decon")
    writeCsv(s"$d/train.csv", "id,body",
      "1,alpha beta gamma delta epsilon zeta eta theta",
      "2,some other words that overlap nothing from eval",
      "3,alpha beta gamma delta epsilon zeta different tail")
    writeCsv(s"$d/eval.csv", "id,body",
      "900,alpha beta gamma delta epsilon zeta eta theta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/eval.csv", "csvread:infer=1:out=ev",
      s"fileread:in=$d/train.csv", "csvread:infer=1:out=tr",
      "decontaminate:in=tr:eval=ev:key=id:text=body:minshared=4",
      "select:exprs=id:out=ids",
      "csvwrite:in=ids", s"filewrite:out=$d/out.csv"))
    // doc 1 shares all 6 shingles (dropped); doc 3 shares 4 (dropped);
    // doc 2 shares none (kept)
    assert(readOut(s"$d/out.csv").sorted == Seq("2", "id"))

    // mode=flag emits the overlap stats instead of filtering
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/eval.csv", "csvread:infer=1:out=ev2",
      s"fileread:in=$d/train.csv", "csvread:infer=1:out=tr2",
      "decontaminate:in=tr2:eval=ev2:key=id:text=body:minshared=4:mode=flag",
      "select:exprs=id;contaminated:out=st",
      "csvwrite:in=st", s"filewrite:out=$d/flag.csv"))
    assert(readOut(s"$d/flag.csv").sorted ==
      Seq("1,true", "3,true", "id,contaminated"))
  }

  test("mixsample module rebalances domains deterministically") {
    val d = tmp("mix")
    val rows = "id,dom" +: (0 until 60)
      .map(i => s"$i,${if (i < 50) "big" else "small"}")
    writeCsv(s"$d/in.csv", rows: _*)
    def run(out: String) = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", s"csvread:infer=1:out=r_$out",
      s"mixsample:in=r_$out:domain=dom:key=id:target=8",
      s"select:exprs=id:out=ids_$out",
      s"csvwrite:in=ids_$out", s"filewrite:out=$d/$out.csv"))
    run("a"); run("b")
    val a = readOut(s"$d/a.csv")
    assert(a == readOut(s"$d/b.csv")) // same draw every run
    assert(a.length > 1 && a.length < 61) // thinned, non-empty
  }

  test("sql module runs arbitrary SQL over __in and views=, colons included") {
    val d = tmp("sqlmod")
    writeCsv(s"$d/fact.csv", "k,v", "a,1", "a,2", "b,5")
    writeCsv(s"$d/dim.csv", "k,name", "a,alpha", "b,beta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/dim.csv", "csvread:infer=1:out=dim",
      s"fileread:in=$d/fact.csv", "csvread:infer=1:out=fact",
      // query= last; contains ':' (cast syntax) and '=' (join predicate)
      "sql:in=fact:views=dim:out=agg:query=SELECT name, sum(v) AS sv, " +
        "timestamp'2024-01-01 10:30:00' AS t " +
        "FROM __in JOIN dim ON __in.k = dim.k GROUP BY name",
      "select:exprs=name;sv:in=agg:out=res",
      "csvwrite:in=res", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted == Seq("alpha,3", "beta,5", "name,sv"))
    // missing query= fails loudly
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/fact.csv", "csvread:infer=1:out=f2",
      "sql:in=f2", "csvwrite", s"filewrite:out=$d/x.csv")))
  }

  test("sql module view names neither clobber nor leak on the shared session") {
    // ADVICE r5: views run in an isolated child session — a user's own
    // temp view named __in (or a stream name) must survive the
    // pipeline, and the pipeline's views must not remain afterwards.
    val d = tmp("sqliso")
    writeCsv(s"$d/fact.csv", "k,v", "a,1", "b,2")
    import spark.implicits._
    Seq(("mine", 42)).toDF("tag", "n").createOrReplaceTempView("__in")
    Seq(("user", 7)).toDF("tag", "n").createOrReplaceTempView("dimv")
    try {
      Pipeline.run(spark, Seq(
        s"fileread:in=$d/fact.csv", "csvread:infer=1:out=fact",
        s"fileread:in=$d/fact.csv", "csvread:infer=1:out=dimv",
        "sql:in=fact:views=dimv:out=agg:query=SELECT sum(__in.v) AS sv FROM __in " +
          "JOIN dimv ON __in.k = dimv.k GROUP BY __in.k",
        "csvwrite:in=agg", s"filewrite:out=$d/out.csv"))
      // pipeline used ITS streams (fact/dimv csv), not the user views
      assert(readOut(s"$d/out.csv").sorted == Seq("1", "2", "sv"))
      // and the user's same-named views are untouched
      assert(spark.table("__in").collect().head.getString(0) == "mine")
      assert(spark.table("dimv").collect().head.getString(0) == "user")
    } finally {
      spark.catalog.dropTempView("__in")
      spark.catalog.dropTempView("dimv")
    }
  }

  test("streaming DSL: watermarked windowed aggregate end-to-end over a MemoryStream") {
    // VERDICT r5 #4: a DSL chain (eventwindow → streamwrite) running a
    // REAL unbounded query. The MemoryStream enters as an external
    // input stream; the sentinel event pushes the watermark past the
    // data windows so append mode emits them (Spark's no-data batch),
    // and the idempotent sink lands them as batch_<id>/ parquet.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.Ev
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = tmp("sdsl")
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1L, ts(0, 5), 10L, "view", 1.0),
      Ev(2L, ts(0, 25), 11L, "view", 2.0),
      Ev(3L, ts(0, 45), 12L, "view", 3.0),
      Ev(4L, ts(1, 10), 10L, "click", 5.0),
      Ev(5L, ts(1, 50), 13L, "click", 5.0),
      Ev(99L, ts(10), 9L, "view", 0.0)) // sentinel: watermark → 08:00
    val r = Pipeline.run(spark, Seq(
      "eventwindow:in=ev:watermark=2 hours:width=1 hour:out=agg",
      s"streamwrite:in=agg:path=$d/out:checkpoint=$d/ckpt"),
      inputs = Map("ev" -> mem.toDF()))
    assert(r.rowsWritten.values.sum == 2L) // the two closed windows
    val got = spark.read.parquet(
      new java.io.File(s"$d/out").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
        .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("ws", "event_type", "n", "total")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (ts(0), "view", 3L, 6.0),
      (ts(1), "click", 2L, 10.0)))
  }

  test("streaming DSL batch twins: same chain verifies on bounded input") {
    // The exact words that ran unbounded above run bounded here —
    // eventwindow takes the tumblingCounts twin, streamdedup the plain
    // distinct, streamwrite a batch_0 landing dir.
    import graft.streaming.EventStreams.Ev
    import spark.implicits._
    val d = tmp("sdslb")
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val batch = Seq(
      Ev(1L, ts(0, 5), 10L, "view", 1.0),
      Ev(1L, ts(0, 5), 10L, "view", 1.0), // dup to drop
      Ev(2L, ts(1, 10), 11L, "click", 4.0)).toDF()
    val r = Pipeline.run(spark, Seq(
      "streamdedup:in=ev:key=event_id:out=ded",
      "eventwindow:in=ded:width=1 hour:out=agg",
      s"streamwrite:in=agg:path=$d/out"),
      inputs = Map("ev" -> batch))
    assert(r.rowsWritten.values.sum == 2L)
    val got = spark.read.parquet(s"$d/out/batch_0")
      .select("ws", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((ts(0), "view", 1L), (ts(1), "click", 1L)))
  }

  test("intervaljoin module: inner attaches r_ columns, left_outer keeps unmatched") {
    import spark.implicits._
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val views = Seq(
      (10L, ts(0), 100L), (10L, ts(5), 101L), (11L, ts(2), 102L))
      .toDF("user_id", "ts", "view_id")
    val clicks = Seq(
      (10L, ts(0, 30), 900L), // inside view 100's hour
      (11L, ts(9), 901L))     // 7h after view 102 -> no match
      .toDF("user_id", "ts", "click_id")
    val d = tmp("ijmod")
    Pipeline.run(spark, Seq(
      "intervaljoin:in=v:with=c:key=user_id:within=1 hour:type=left_outer",
      s"streamwrite:path=$d/out"),
      inputs = Map("v" -> views, "c" -> clicks))
    val got = spark.read.parquet(s"$d/out/batch_0")
      .select("view_id", "r_click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set((100L, 900L), (101L, -1L), (102L, -1L)))
    // inner drops the unmatched rows, same join otherwise
    val d2 = tmp("ijmod2")
    Pipeline.run(spark, Seq(
      "intervaljoin:in=v:with=c:key=user_id:within=1 hour",
      s"streamwrite:path=$d2/out"),
      inputs = Map("v" -> views, "c" -> clicks))
    assert(spark.read.parquet(s"$d2/out/batch_0")
      .select("view_id").as[Long].collect().toSeq == Seq(100L))
  }

  test("new modules reject bad arguments loudly") {
    import spark.implicits._
    val df = Seq((1L, "t")).toDF("id", "text")
    def bad(msg: String, chain: String*) = {
      val e = intercept[BuildError](
        Pipeline.run(spark, chain, inputs = Map("x" -> df, "y" -> df)))
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
    }
    bad("type must be inner, left_outer or full_outer",
      "intervaljoin:in=x:with=y:key=id:type=cross",
      "stdout:in=intervaljoin")
    bad("with= required", "intervaljoin:in=x:key=id",
      "stdout:in=intervaljoin")
    bad("order= required", "domaincap:in=x:domain=id:cap=3",
      "stdout:in=domaincap")
    bad("bad order entry",
      "domaincap:in=x:domain=id:order=id.sideways:cap=3",
      "stdout:in=domaincap")
    bad("text= required", "segdedup:in=x:key=id", "stdout:in=segdedup")
    bad("files= must be >= 1", "sortwrite:in=x:by=id:files=0:out=/tmp/nope")
    bad("files= must be >= 1", "parquetwrite:in=x:out=/tmp/nope:files=0")
  }

  test("streaming DSL: watermark + intervaljoin join two unbounded streams") {
    // The watermark module is what makes stateful two-input modules
    // reachable from the DSL: stream-stream joins need BOTH sides
    // watermarked, which per-module args can't express.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.Ev
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = tmp("swij")
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val vm = MemoryStream[Ev]
    val cm = MemoryStream[Ev]
    vm.addData(
      Ev(100L, ts(0), 10L, "view", 1.0),
      Ev(101L, ts(5), 10L, "view", 1.0))
    cm.addData(
      Ev(900L, ts(0, 30), 10L, "click", 2.0), // inside view 100's hour
      Ev(901L, ts(9), 11L, "click", 2.0))     // different user
    val r = Pipeline.run(spark, Seq(
      "watermark:in=v:col=ts:delay=2 hours:out=vw",
      "watermark:in=c:col=ts:delay=2 hours:out=cw",
      "intervaljoin:in=vw:with=cw:key=user_id:within=1 hour:out=j",
      s"streamwrite:in=j:path=$d/out:checkpoint=$d/ckpt"),
      inputs = Map("v" -> vm.toDF(), "c" -> cm.toDF()))
    assert(r.rowsWritten.values.sum == 1L)
    val dirs = new java.io.File(s"$d/out").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .map(_.getAbsolutePath).toIndexedSeq
    val got = spark.read.parquet(dirs: _*)
      .select($"event_id", $"r_event_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 900L)))
  }

  test("streamwrite reruns report only batches landed THIS run") {
    // ADVICE r6: counting every batch_* dir under path attributed
    // stale batches from earlier runs to the current one. The listing
    // delta pins the fix: a second bounded run into the same dir lands
    // nothing (batch_0/_SUCCESS exists → idempotent skip) and must
    // report 0 rows, not the historical total.
    import graft.streaming.EventStreams.Ev
    import spark.implicits._
    val d = tmp("swrerun")
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val batch = Seq(
      Ev(1L, ts(0), 10L, "view", 1.0),
      Ev(2L, ts(1), 11L, "click", 4.0)).toDF()
    def run() = Pipeline.run(spark,
      Seq(s"streamwrite:in=ev:path=$d/out"),
      inputs = Map("ev" -> batch))
    assert(run().rowsWritten.values.sum == 2L, "first run lands batch_0")
    assert(run().rowsWritten.values.sum == 0L,
      "rerun must not attribute the pre-existing batch to itself")
  }

  test("eventread builds an unbounded stream; exactly one of dir=/rate= enforced") {
    val ctx = Pipeline.build(spark, Seq(
      "eventread:rate=1:out=ev",
      "streamdedup:in=ev:out=ded",
      s"streamwrite:in=ded:path=${tmp("sdslr")}/out"))
    assert(ctx.streams("ev")._1.isStreaming)
    assert(ctx.streams("ded")._1.isStreaming)
    intercept[BuildError](Pipeline.build(spark,
      Seq("eventread:out=x", "streamwrite:in=x:path=/tmp/nope")))
    intercept[BuildError](Pipeline.build(spark,
      Seq("eventread:rate=1:dir=/tmp:out=x", "streamwrite:in=x:path=/tmp/nope")))
  }

  test("chunk module windows documents; alpha mixsample shares a total budget") {
    val d = tmp("chunk")
    writeCsv(s"$d/in.csv", "id,body",
      "1," + (1 to 10).map(i => s"w$i").mkString(" "),
      "2," + (1 to 3).map(i => s"v$i").mkString(" "))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      "chunk:key=id:text=body:size=4:stride=4",
      "select:exprs=id;chunk_idx;n_tok:out=cs",
      "csvwrite:in=cs", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted ==
      Seq("1,0,4", "1,1,4", "1,2,2", "2,0,3", "id,chunk_idx,n_tok"))

    // alpha= routes to temperatureRebalance (total budget semantics)
    val rows = "id,dom" +: (0 until 80).map(i =>
      s"$i,${if (i < 60) "big" else "small"}")
    writeCsv(s"$d/mix.csv", rows: _*)
    val r = Pipeline.run(spark, Seq(
      s"fileread:in=$d/mix.csv", "csvread:infer=1:out=m",
      "mixsample:in=m:domain=dom:key=id:target=40:alpha=0.5",
      "select:exprs=id:out=ids",
      "csvwrite:in=ids", s"filewrite:out=$d/mo.csv"))
    val kept = readOut(s"$d/mo.csv").length - 1
    assert(kept > 10 && kept < 80, s"kept=$kept")
  }

  test("chartwrite renders an SVG chart from an aggregated stream") {
    val d = tmp("chart")
    writeCsv(s"$d/in.csv", "k,v", "a,3", "b,-1", "c,7", "d,4")
    val r = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      s"chartwrite:out=$d/bar.svg:type=bar:x=k:y=v:title=demo"))
    assert(r.rowsWritten.values.sum == 4)
    val svg = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$d/bar.svg"))
    assert(svg.startsWith("<svg"))
    assert(svg.contains(">demo</text>"))
    // one bar per row (plus the background rect)
    assert(svg.split("<rect ").length - 1 == 4 + 1)
    // line type: one polyline with 4 points
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      s"chartwrite:out=$d/line.svg:type=line:x=k:y=v"))
    val line = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$d/line.svg"))
    assert(line.contains("<polyline"))
    assert(line.split("<polyline")(1).split("\"")(1).trim.split(" ").length == 4)
    // cap: more rows than maxpoints aborts loudly
    val err = intercept[Exception](Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      s"chartwrite:out=$d/x.svg:maxpoints=2:y=v")))
    assert(err.getMessage.contains("maxpoints"))
    // bad type rejected at build
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      s"chartwrite:out=$d/x.svg:type=pie:y=v")))
  }

  test("tcpread server-mode e2e: peer connects, sends lines, stream flows") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val d = tmp("tcpread")
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    // the pipeline's tcpread listens; this test is the remote client
    val run = Future(Pipeline.run(spark, Seq(
      s"tcpread:listen=$port", "exec:cmd=tr a-z A-Z",
      s"filewrite:out=$d/out.txt")))
    val deadline = System.nanoTime() + 15000000000L
    var sent = false
    var lastErr: Throwable = null
    while (!sent && System.nanoTime() < deadline) {
      if (run.isCompleted) Await.result(run, 1.second) // surface build failure
      try {
        val c = new java.net.Socket("127.0.0.1", port)
        try {
          val w = new java.io.OutputStreamWriter(c.getOutputStream, "UTF-8")
          w.write("hello\nworld\n"); w.flush()
        } finally c.close()
        sent = true
      } catch {
        case scala.util.control.NonFatal(e) => lastErr = e; Thread.sleep(50)
      }
    }
    assert(sent, s"could not reach the listening tcpread module: $lastErr")
    Await.result(run, 60.seconds)
    assert(readOut(s"$d/out.txt").toSet == Set("HELLO", "WORLD"))
  }

  test("tcpwrite client-mode e2e: rows stream out as lines over a socket") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val d = tmp("tcpwrite")
    writeCsv(s"$d/in.txt", "one", "two", "three")
    val srv = new java.net.ServerSocket(0)
    srv.setSoTimeout(30000)
    // this test is the remote server; tcpwrite connects as a client
    val received = Future {
      val c = srv.accept()
      try scala.io.Source.fromInputStream(c.getInputStream, "UTF-8")
        .getLines().toVector
      finally { c.close(); srv.close() }
    }
    val r = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.txt",
      s"tcpwrite:host=127.0.0.1:port=${srv.getLocalPort}"))
    assert(Await.result(received, 30.seconds).toSet == Set("one", "two", "three"))
    assert(r.rowsWritten.values.sum == 3)
    // arg validation fails at build, not with a hung socket
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.txt", "tcpwrite:port=99")))
  }

  test("exec module pipes rows through an external command per partition") {
    val d = tmp("execmod")
    writeCsv(s"$d/in.txt", "alpha", "beta", "gamma")
    // tr runs once per partition, lines stream through stdin/stdout
    // (reference TODO:31-32, Spark-native RDD.pipe shape)
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.txt", "exec:cmd=tr a-z A-Z",
      s"filewrite:out=$d/out.txt"))
    assert(readOut(s"$d/out.txt").toSet == Set("ALPHA", "BETA", "GAMMA"))
    // cmd= swallows colons like url= (shell syntax uses them)
    val m = Pipeline.parseWord("exec:cmd=awk -F: {print $1}:out=s")
    assert(m.args("cmd") == "awk -F: {print $1}" && m.args("out") == "s")
    // a failing command surfaces loudly, not as silent empty output
    val err = intercept[Exception] {
      Pipeline.run(spark, Seq(
        s"fileread:in=$d/in.txt", "exec:cmd=exit 3",
        s"filewrite:out=$d/boom.txt"))
    }
    assert(err.getMessage != null)
  }

  test("stdin module e2e: piped bytes flow stdin -> csvread -> filewrite") {
    // The one module that needs a real process boundary: launch Main in
    // a child JVM (same classpath — Test/fork gives the full one) and
    // pipe CSV into its stdin, the reference's `cat f | dbitool stdin
    // csvread …` shape (dbitool.pl:956-992).
    val d = tmp("stdinmod")
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.pipeline.Main",
      "stdin", "csvread", "sort:by=k", "csvwrite",
      s"filewrite:out=$d/out.csv")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    val p = pb.start()
    p.getOutputStream.write("k,v\n2,beta\n1,alpha\n".getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"exit=$rc output tail:\n${out.takeRight(2000)}")
    assert(readOut(s"$d/out.csv") == Seq("k,v", "1,alpha", "2,beta"))
  }

  test("zipread/zipwrite modules round-trip (reference TODO:48-53)") {
    val d = tmp("zipmod")
    // multi-entry zip: zipread concatenates entries in archive order
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$d/in.zip"))
    zos.putNextEntry(new java.util.zip.ZipEntry("a.csv"))
    zos.write("k,v\n1,alpha\n".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("b.txt"))
    zos.write("ignored\n".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    // entry= selects one member; csv parse → filter → zipwrite
    Pipeline.run(spark, Seq(
      s"zipread:in=$d/in.zip:entry=a.csv", "csvread",
      "csvwrite", s"zipwrite:out=$d/out.zip:entry=out.csv"))
    val zf = new java.util.zip.ZipFile(s"$d/out.zip")
    val back = try {
      val e = zf.getEntry("out.csv")
      assert(e != null, "entry out.csv missing")
      scala.io.Source.fromInputStream(zf.getInputStream(e), "UTF-8")
        .getLines().toList
    } finally zf.close()
    assert(back == List("k,v", "1,alpha"))
    // whole-archive read: both entries' lines flow (raw stream)
    Pipeline.run(spark, Seq(
      s"zipread:in=$d/in.zip", s"filewrite:out=$d/all.txt"))
    assert(readOut(s"$d/all.txt").toSet ==
      Set("k,v", "1,alpha", "ignored"))
    // missing entry fails loudly
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"zipread:in=$d/in.zip:entry=nope", s"filewrite:out=$d/x.txt")))
  }

  test("stats mode reports per-stream row counts") {
    val d = tmp("stats")
    writeCsv(s"$d/in.csv", "a", "1", "2", "3")
    val r = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv:out=raw1", "csvread:in=raw1:out=rows1",
      "csvwrite:in=rows1:out=txt1", s"filewrite:in=txt1:out=$d/o.csv"),
      stats = true)
    assert(r.streamStats("raw1") == 4)   // header + 3
    assert(r.streamStats("rows1") == 3)
    assert(r.rowsWritten.values.sum == 4)
  }

  test("error channel: corrupt csv rows route to error stream") {
    val d = tmp("err")
    writeCsv(s"$d/in.csv", "a,b", "1,x", "\"unclosed,oops", "2,y")
    val r = Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      "csvwrite", s"filewrite:out=$d/out.csv",
      "csvwrite:in=error:out=errcsv", s"filewrite:in=errcsv:out=$d/err.csv"))
    val good = readOut(s"$d/out.csv")
    assert(good.length == 3, good.mkString("|")) // header + 2 clean rows
    val errs = readOut(s"$d/err.csv")
    assert(errs.exists(_.contains("csvread")), errs.mkString("|"))
  }

  test("error budget: too many corrupt rows fail the run") {
    val d = tmp("errbudget")
    writeCsv(s"$d/in.csv", "a,b",
      "\"u1,x", "\"u2,x", "\"u3,x", "\"u4,x", "\"u5,x")
    intercept[Pipeline.ErrorBudgetExceeded] {
      Pipeline.run(spark, Seq(
        s"fileread:in=$d/in.csv", "csvread:infer=1",
        "csvwrite", s"filewrite:out=$d/out.csv"), errorSize = 3)
    }
  }

  test("spreadsheet csv-type modules honor x/y origin and header") {
    val d = tmp("sheet")
    // block starts at column 2 (x=2), row 2 (y=2)
    writeCsv(s"$d/in.csv",
      "junk-row-to-skip",
      ",k,v",
      ",1,a",
      ",2,b")
    Pipeline.run(spark, Seq(
      s"spreadsheetread:fname=$d/in.csv:x=2:y=2",
      "filter:expr=k > 1",
      s"spreadsheetwrite:fname=$d/out.csv:x=3:y=2"))
    val out = scala.io.Source.fromFile(s"$d/out.csv").getLines().toSeq
    assert(out == Seq("", ",,k,v", ",,2,b"), out.mkString("|"))
    // csv/xls/xlsx/ods all supported now; anything else still rejected
    intercept[BuildError](Pipeline.build(spark,
      Seq(s"spreadsheetread:fname=$d/in.csv:type=xlsb")))
  }

  test("asofjoin module: latest right row at-or-before each left ts") {
    val d = tmp("asof")
    writeCsv(s"$d/left.csv", "k,ts,x",
      "a,2024-01-01T00:05:00,1", "a,2024-01-01T00:20:00,2")
    writeCsv(s"$d/right.csv", "k,ts,px",
      "a,2024-01-01T00:00:00,10", "a,2024-01-01T00:10:00,20")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/left.csv", "csvread:infer=1:out=l",
      s"fileread:in=$d/right.csv", "csvread:infer=1:out=r",
      "asofjoin:in=l:with=r:on=k:lts=ts:rts=ts:out=j",
      "select:in=j:exprs=k;x;r_px:out=p",
      "csvwrite:in=p", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted ==
      Seq("a,1,10", "a,2,20", "k,x,r_px").sorted)

    // bucket= selects the skew-safe variant; identical output (the
    // 5-minute bucket forces a cross-bucket carry for the 00:20 row)
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/left.csv", "csvread:infer=1:out=l2",
      s"fileread:in=$d/right.csv", "csvread:infer=1:out=r2",
      "asofjoin:in=l2:with=r2:on=k:lts=ts:rts=ts:bucket=300000000:out=j2",
      "select:in=j2:exprs=k;x;r_px:out=p2",
      "csvwrite:in=p2", s"filewrite:out=$d/out2.csv"))
    assert(readOut(s"$d/out2.csv").sorted ==
      Seq("a,1,10", "a,2,20", "k,x,r_px").sorted)
  }

  test("multimodal modules: binaryread -> mediameta -> csv of dimensions") {
    val d = tmp("media")
    // one real PNG (8x6) + one GMM1 stub payload ("aud" 1x2)
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/a.png"), bos.toByteArray)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/b.bin"),
      graft.multimodal.Multimodal.StubCodec.encode("aud", 1, 2, 99L))
    // one real WAV (16-bit mono PCM, 8 kHz): AutoCodec must route it to
    // the real audio codec inside the same pipeline
    locally {
      import javax.sound.sampled._
      val pcm = new Array[Byte](1600)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm),
        new AudioFormat(8000f, 16, 1, true, false), 800L)
      val wbos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, wbos)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$d/c.wav"), wbos.toByteArray)
    }
    Pipeline.run(spark, Seq(
      s"binaryread:in=$d:glob=*:out=m",
      "mediameta:in=m:out=mm",
      "select:in=mm:exprs=meta.format as fmt;meta.width as w;meta.height as h:out=p",
      "csvwrite:in=p", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted ==
      Seq("aud,1,2", "fmt,w,h", "png,8,6", "wav,8000,1").sorted)

    // features flow into rows usable by the similarity operators
    Pipeline.run(spark, Seq(
      s"binaryread:in=$d:glob=*.png:out=m2",
      "mediafeatures:in=m2:dim=8:out=f",
      "select:in=f:exprs=size(embedding) as d:out=p2",
      "csvwrite:in=p2", s"filewrite:out=$d/feat.csv"))
    assert(readOut(s"$d/feat.csv").sorted == Seq("8", "d").sorted)

    // perceptual hash lands as a long column; the all-black 8x6 PNG
    // has a uniform grid -> no cell beats the mean -> phash 0
    Pipeline.run(spark, Seq(
      s"binaryread:in=$d:glob=*.png:out=m3",
      "mediaphash:in=m3:out=ph",
      "select:in=ph:exprs=phash:out=p3",
      "csvwrite:in=p3", s"filewrite:out=$d/ph.csv"))
    assert(readOut(s"$d/ph.csv").sorted == Seq("0", "phash").sorted)
  }

  test("rangejoin module: points land in their intervals") {
    val d = tmp("range")
    writeCsv(s"$d/pts.csv", "k,ts,ev",
      "a,2024-01-01T00:05:00,p1", "a,2024-01-01T02:00:00,p2")
    writeCsv(s"$d/iv.csv", "k,s,e,tag",
      "a,2024-01-01T00:00:00,2024-01-01T01:00:00,w1")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/pts.csv", "csvread:infer=1:out=p",
      s"fileread:in=$d/iv.csv", "csvread:infer=1:out=iv",
      "rangejoin:in=p:with=iv:on=k:pts=ts:start=s:end=e:bucket=3600000000:out=j",
      "select:in=j:exprs=ev;tag:out=sel",
      "csvwrite:in=sel", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted == Seq("ev,tag", "p1,w1"))
  }

  test("dedupnear module drops near-duplicate texts, keeps smallest key") {
    val d = tmp("near")
    writeCsv(s"$d/in.csv", "id,body",
      "1,the quick brown fox jumps over the lazy dog today",
      "2,the quick brown fox jumps over the lazy dog today",
      "3,a completely different document about spark pipelines here")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1",
      "dedupnear:key=id:text=body:threshold=0.9",
      "select:exprs=id:out=ids",
      "csvwrite:in=ids", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv").sorted == Seq("1", "3", "id"))

    // transitive flag: connected components keep one doc per cluster
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=r2",
      "dedupnear:in=r2:key=id:text=body:threshold=0.9:transitive",
      "select:exprs=id:out=ids2",
      "csvwrite:in=ids2", s"filewrite:out=$d/out2.csv"))
    assert(readOut(s"$d/out2.csv").sorted == Seq("1", "3", "id"))

    // hash=md5 selects the portable family — same survivors here
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=r3",
      "dedupnear:in=r3:key=id:text=body:threshold=0.9:hash=md5",
      "select:exprs=id:out=ids3",
      "csvwrite:in=ids3", s"filewrite:out=$d/out3.csv"))
    assert(readOut(s"$d/out3.csv").sorted == Seq("1", "3", "id"))
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=r4",
      "dedupnear:in=r4:key=id:text=body:hash=sha9",
      "csvwrite", s"filewrite:out=$d/x.csv")))

    // other fingerprint families: identical docs collapse under
    // simhash (hamming 0) and winnowing (identical fingerprint sets)
    Seq("method=simhash", "method=winnow", "method=simhash:hash=md5",
        "method=winnow:hash=md5").zipWithIndex.foreach { case (arg, i) =>
      Pipeline.run(spark, Seq(
        s"fileread:in=$d/in.csv", s"csvread:infer=1:out=m$i",
        s"dedupnear:in=m$i:key=id:text=body:$arg",
        s"select:exprs=id:out=mi$i",
        s"csvwrite:in=mi$i", s"filewrite:out=$d/m$i.csv"))
      assert(readOut(s"$d/m$i.csv").sorted == Seq("1", "3", "id"), arg)
    }

    // method=containment: a snippet INSIDE doc 1 dies (containment
    // 1.0) even though its jaccard vs the full doc is far below any
    // LSH threshold — the doc-in-doc semantic the other methods miss
    writeCsv(s"$d/cin.csv", "id,body",
      "1,the quick brown fox jumps over the lazy dog today and tomorrow and forever more",
      "2,the quick brown fox jumps",
      "3,a completely different document about spark pipelines here")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/cin.csv", "csvread:infer=1:out=c0",
      "dedupnear:in=c0:key=id:text=body:method=containment:threshold=0.9",
      "select:exprs=id:out=cids",
      "csvwrite:in=cids", s"filewrite:out=$d/c.csv"))
    assert(readOut(s"$d/c.csv").sorted == Seq("1", "3", "id"))
  }

  test("dbdumpread reconstructs rows from a db_dump of a reference ndb file") {
    val d = tmp("dbdump")
    def hex(s: String) = s.getBytes("UTF-8").map(b => f"$b%02x").mkString
    // bytevalue dump: _col schema row + 2 JSON-array rows (the
    // reference's storage layout, dbitool.pl:2669-2686)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/t.dump"),
      Seq("VERSION=3", "format=bytevalue", "type=btree", "HEADER=END",
        " " + hex("1"), " " + hex("""["1","alice","9"]"""),
        " " + hex("2"), " " + hex("""["2","bob","7"]"""),
        " " + hex("_col"), " " + hex("""["id","name","score"]"""),
        "DATA=END").mkString("\n"))
    Pipeline.run(spark, Seq(
      s"dbdumpread:in=$d/t.dump", "sort:by=id",
      "csvwrite", s"filewrite:out=$d/out.csv"))
    assert(readOut(s"$d/out.csv") ==
      Seq("id,name,score", "1,alice,9", "2,bob,7"))

    // print-format dump with escapes: \20 (hex space) in a value line,
    // \\ (literal backslash) in a key line — both decode branches; one
    // RAW non-ASCII char (non-conformant but seen in hand-edited
    // dumps) must survive as UTF-8, not a truncated low byte
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/p.dump"),
      Seq("VERSION=3", "format=print", "type=btree", "HEADER=END",
        """ k\\1""", """ ["p\20q","café"]""",
        " _col", """ ["c1","c2"]""",
        "DATA=END").mkString("\n"))
    Pipeline.run(spark, Seq(
      s"dbdumpread:in=$d/p.dump",
      "csvwrite", s"filewrite:out=$d/pout.csv"))
    assert(readOut(s"$d/pout.csv") == Seq("c1,c2", "p q,café"))

    // a dump without _col is not a dbitool ndb — loud failure
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/bad.dump"),
      Seq("VERSION=3", "format=bytevalue", "HEADER=END",
        " " + hex("1"), " " + hex("""["1"]"""), "DATA=END").mkString("\n"))
    intercept[BuildError](Pipeline.run(spark, Seq(
      s"dbdumpread:in=$d/bad.dump", "csvwrite", s"filewrite:out=$d/x.csv")))
  }

  test("orcread/orcwrite modules round-trip") {
    val d = tmp("orc")
    writeCsv(s"$d/in.csv", "a,b", "1,x", "2,y")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1", s"orcwrite:out=$d/t.orc"))
    Pipeline.run(spark, Seq(
      s"orcread:in=$d/t.orc", "csvwrite", s"filewrite:out=$d/back.csv"))
    assert(readOut(s"$d/back.csv").sorted == Seq("1,x", "2,y", "a,b"))
  }

  test("select and limit and union modules") {
    val d = tmp("sel")
    writeCsv(s"$d/in.csv", "a,b", "1,x", "2,y", "3,z")
    val out = s"$d/out.csv"
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv:out=r1", "csvread:in=r1:infer=1:out=rows",
      "select:in=rows:exprs=a;a*10 as a10:out=sel1",
      "limit:in=sel1:n=2:out=lim1",
      "union:in=lim1:with=lim1:out=u1",
      "agg:in=u1:exprs=count(*) as n;sum(a10) as s:out=res",
      "csvwrite:in=res", s"filewrite:out=$out"))
    assert(readOut(out) == Seq("n,s", "4,60"))
  }

  test("unknown module args are rejected with the accepted list") {
    val d = tmp("argcheck")
    writeCsv(s"$d/in.csv", "a", "1")
    val e = intercept[BuildError](Pipeline.build(spark,
      Seq(s"fileread:in=$d/in.csv:out=s", "csvread:in=s:seq=|:out=r",
          "csvwrite:in=r:out=t", s"filewrite:in=t:out=$d/y")))
    assert(e.getMessage.contains("seq"), e.getMessage)
    assert(e.getMessage.contains("sep"), e.getMessage)
  }

  test("reference-compat args accepted: gzip level, csvread eol, xml root") {
    val d = tmp("compat")
    writeCsv(s"$d/in.csv", "a", "1")
    // none of these throw unknown-arg
    Pipeline.build(spark, Seq(
      s"fileread:in=$d/in.csv", "gzip:level=9", s"filewrite:out=$d/o1"))
    Pipeline.build(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:eol=\n:out=r1",
      "csvwrite:in=r1", s"filewrite:out=$d/o2"))
  }

  test("fixedwidth modules round-trip with header through raw streams") {
    val d = tmp("fwmod")
    writeCsv(s"$d/in.csv", "k,v", "1,abc", "2,de")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread",
      "fixedwidthwrite:width=4,6:header=1",
      s"filewrite:out=$d/fw.txt"))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/fw.txt", "fixedwidthread:width=4,6:header=1",
      "sort:by=k", "csvwrite", s"filewrite:out=$d/back.csv"))
    assert(readOut(s"$d/back.csv") == Seq("k,v", "1,abc", "2,de"))
  }

  test("jsonread/jsonwrite and ndjsonread modules round-trip") {
    val d = tmp("jsonmod")
    writeCsv(s"$d/in.csv", "a,b", "1,x", "2,y")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread", "jsonwrite",
      s"filewrite:out=$d/doc.json"))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/doc.json", "jsonread", "ndjsonwrite",
      s"filewrite:out=$d/nd.json"))
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/nd.json", "ndjsonread", "sort:by=a",
      "csvwrite", s"filewrite:out=$d/back.csv"))
    assert(readOut(s"$d/back.csv") == Seq("a,b", "1,x", "2,y"))
  }

  test("xmlread module reads xmlwrite-sink output") {
    import org.apache.spark.sql.functions._
    val d = tmp("xmlmod")
    graft.sinks.Sinks.xml(
      Tables(spark, TestSpark.sf, "region"), s"$d/region_xml")
    val r = Pipeline.run(spark, Seq(
      s"xmlread:in=$d/region_xml", "sort:by=r_regionkey",
      "csvwrite", s"filewrite:out=$d/back.csv"))
    assert(readOut(s"$d/back.csv").length == 6) // header + 5 regions
  }
}
