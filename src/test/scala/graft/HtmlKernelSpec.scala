package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** The single-pass HTML extraction kernel (HtmlKernel) is hand-rolled
  * scanning code whose CONTRACT is a set of RE2 regexes (the q249
  * oracle). This spec pins the kernel against an INDEPENDENT
  * java.util.regex implementation of the same contract — on hostile
  * hand-picked pages (unterminated tags, nested anchors, case games,
  * entity corner cases) and on fuzzed tag soup — so the scanner can
  * never silently drift from the regex spec the oracle replays.
  */
class HtmlKernelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- independent reference: java.util.regex over String ------------
  private val ScriptPat =
    "(?is)<script\\b[^>]*>.*?</script\\s*>".r
  private val StylePat =
    "(?is)<style\\b[^>]*>.*?</style\\s*>".r
  private val CommentPat = "(?s)<!--.*?-->".r
  private val BlockPat =
    ("(?i)</?(p|div|h[1-6]|li|ul|ol|nav|header|footer|article|section|" +
      "blockquote|br|tr|td|th|table|body|html|head|title)\\b[^>]*>").r
  private val TagPat = "(?s)<[^>]*>".r
  private val AnchorPat = "(?is)<a\\b[^>]*>(.*?)</a\\s*>".r
  private val TitlePat = "(?is)<title\\b[^>]*>(.*?)</title\\s*>".r

  private def refStrip(s: String) = TagPat.replaceAllIn(s, "")
  private def refDecode(s: String) =
    s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
  private def refTxt(s: String) = refDecode(refStrip(s))
  private def refNonWs(s: String) =
    s.codePoints().filter(c =>
      c != ' ' && c != '\t' && c != '\r' && c != '\n').count()
  private def refClean(s: String) =
    s.replaceAll("[ \\t\\r\\n]+", " ")
      .replaceAll("^ +| +$", "") // trim the collapsed single spaces
  private def refExtract(html: String, minChars: Int, linkDen: Int): Row = {
    val title = TitlePat.findFirstMatchIn(html)
      .map(m => refClean(refTxt(m.group(1)))).getOrElse("")
    val pre = CommentPat.replaceAllIn(
      StylePat.replaceAllIn(ScriptPat.replaceAllIn(html, ""), ""), "")
    val blocks = BlockPat.split(pre) match {
      // java.util.regex drops trailing empties; RE2 split keeps them —
      // counts only involve non-empty text so padding with "" is exact
      case bs => bs.toSeq
    }
    var nBlocks = 0L; var kept = 0L
    var tc = 0L; var kc = 0L; var lc = 0L
    val main = new StringBuilder
    for (b <- blocks) {
      val t = refTxt(b)
      val n = refNonWs(t)
      val l = AnchorPat.findAllMatchIn(b)
        .map(m => refNonWs(refTxt(m.group(1)))).sum
      if (n > 0) { nBlocks += 1; tc += n }
      lc += l
      if (n >= minChars && l * linkDen < n) {
        kept += 1; kc += n
        if (main.nonEmpty) main.append('\n')
        main.append(refClean(t))
      }
    }
    Row(title, main.toString, nBlocks, kept, tc, kc, lc)
  }

  private val hostile = Seq(
    "",
    "no tags at all just text that is long enough to pass the gate ok",
    "<p>short</p>",
    "<P CLASS='x'>upper case block tags with attributes kept working</P>",
    "<p>unterminated <b>inline tag stays <p>second block starts anyway",
    "<p>a literal 3 < 5 comparison survives as text in this block</p>",
    "<script>var x = '<p>not a block</p>';</script><p>after script " +
      "the real paragraph content continues long enough</p>",
    "<script>never closed <p>swallowed? no: unmatched script stays",
    "<style a=b>.x{}</style><p>styled page body text long enough here</p>",
    "<!-- <p>commented out</p> --><p>visible paragraph text long " +
      "enough to keep</p>",
    "<div><a href='/'>pure link block</a></div>",
    "<div>mixed block where the text around <a href='/x'>a small " +
      "link</a> dominates the character count clearly</div>",
    "<p>&lt;tag&gt; &amp;amp; &quot;quoted&quot; &#39;s &nbsp; entity " +
      "battery block long enough to keep</p>",
    "<p>unknown &copy; entity stays literal in this long enough " +
      "block of text</p>",
    "<a href='x'>anchor never closed so it contributes no link mass " +
      "but the text itself is long enough</a and more",
    "<p>nested <a href='1'>outer <a href='2'>inner</a> tail</a> " +
      "anchors resolve first-close like the regex does</p>",
    "<title>the page title</title><p>body text that is long enough " +
      "to be kept as main content here</p>",
    "<TITLE lang=en> spaced   title </TITLE><p>casing and collapse " +
      "inside the title path long enough</p>",
    "<br/><br />self closing breaks split blocks<br>even bare ones",
    "<pre>pre is NOT a block tag so this stays glued to neighbors",
    "<p>multi\nline\ttext   with\r\nweird   whitespace collapses to " +
      "single spaces in the output</p>",
    "<html><head></head><body><p>full page skeleton with one real " +
      "paragraph of body text</p></body></html>",
    "<p>emoji \ud83d\ude00 and 多字节 count as single codepoints in " +
      "the length gate of this block</p>")

  test("kernel == independent java.util.regex reference on hostile pages") {
    val df = hostile.toDF("html")
    for ((minChars, linkDen) <- Seq((25, 3), (10, 2), (1, 100))) {
      val fields = TextFunctions.htmlExtract($"html", minChars, linkDen)
      val got = df.select(fields.map { case (n, c) => c.as(n) }: _*)
        .collect().toSeq
      val want = hostile.map(refExtract(_, minChars, linkDen))
      for (((g, w), i) <- got.zip(want).zipWithIndex)
        assert(g == w, s"minChars=$minChars linkDen=$linkDen page $i:\n" +
          s"  html=${hostile(i)}\n  kernel=$g\n  ref=$w")
    }
  }

  test("kernel == reference on fuzzed tag soup (deterministic seed)") {
    val rnd = new scala.util.Random(249)
    val tags = Seq("p", "div", "span", "a href='/x'", "b", "li", "br",
      "script", "style", "title", "pre", "h2", "q")
    val words = Seq("alpha", "beta", "gamma", "<", ">", "&amp;", "&nbsp;",
      "&bogus;", "delta", "x", "longerwordhere", "\n", "\t", "  ")
    val pages = (1 to 200).map { _ =>
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(40)) {
        rnd.nextInt(4) match {
          case 0 => sb.append('<').append(tags(rnd.nextInt(tags.size)))
            .append('>')
          case 1 => sb.append("</").append(tags(rnd.nextInt(tags.size)))
            .append(if (rnd.nextBoolean()) ">" else " >")
          case 2 => sb.append(words(rnd.nextInt(words.size))).append(' ')
          case _ => sb.append(
            if (rnd.nextBoolean()) "<!-- c -->" else "<!-- open")
        }
      }
      sb.toString
    }
    val got = pages.toDF("html")
      .select(TextFunctions.htmlExtract($"html", 5, 3)
        .map { case (n, c) => c.as(n) }: _*)
      .collect().toSeq
    val want = pages.map(refExtract(_, 5, 3))
    for (((g, w), i) <- got.zip(want).zipWithIndex)
      assert(g == w, s"fuzz page $i:\n  html=${pages(i)}\n" +
        s"  kernel=$g\n  ref=$w")
  }

  test("anchorHrefs == the RE2 contract via java.util.regex on hostile pages") {
    val HrefPat = "(?is)<a\\b[^>]*?href=\"([^\"]*)\"".r
    val pages = hostile ++ Seq(
      "<a href=\"/one\">x</a><a href=\"/two\">y</a>",
      "<a class='z' href=\"/attr-after\">x</a>",
      "<a href='single-quoted-skipped'>x</a>",
      "<a href=\"unterminated", // no closing quote anywhere
      "<a href=\"swallows<p class=\"inner\">tail</a>", // quote spans a tag
      "<A HREF=\"/upper\">x</A>",
      "<abbr href=\"/not-an-anchor\">x</abbr>",
      "<a>no href</a><a href=\"/after-bare\">x</a>",
      "<a data-href=\"/decoy\" href=\"/real\">x</a>")
    val got = pages.toDF("html")
      .select(graft.functions.HtmlExpr.anchorHrefs($"html").as("hs"))
      .collect().map(_.getSeq[String](0).toList)
    val want = pages.map(p => HrefPat.findAllMatchIn(p).map(_.group(1)).toList)
    for (((g, w), i) <- got.zip(want).zipWithIndex)
      assert(g == w, s"page $i: ${pages(i)}\n  kernel=$g\n  ref=$w")
  }

  test("q249 keeps paragraph text and drops the boilerplate on real docs") {
    val out = SparkEntry.queries("q249_html_extract")(spark, sf)
      .limit(200).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val title = r.getAs[String]("title")
      val main = r.getAs[String]("main_text")
      assert(title.endsWith(" docs"), title)
      // boilerplate must never leak into main content
      assert(!main.contains("Home") && !main.contains("privacy") &&
        !main.contains("terms") && !main.contains("report"), main)
      assert(r.getAs[Long]("kept_chars") <= r.getAs[Long]("text_chars"))
      assert(r.getAs[Long]("kept_blocks") <= r.getAs[Long]("n_blocks"))
    }
    // the length+density gate keeps real content: most docs keep ≥1 block
    assert(out.count(_.getAs[Long]("kept_blocks") > 0) > out.length / 2)
  }

  test("htmlextract pipeline module extracts in-stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_html").toFile
    val docs = Tables(spark, sf, "documents").limit(20)
      .select($"doc_id", concat(lit("<title>t</title><nav><a href='/'>" +
        "Home</a></nav><p>"), $"text", lit("</p>")).as("page"))
    docs.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/in.parquet")
    graft.pipeline.Pipeline.run(spark, Seq(
      s"parquetread:in=${dir.getAbsolutePath}/in.parquet:out=raw",
      "htmlextract:in=raw:html=page:out=ex",
      s"parquetwrite:in=ex:out=${dir.getAbsolutePath}/out.parquet"))
    val out = spark.read.parquet(s"${dir.getAbsolutePath}/out.parquet")
    assert(out.columns.toSet == Set("doc_id", "title", "main_text"))
    assert(out.count() == 20)
    assert(out.filter($"main_text".contains("Home")).count() == 0)
  }
}
