package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML main-content extraction (q249, `htmlextract`
  * module) — the crawl-pipeline stage between "raw fetched page" and
  * "text the curation operators can score": boilerplate removal in the
  * trafilatura/jusText tradition (Pomikalek 2011: block segmentation +
  * link-density/length heuristics), reduced to a deterministic,
  * oracle-replayable core.
  *
  * Semantics (each step mirrors a DuckDB regex/list expression so the
  * whole extraction replays hash-exactly — the q249 oracle IS this
  * spec):
  *  1. `title`: first `(?is)<title\b[^>]*>(.*?)</title\s*>` capture of
  *     the RAW html, tag-stripped, entity-decoded, whitespace-collapsed.
  *  2. Drop `(?is)<script\b[^>]*>.*?</script\s*>`, then the same for
  *     `<style>`, then `(?s)<!--.*?-->` comments.
  *  3. Split what remains into blocks at every block-level tag
  *     (open or close): p div h1-h6 li ul ol nav header footer article
  *     section blockquote br tr td th table body html head title —
  *     `(?i)</?(NAME)\b[^>]*>` boundaries, segments kept in order.
  *  4. Per block: strip remaining (inline) tags `(?s)<[^>]*>`, decode
  *     the six standard entities (&nbsp; &lt; &gt; &quot; &#39; &amp;
  *     — sequential replaces in that order, &amp; LAST), then
  *      - `text_chars` = non-whitespace codepoints ([ \t\r\n] excluded)
  *      - `link_chars` = same count over the anchor bodies
  *        `(?is)<a\b[^>]*>(.*?)</a\s*>` of the block (tag-stripped,
  *        decoded the same way).
  *  5. A block is MAIN CONTENT iff `text_chars >= minChars` and
  *     `link_chars * linkDen < text_chars` (integer cross-multiply —
  *     link density below 1/linkDen, the jusText gate).
  *  6. `main_text` = kept blocks' collapsed text joined by '\n'
  *     (collapse = runs of [ \t\r\n] to one space, trimmed).
  *
  * The whole battery is ONE imperative pass per page, called from both
  * interpreted eval and generated code, so extraction rides the scan
  * inside whole-stage codegen with zero shuffles — the same posture as
  * [[RepetitionKernel]]. O(page bytes) time; no backtracking regex
  * anywhere, so adversarial crawl HTML can't blow a task.
  *
  * Reference posture: dbitool has no HTML stage (text arrives
  * pre-extracted, dbitool.pl:2236-2268 reads structured rows); this is
  * the engine-extension surface for a 100 TB crawl-to-corpus pipeline.
  */
object HtmlKernel {

  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("main_text", StringType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("kept_blocks", LongType, nullable = false),
    StructField("text_chars", LongType, nullable = false),
    StructField("kept_chars", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false)))

  val fieldNames: Seq[String] = schema.fields.map(_.name).toSeq

  /** Block-boundary element names — the jusText/trafilatura block set
    * restricted to names the oracle regex carries.
    */
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "nav", "header", "footer", "article", "section", "blockquote", "br",
      "tr", "td", "th", "table", "body", "html", "head", "title")
      .foreach(s.add)
    s
  }

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** The four characters the oracle's [ \t\r\n] classes name. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** RE2 \s (the `</name\s*>` closers): [\t\n\f\r ]. */
  private def isRe2Ws(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Leftmost `(?is)<NAME\b[^>]*>` at or after `from`:
    * Array(tagStart, afterGt), or null when the pattern cannot match
    * anywhere later (either no such `<NAME` or no '>' after it).
    */
  private def findOpenTag(s: String, name: String, from: Int): Array[Int] = {
    val n = s.length
    val nl = name.length
    var i = from
    while (i < n) {
      if (s.charAt(i) == '<' && i + 1 + nl <= n &&
        s.regionMatches(true, i + 1, name, 0, nl) &&
        (i + 1 + nl == n || !isWord(s.charAt(i + 1 + nl)))) {
        val gt = s.indexOf('>', i + 1 + nl)
        // no '>' anywhere after ⇒ no later candidate can close either
        return if (gt >= 0) Array(i, gt + 1) else null
      }
      i += 1
    }
    null
  }

  /** Leftmost `(?i)</NAME\s*>` at or after `from`:
    * Array(tagStart, afterGt) or null.
    */
  private def findCloseTag(s: String, name: String, from: Int): Array[Int] = {
    val n = s.length
    val nl = name.length
    var i = from
    while (i < n) {
      if (s.charAt(i) == '<' && i + 2 + nl <= n && s.charAt(i + 1) == '/' &&
        s.regionMatches(true, i + 2, name, 0, nl)) {
        var j = i + 2 + nl
        while (j < n && isRe2Ws(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '>') return Array(i, j + 1)
      }
      i += 1
    }
    null
  }

  /** Remove every `(?is)<NAME\b[^>]*>.*?</NAME\s*>` span (lazy body:
    * each open pairs with the FIRST close after it, matches never
    * overlap — the regexp_replace 'g' scan).
    */
  private def stripElement(s: String, name: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (true) {
      val open = findOpenTag(s, name, pos)
      if (open == null) { sb.append(s, pos, s.length); return sb.toString }
      val close = findCloseTag(s, name, open(1))
      if (close == null) { sb.append(s, pos, s.length); return sb.toString }
      sb.append(s, pos, open(0))
      pos = close(1)
    }
    "" // unreachable
  }

  /** Remove every `(?s)<!--.*?-->` comment. */
  private def stripComments(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (true) {
      val o = s.indexOf("<!--", pos)
      if (o < 0) { sb.append(s, pos, s.length); return sb.toString }
      val c = s.indexOf("-->", o + 4)
      if (c < 0) { sb.append(s, pos, s.length); return sb.toString }
      sb.append(s, pos, o)
      pos = c + 3
    }
    "" // unreachable
  }

  /** Split on every `(?i)</?(BLOCK)\b[^>]*>` boundary —
    * regexp_split_to_array semantics: segments between matches, in
    * order, adjacent boundaries yielding empty segments.
    */
  private def splitBlocks(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val n = s.length
    var segStart = 0
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        var j = i + 1
        if (j < n && s.charAt(j) == '/') j += 1
        val ns = j
        while (j < n && isAlnum(s.charAt(j))) j += 1
        val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
        if (name.nonEmpty && BlockTags.contains(name) &&
          (j == n || !isWord(s.charAt(j)))) {
          val gt = s.indexOf('>', j)
          if (gt >= 0) {
            out.add(s.substring(segStart, i))
            segStart = gt + 1
            i = gt + 1
          } else i += 1
        } else i += 1
      } else i += 1
    }
    out.add(s.substring(segStart))
    out
  }

  /** Remove every `(?s)<[^>]*>` inline tag; a '<' with no later '>'
    * stays literal text (the regex leaves it unmatched).
    */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) i = gt + 1
        else { sb.append(s, i, n); return sb.toString }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The six standard entities as SEQUENTIAL whole-string replaces —
    * &amp; last, so "&amp;lt;" decodes to the literal "&lt;" exactly as
    * the oracle's nested replace() chain does.
    */
  private def decode(s: String): String =
    s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  /** Codepoints outside [ \t\r\n]. */
  private def nonWsChars(s: String): Long = {
    var i = 0
    var c = 0L
    val n = s.length
    while (i < n) {
      val ch = s.charAt(i)
      if (!isWs(ch)) {
        c += 1
        if (Character.isHighSurrogate(ch) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) i += 1
      }
      i += 1
    }
    c
  }

  /** Collapse [ \t\r\n] runs to one space and trim both ends. */
  private def cleanText(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pending = false
    var i = 0
    val n = s.length
    while (i < n) {
      val ch = s.charAt(i)
      if (isWs(ch)) { if (sb.length > 0) pending = true }
      else {
        if (pending) { sb.append(' '); pending = false }
        sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** All `(?is)<a\b[^>]*>(.*?)</a\s*>` capture bodies of a block. */
  private def anchorBodies(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var pos = 0
    var continue = true
    while (continue) {
      val open = findOpenTag(s, "a", pos)
      if (open == null) continue = false
      else {
        val close = findCloseTag(s, "a", open(1))
        if (close == null) continue = false
        else {
          out.add(s.substring(open(1), close(0)))
          pos = close(1)
        }
      }
    }
    out
  }

  /** All outlink targets of a page, in document order — the first
    * double-quoted href of each anchor tag, per the RE2 contract
    * `(?is)<a\b[^>]*?href="([^"]*)"` (one match per `<a` occurrence;
    * anchors whose tag carries no double-quoted href yield nothing).
    * The crawl-frontier extraction: pages → outlinks → host graph.
    */
  def anchorHrefs(html0: UTF8String): ArrayData = {
    val html = html0.toString
    val out = new java.util.ArrayList[UTF8String]()
    val n = html.length
    var pos = 0
    var scanning = true
    while (scanning) {
      // leftmost '<a\b' at or after pos
      var i = pos
      var found = -1
      while (found < 0 && i < n) {
        if (html.charAt(i) == '<' && i + 1 < n &&
          (html.charAt(i + 1) == 'a' || html.charAt(i + 1) == 'A') &&
          (i + 2 == n || !isWord(html.charAt(i + 2)))) found = i
        else i += 1
      }
      if (found < 0) scanning = false
      else {
        // lazy [^>]*? then href=" — first case-insensitive href=" in
        // the tag (no '>' may intervene)
        var j = found + 2
        var hit = -1
        while (hit < 0 && j + 6 <= n && html.charAt(j) != '>') {
          if (html.regionMatches(true, j, "href=\"", 0, 6)) hit = j + 6
          else j += 1
        }
        if (hit < 0) pos = found + 2
        else {
          val end = html.indexOf('"', hit)
          if (end < 0) { pos = found + 2 } // unterminated: no match here
          else {
            out.add(UTF8String.fromString(html.substring(hit, end)))
            pos = end + 1
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def htmlExtract(html0: UTF8String, minChars: Int, linkDen: Int): InternalRow = {
    val html = html0.toString

    val title = {
      val open = findOpenTag(html, "title", 0)
      if (open == null) ""
      else {
        val close = findCloseTag(html, "title", open(1))
        if (close == null) ""
        else cleanText(decode(stripTags(html.substring(open(1), close(0)))))
      }
    }

    val stripped = stripComments(
      stripElement(stripElement(html, "script"), "style"))
    val blocks = splitBlocks(stripped)

    var nBlocks = 0L
    var keptBlocks = 0L
    var textChars = 0L
    var keptChars = 0L
    var linkChars = 0L
    val main = new java.lang.StringBuilder()
    var bi = 0
    while (bi < blocks.size()) {
      val b = blocks.get(bi)
      val txt = decode(stripTags(b))
      val tc = nonWsChars(txt)
      var lc = 0L
      val as = anchorBodies(b)
      var ai = 0
      while (ai < as.size()) {
        lc += nonWsChars(decode(stripTags(as.get(ai))))
        ai += 1
      }
      if (tc > 0) { nBlocks += 1; textChars += tc }
      linkChars += lc
      if (tc >= minChars && lc * linkDen < tc) {
        keptBlocks += 1
        keptChars += tc
        if (main.length > 0) main.append('\n')
        main.append(cleanText(txt))
      }
      bi += 1
    }

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(title), UTF8String.fromString(main.toString),
      nBlocks, keptBlocks, textChars, keptChars, linkChars))
  }
}

/** Struct of the seven extraction outputs, computed in one codegen'd
  * pass per page (see [[HtmlKernel]]).
  */
case class HtmlExtractExpr(child: Expression, minChars: Int, linkDen: Int)
    extends UnaryExpression {
  override def dataType: DataType = HtmlKernel.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    HtmlKernel.htmlExtract(t.asInstanceOf[UTF8String], minChars, linkDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlKernel.htmlExtract(" +
        s"$c, $minChars, $linkDen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Outlink targets of a page in document order (see
  * [[HtmlKernel.anchorHrefs]]).
  */
case class AnchorHrefsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    HtmlKernel.anchorHrefs(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlKernel.anchorHrefs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlExpr {
  /** jusText-defaults: blocks of ≥ minChars non-whitespace codepoints
    * whose link density is below 1/linkDen survive as main content.
    */
  def htmlExtract(html: Column, minChars: Int = 25, linkDen: Int = 3): Column =
    ColumnBridge.column(
      HtmlExtractExpr(ColumnBridge.expression(html), minChars, linkDen))

  /** Outlink targets (first double-quoted href per anchor, in order). */
  def anchorHrefs(html: Column): Column =
    ColumnBridge.column(AnchorHrefsExpr(ColumnBridge.expression(html)))
}
