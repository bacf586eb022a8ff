package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Gopher/MassiveText repetition statistics (q245).
  *
  * The original formulation (TextFunctions.repetitionStatsHof, kept as
  * the semantic reference) computes the n-gram stats with interpreted
  * `aggregate`/`filter` higher-order functions: for every DISTINCT
  * n-gram the lambda re-evaluates the full n-gram array expression,
  * and inside it every `element_at(words, i+o)` re-evaluates `words`
  * — i.e. re-splits the whole document. That is
  * O(distinct · occurrences · doc_len) with interpreted-eval constants
  * (HOFs never enter codegen): measured ~250 s for 500 docs at sf0.01
  * and a single sf0.1 execution past 8.5 min on ONE task — it timed
  * out the entire round-15 bench artifact. Same disease and same cure
  * as round 1's wordNgrams kernel (31.3 s → 2.5 s).
  *
  * This kernel computes the whole battery in ONE imperative pass per
  * document — O(doc_len · n) time, one tokenize, open-addressing-free
  * java.util.HashMap counts — and is called from both the interpreted
  * `eval` and the generated code of [[RepetitionStatsExpr]], so the
  * battery stays inside whole-stage codegen and rides the scan with
  * zero shuffles. Reference stats: Rae et al. 2021 (Gopher) Table A1;
  * the same battery runs in the FineWeb/Dolma curation pipelines.
  *
  * Output struct fields (all exact integers; gate with integer
  * cross-multiplies, never floats):
  *  - `n_lines` / `dup_lines`: non-empty '\n'-lines; occurrences
  *    beyond the first of each repeated line
  *  - `line_chars` / `dup_line_chars`: total line characters; the
  *    share belonging to those repeat occurrences
  *  - `gram_den`: characters of the single-space-joined token stream
  *    (tokens split on space OR newline) — the shared denominator
  *  - `top2_num` / `top3_num`: count·length character mass of the
  *    MOST FREQUENT word 2-/3-gram (ties to the binary-smallest gram)
  *  - `dup5_chars`: Σ (count−1)·length over repeated 5-grams — the
  *    UNBOUNDED upper-bound surrogate of the duplicate-n-gram mass
  *    (overlapping occurrences double-count characters, so this can
  *    exceed `gram_den`; kept because it needs no position state and
  *    its oracle replay is a plain GROUP BY)
  *  - `dup5_masked`: the PUBLISHED Gopher metric — characters covered
  *    by the UNION of repeated-5-gram occurrence spans over the joined
  *    token stream; bounded by `gram_den`, so the 0.15 gate has the
  *    paper's semantics (Rae 2021 A1.1 "fraction of characters in
  *    duplicate n-grams" masks positions; Dolma implements the same).
  *
  * All character counts are Unicode codepoints (Spark `length()` /
  * DuckDB `length()` semantics), counted from UTF-8 lead bytes.
  */
object RepetitionKernel {

  val schema: StructType = StructType(Seq(
    "n_lines", "dup_lines", "line_chars", "dup_line_chars",
    "gram_den", "top2_num", "top3_num", "dup5_chars", "dup5_masked")
    .map(StructField(_, LongType, nullable = false)))

  val fieldNames: Seq[String] = schema.fields.map(_.name).toSeq

  private final val NL: Byte = '\n'.toByte
  private final val SP: Byte = ' '.toByte

  /** Unicode codepoints in bytes[s, e): count non-continuation bytes
    * (0x20 and 0x0A never occur inside a multi-byte UTF-8 sequence, so
    * token slices are always whole-codepoint aligned).
    */
  private def codepoints(bytes: Array[Byte], s: Int, e: Int): Int = {
    var i = s
    var c = 0
    while (i < e) { if ((bytes(i) & 0xc0) != 0x80) c += 1; i += 1 }
    c
  }

  private def bump(m: JHashMap[UTF8String, Array[Int]], k: UTF8String): Unit = {
    val cell = m.get(k)
    if (cell == null) m.put(k, Array(1)) else cell(0) += 1
  }

  def repetitionStats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val nb = bytes.length

    // ---- lines: split on '\n', drop empties, count repeats ----------
    var nLines = 0L
    var lineChars = 0L
    val lineCounts = new JHashMap[UTF8String, Array[Int]]()
    var s = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == NL) {
        if (i > s) {
          val line = UTF8String.fromBytes(bytes, s, i - s)
          nLines += 1
          lineChars += line.numChars()
          bump(lineCounts, line)
        }
        s = i + 1
      }
      i += 1
    }
    var dupLines = 0L
    var dupLineChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      val c = e.getValue()(0)
      if (c > 1) {
        dupLines += c - 1
        dupLineChars += (c - 1).toLong * e.getKey.numChars()
      }
    }

    // ---- tokens: split on ' ' OR '\n', drop empties ------------------
    var cap = 16
    var ws = new Array[Int](cap) // byte start of token t
    var we = new Array[Int](cap) // byte end (exclusive)
    var nw = 0
    s = 0
    i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == SP || bytes(i) == NL) {
        if (i > s) {
          if (nw == cap) {
            cap *= 2
            ws = java.util.Arrays.copyOf(ws, cap)
            we = java.util.Arrays.copyOf(we, cap)
          }
          ws(nw) = s
          we(nw) = i
          nw += 1
        }
        s = i + 1
      }
      i += 1
    }
    // woff(t) = characters before token t in the single-space-joined
    // stream; woff(nw) = total joined chars + 1 ⇒ gram_den = woff(nw)−1.
    val woff = new Array[Long](nw + 1)
    var t = 0
    while (t < nw) {
      woff(t + 1) = woff(t) + codepoints(bytes, ws(t), we(t)) + 1
      t += 1
    }
    val gramDen = if (nw > 0) woff(nw) - 1 else 0L

    // ---- n-grams: materialize once, hash-map counts -------------------
    // A gram is the n tokens joined by single spaces — NOT a contiguous
    // slice of the original text (runs of separators collapse), so the
    // gram string is built by copy. O(doc bytes · n) total.
    def gram(tok: Int, n: Int): UTF8String = {
      var blen = n - 1
      var k = 0
      while (k < n) { blen += we(tok + k) - ws(tok + k); k += 1 }
      val out = new Array[Byte](blen)
      var p = 0
      k = 0
      while (k < n) {
        if (k > 0) { out(p) = SP; p += 1 }
        val l = we(tok + k) - ws(tok + k)
        System.arraycopy(bytes, ws(tok + k), out, p, l)
        p += l
        k += 1
      }
      UTF8String.fromBytes(out)
    }
    def topMass(n: Int): Long = {
      val m = new JHashMap[UTF8String, Array[Int]]()
      var g = 0
      while (g + n <= nw) { bump(m, gram(g, n)); g += 1 }
      var bestC = 0L
      var bestG: UTF8String = null
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0).toLong
        if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
          bestC = c
          bestG = e.getKey
        }
      }
      if (bestG == null) 0L else bestC * bestG.numChars()
    }
    val top2 = topMass(2)
    val top3 = topMass(3)

    // 5-grams: keep the occurrence sequence for the masked pass.
    val n5 = math.max(0, nw - 4)
    val grams5 = new Array[UTF8String](n5)
    val m5 = new JHashMap[UTF8String, Array[Int]]()
    var g = 0
    while (g < n5) {
      grams5(g) = gram(g, 5)
      bump(m5, grams5(g))
      g += 1
    }
    var dup5 = 0L
    val it5 = m5.entrySet().iterator()
    while (it5.hasNext) {
      val e = it5.next()
      val c = e.getValue()(0)
      if (c > 1) dup5 += (c - 1).toLong * e.getKey.numChars()
    }
    // Masked mass: union of repeated-gram occurrence spans over the
    // joined stream. Occurrences arrive in ascending start order, so a
    // running exclusive-end merges intervals in one pass.
    var masked = 0L
    var curEnd = 0L
    g = 0
    while (g < n5) {
      if (m5.get(grams5(g))(0) > 1) {
        val st = woff(g)
        val en = st + (woff(g + 5) - woff(g) - 1) // gram codepoints
        if (en > curEnd) {
          masked += en - math.max(st, curEnd)
          curEnd = en
        }
      }
      g += 1
    }

    new GenericInternalRow(Array[Any](
      nLines, dupLines, lineChars, dupLineChars,
      gramDen, top2, top3, dup5, masked))
  }
}

/** Struct of the nine repetition stats, computed in one codegen'd pass
  * per document (see [[RepetitionKernel]]).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionKernel.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    RepetitionKernel.repetitionStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionKernel.repetitionStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionExpr {
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text)))
}
