package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass adjacent-bigram / token COUNTING for the LM family
  * (q234/q235/q236/q241/q243/q246; VERDICT r16 #3).
  *
  * The original generators explode one row per token POSITION —
  * `posexplode(sequence(1, n-1))` + two `element_at` lookups per row —
  * so a doc of n tokens costs n-1 generated rows carrying the token
  * array, each paying O(log n)… no, O(1) array reads but full
  * row-materialization; in `ngramMode = "char"` n is the CODEPOINT
  * length of the document, and q236 spent its whole 5 s sf0.1 floor
  * inside that generator. This kernel folds the explode and the
  * first count-aggregation into ONE imperative pass per document:
  * tokenize once over the UTF-8 bytes, hash-count adjacent pairs, and
  * emit one (w1, w2, c) row per DISTINCT pair — output is bounded by
  * the doc's distinct-bigram count, not its length, and for the
  * repetitive char-mode case (alphabet² pairs max) it is dramatically
  * smaller. Same disease and same cure as RepetitionKernel (q245).
  *
  * Downstream exactness is preserved without touching the oracles:
  * every occurrence of the same bigram in the same doc scores the
  * SAME log-probability (it depends only on the count tables), so
  * Σ_occurrences quantize(logp) == Σ_distinct c · quantize(logp) —
  * the per-pair product is decimal(18,12) × decimal(19,0) →
  * decimal(38,12), exact (no precision adjustment at 38, |ln| < 745
  * so 26 integer digits never overflow), and quantizing to scale 12
  * at precision 18 rounds identically to the old precision-30 cast.
  *
  * Tokenization parity (pinned byte-for-byte by NgramKernelSpec
  * against the HOF/explode formulation):
  *  - `charMode = false`: split on U+0020 ONLY, drop empty tokens —
  *    exactly `filter(split(text, " "), t => t =!= "")`.
  *  - `charMode = true`: one token per Unicode CODEPOINT, spaces
  *    included — exactly the CodepointSplit regex (UTF-8 lead-byte
  *    boundaries are codepoint boundaries, surrogate pairs are one
  *    4-byte sequence; ADVICE r15's non-BMP contract holds for free).
  *
  * Output order is canonical (binary-ascending keys) so the
  * expression is deterministic; downstream aggregation is
  * order-insensitive anyway. Output strings are fresh copies — token
  * slices during counting may view a codegen-owned buffer, nothing
  * escaping eval does.
  */
object NgramCountKernel {

  val pairType: ArrayType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  /** Fused unigram + bigram rows: w2 IS NULL marks a unigram count.
    * One kernel pass trains BOTH LM count tables — at 100 TB the
    * training corpus is scanned once, not twice (bigrams) plus once
    * (unigrams).
    */
  val gramType: ArrayType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = true),
    StructField("c", LongType, nullable = false))), containsNull = false)

  private final val SP: Byte = ' '.toByte

  /** Parity shim for MALFORMED UTF-8 (ADVICE r17): the regex/HOF
    * formulations this kernel replaces run java.util.regex over
    * `UTF8String.toString`, whose decoder substitutes U+FFFD for every
    * malformed sequence — while the byte-level tokenizers below would
    * split the RAW invalid bytes differently (warcread's binary→string
    * cast ships such payloads verbatim). Route invalid input through
    * the IDENTICAL toString decode so both paths see the same tokens;
    * valid input (the isValid fast scan) passes through untouched, so
    * the byte-parity contract is unconditional, not well-formed-only.
    */
  private def normalized(text: UTF8String): UTF8String =
    if (text.isValid) text else UTF8String.fromString(text.toString)

  /** Token slices (views over `bytes`) per the mode's contract. */
  private def tokenize(bytes: Array[Byte], charMode: Boolean): Array[UTF8String] = {
    val nb = bytes.length
    if (charMode) {
      if (nb == 0) return new Array[UTF8String](0)
      // count EXACTLY the boundaries the emit loop below hits: one
      // token per non-continuation byte at positions 1..nb-1, plus
      // the final i == nb flush. Counting lead bytes from position 0
      // would UNDERCOUNT by one when the input starts with a
      // malformed continuation byte (raw crawl payloads reach this
      // via warcread's binary→string cast) and overflow `out`.
      var n = 1
      var i = 1
      while (i < nb) { if ((bytes(i) & 0xc0) != 0x80) n += 1; i += 1 }
      val out = new Array[UTF8String](n)
      var t = 0
      var s = 0
      i = 1
      while (i <= nb) {
        if (i == nb || (bytes(i) & 0xc0) != 0x80) {
          out(t) = UTF8String.fromBytes(bytes, s, i - s)
          t += 1
          s = i
        }
        i += 1
      }
      out
    } else {
      var cap = 16
      var out = new Array[UTF8String](cap)
      var nw = 0
      var s = 0
      var i = 0
      while (i <= nb) {
        if (i == nb || bytes(i) == SP) {
          if (i > s) {
            if (nw == cap) {
              cap *= 2
              out = java.util.Arrays.copyOf(out, cap)
            }
            out(nw) = UTF8String.fromBytes(bytes, s, i - s)
            nw += 1
          }
          s = i + 1
        }
        i += 1
      }
      java.util.Arrays.copyOf(out, nw)
    }
  }

  /** Fresh-copy a (possibly buffer-view) UTF8String for escape. */
  private def owned(s: UTF8String): UTF8String = {
    val b = s.getBytes
    UTF8String.fromBytes(java.util.Arrays.copyOf(b, b.length))
  }

  private final class PairKey(val a: UTF8String, val b: UTF8String) {
    override val hashCode: Int = 31 * a.hashCode + b.hashCode
    override def equals(o: Any): Boolean = o match {
      case p: PairKey => a.equals(p.a) && b.equals(p.b)
      case _          => false
    }
  }

  /** One (w1, w2, c) row per distinct adjacent token pair, ascending
    * binary (w1, w2); empty array when the doc has < 2 tokens.
    */
  def bigramCounts(text: UTF8String, charMode: Boolean): ArrayData = {
    val tk = tokenize(normalized(text).getBytes, charMode)
    val nw = tk.length
    if (nw < 2) return new GenericArrayData(Array.empty[Any])
    val m = new JHashMap[PairKey, Array[Long]]()
    var i = 0
    while (i < nw - 1) {
      val k = new PairKey(tk(i), tk(i + 1))
      val cell = m.get(k)
      if (cell == null) m.put(k, Array(1L)) else cell(0) += 1L
      i += 1
    }
    val keys = new Array[PairKey](m.size())
    val kit = m.keySet().iterator()
    i = 0
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys, new java.util.Comparator[PairKey] {
      def compare(x: PairKey, y: PairKey): Int = {
        val c = x.a.compareTo(y.a)
        if (c != 0) c else x.b.compareTo(y.b)
      }
    })
    val rows = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      val k = keys(i)
      rows(i) = new GenericInternalRow(
        Array[Any](owned(k.a), owned(k.b), m.get(k)(0)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Fused distinct-token AND distinct-bigram counts in ONE pass:
    * unigram rows (w, null, c) over EVERY token (no min-token gate —
    * the unigram table counts 1-token docs too), then pair rows
    * (w1, w2, c) when the doc has ≥ 2 tokens; each block ascending
    * binary order.
    */
  def gramCounts(text: UTF8String, charMode: Boolean): ArrayData = {
    val tk = tokenize(normalized(text).getBytes, charMode)
    val nw = tk.length
    val mu = new JHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nw) {
      val cell = mu.get(tk(i))
      if (cell == null) mu.put(tk(i), Array(1L)) else cell(0) += 1L
      i += 1
    }
    val mp = new JHashMap[PairKey, Array[Long]]()
    i = 0
    while (i < nw - 1) {
      val k = new PairKey(tk(i), tk(i + 1))
      val cell = mp.get(k)
      if (cell == null) mp.put(k, Array(1L)) else cell(0) += 1L
      i += 1
    }
    val uKeys = new Array[UTF8String](mu.size())
    val uit = mu.keySet().iterator()
    i = 0
    while (uit.hasNext) { uKeys(i) = uit.next(); i += 1 }
    java.util.Arrays.sort(uKeys, new java.util.Comparator[UTF8String] {
      def compare(x: UTF8String, y: UTF8String): Int = x.compareTo(y)
    })
    val pKeys = new Array[PairKey](mp.size())
    val pit = mp.keySet().iterator()
    i = 0
    while (pit.hasNext) { pKeys(i) = pit.next(); i += 1 }
    java.util.Arrays.sort(pKeys, new java.util.Comparator[PairKey] {
      def compare(x: PairKey, y: PairKey): Int = {
        val c = x.a.compareTo(y.a)
        if (c != 0) c else x.b.compareTo(y.b)
      }
    })
    val rows = new Array[Any](uKeys.length + pKeys.length)
    i = 0
    while (i < uKeys.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](owned(uKeys(i)), null, mu.get(uKeys(i))(0)))
      i += 1
    }
    var j = 0
    while (j < pKeys.length) {
      val k = pKeys(j)
      rows(i + j) = new GenericInternalRow(
        Array[Any](owned(k.a), owned(k.b), mp.get(k)(0)))
      j += 1
    }
    new GenericArrayData(rows)
  }
}

/** array<struct<w1,w2,c>> of distinct adjacent-bigram counts (see
  * [[NgramCountKernel.bigramCounts]]).
  */
case class BigramCountsExpr(child: Expression, charMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = NgramCountKernel.pairType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    NgramCountKernel.bigramCounts(t.asInstanceOf[UTF8String], charMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramCountKernel.bigramCounts($c, $charMode);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<struct<w1,w2,c>> of fused unigram (w2 IS NULL) + bigram
  * counts (see [[NgramCountKernel.gramCounts]]).
  */
case class GramCountsExpr(child: Expression, charMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = NgramCountKernel.gramType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    NgramCountKernel.gramCounts(t.asInstanceOf[UTF8String], charMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramCountKernel.gramCounts($c, $charMode);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramCountExpr {
  def bigramCounts(text: Column, ngramMode: String): Column =
    ColumnBridge.column(
      BigramCountsExpr(ColumnBridge.expression(text), ngramMode == "char"))

  def gramCounts(text: Column, ngramMode: String): Column =
    ColumnBridge.column(
      GramCountsExpr(ColumnBridge.expression(text), ngramMode == "char"))
}
