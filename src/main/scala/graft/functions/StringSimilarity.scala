package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity expressions for record linkage / entity
  * resolution.
  *
  * The reference engine (rorabr/dbitool) moves rows between DBI
  * sources and sinks but has no fuzzy-matching surface at all; linking
  * near-duplicate entities across feeds is exactly the kind of
  * downstream task its TODO list leaves to SQL. Here it is a
  * first-class scan-speed kernel: a Catalyst expression with
  * `doGenCode` dispatching to a static JVM kernel, so a blocked
  * pair-scoring join stays inside whole-stage codegen (no UDF
  * serialization, no interpreted fallback).
  *
  * Semantics are pinned to the classic Jaro-Winkler definition —
  * match window `max(|a|,|b|)/2 - 1`, half-counted transpositions,
  * Winkler prefix boost (scale 0.1, prefix cap 4) applied only when
  * jaro > 0.7, and `0.0` when either side is empty — which is also
  * what DuckDB's `jaro_winkler_similarity` computes: the spec pins
  * bit-identical doubles against the oracle over randomized inputs.
  * Comparison is over UTF-16 code units (identical to code points for
  * all BMP text; the fixtures are ASCII).
  */
object StringSimilarityKernels {

  /** Jaro similarity; operation order mirrors the canonical
    * formulation `(m/|a| + m/|b| + (m-t)/m) / 3` so the resulting
    * doubles are reproducible bit-for-bit across engines.
    */
  def jaro(sa: String, sb: String): Double = {
    val l1 = sa.length; val l2 = sb.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (sa == sb) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = sa.charAt(i)
      var j = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && sb.charAt(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (sa.charAt(i) != sb.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (matches.toDouble / l1 + matches.toDouble / l2 +
      (matches - t).toDouble / matches) / 3.0
  }

  /** Jaro-Winkler: prefix boost `j + l*0.1*(1-j)` (l = common prefix
    * capped at 4) applied only above the classic 0.7 boost threshold.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString; val sb = b.toString
    val j = jaro(sa, sb)
    if (j > 0.7) {
      val n = math.min(4, math.min(sa.length, sb.length))
      var l = 0
      while (l < n && sa.charAt(l) == sb.charAt(l)) l += 1
      j + l * 0.1 * (1 - j)
    } else j
  }

  /** Unicode NFC canonical composition (combining sequences →
    * precomposed forms) — the normalize-before-hash step of a text
    * dedup pipeline; without it, byte-level dedup misses visually
    * identical strings. Both the JDK and DuckDB's `nfc_normalize`
    * implement UAX #15, so outputs agree byte-for-byte.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: Normalizer.isNormalized is O(n) with no allocation —
    // on the (overwhelmingly common) already-NFC corpus the kernel
    // never materializes a second string.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** jaro_winkler(a, b): DoubleType, null if either input is null. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects string inputs, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarityKernels.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarityKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** nfc_normalize(s): StringType, identity on already-normalized text. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    StringSimilarityKernels.nfcNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StringSimilarityKernels.nfcNormalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringSimilarity {
  /** Column-API entry points (codegen'd). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(s)))
}
