package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text kernels shared by the interpreted `eval` and the
  * generated code of the Expressions below.
  *
  * The higher-order-function formulation of word n-grams
  * (`transform(sequence(...), i -> concat_ws(element_at...))`) pays an
  * interpreted lambda per gram plus Catalyst's CollapseProject
  * re-inlining the token split into every element — it dominated the
  * round-1 bench (q44/q50/q51 ≈ 64% of total). These kernels exploit
  * the joiner == splitter identity: a space-joined n-gram over
  * single-space tokens IS a contiguous byte range of the original
  * string (0x20 never occurs inside a UTF-8 multi-byte sequence), so
  * one byte scan finds token boundaries and each gram is a slice —
  * no token array, no per-gram concatenation.
  */
object TextKernels {

  private val SP: Byte = ' '.toByte

  /** Token-start byte offsets with a sentinel: starts(t) is the byte
    * index where token t begins; starts(numTokens) = numBytes + 1 so
    * `end(t) = starts(t+1) - 1` holds uniformly for the last token.
    * Returns null when numTokens < n (caller emits an empty array).
    */
  private def tokenStarts(bytes: Array[Byte], n: Int): Array[Int] = {
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == SP) spaces += 1; i += 1 }
    val numTokens = spaces + 1
    if (numTokens < n) return null
    val starts = new Array[Int](numTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (bytes(i) == SP) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(numTokens) = nb + 1
    starts
  }

  private val EmptyStrings = new GenericArrayData(Array.empty[Any])
  private val EmptyLongs = UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

  /** Word n-grams, semantics identical to
    * `transform(sequence(1, size(ws)-n+1), i -> concat_ws(" ", ws[i..i+n-1]))`
    * over `ws = split(text, " ")` — including empty tokens from
    * consecutive/leading/trailing spaces, and [] when fewer than n
    * tokens exist.
    */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes, n)
    if (starts == null) return EmptyStrings
    val numTokens = starts.length - 1
    val numGrams = numTokens - n + 1
    val out = new Array[Any](numGrams)
    var g = 0
    while (g < numGrams) {
      val s = starts(g)
      val e = starts(g + n) - 1 // end of token g+n-1
      out(g) = UTF8String.fromBytes(bytes, s, e - s)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted-distinct xxhash64 (seed 42 — Spark's `xxhash64` seed, so
    * values are bit-identical to `transform(array_distinct(ngrams),
    * xxhash64)`) of the word-n-gram shingle set. Grams are hashed
    * straight from their byte range — the gram strings are never
    * materialized. Sorted output enables merge-based jaccard.
    */
  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes, n)
    if (starts == null) return EmptyLongs
    val numTokens = starts.length - 1
    val numGrams = numTokens - n + 1
    val hs = new Array[Long](numGrams)
    var g = 0
    while (g < numGrams) {
      val s = starts(g)
      val e = starts(g + n) - 1
      hs(g) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s, e - s, 42L)
      g += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var i = 1
    while (i < numGrams) {
      if (hs(i) != hs(m)) { m += 1; hs(m) = hs(i) }
      i += 1
    }
    val distinct = if (m + 1 == numGrams) hs else java.util.Arrays.copyOf(hs, m + 1)
    UnsafeArrayData.fromPrimitiveArray(distinct)
  }

  /** SimHash-64 in ONE pass: xxhash64(seed 42, matching Spark's
    * `xxhash64`) per single-space token, 64 bit-majority counters,
    * packed fingerprint. Bit-identical to the HOF formulation
    * (`Dedup.simhash64`), which recomputes the token-hash array once
    * PER BIT under CollapseProject — 64 tokenizations per row.
    */
  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes, 1) // never null: numTokens >= 1
    val numTokens = starts.length - 1
    val counts = new Array[Int](64)
    var t = 0
    while (t < numTokens) {
      val s = starts(t)
      val e = starts(t + 1) - 1
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s, e - s, 42L)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 >= numTokens) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature from a document's (distinct) shingle-hash set in
    * ONE pass: for each hash h and permutation j, the j-th slot is
    * min over h of xxhash64_long(h ^ seed_j) — XXH64.hashLong with
    * Spark's seed 42, so every value is bit-identical to the
    * explode + 64×min hash-aggregate formulation
    * (`Dedup.minhashSignatures`), but computed as a NARROW per-row
    * projection: no explode, no shuffle. Empty input yields
    * Long.MaxValue slots (the aggregate path emits no row at all —
    * callers filter empty shingle sets first, as the pair path does).
    */
  def minhashFromHashes(hashes: ArrayData, numPerm: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = new Array[Long](numPerm)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numPerm) {
        val v = XXH64.hashLong(h ^ (j * 0x9E3779B97F4A7C15L), 42L)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS scheme): Rabin-Karp rolling hash over byte
    * k-grams, then the minimum hash of every window of w consecutive
    * grams (rightmost-min tie-break). Guarantees: any shared substring
    * of length ≥ k+w-1 produces ≥1 shared fingerprint; position-
    * independent. Output is the SORTED DISTINCT selected hashes, so
    * `jaccardSorted` compares two documents' fingerprints directly.
    * O(n) time, one pass, no gram strings materialized.
    */
  def winnowFingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return EmptyLongs
    val m = n - k + 1 // k-gram count
    val hs = new Array[Long](m)
    val B = 1000003L
    var pow = 1L // B^(k-1)
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    // splitmix64-style finalizer: the raw polynomial hash is monotone
    // in the leading byte, which would bias window minima toward
    // particular characters.
    @inline def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    hs(0) = mix(h)
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xFF) * pow) * B + (bytes(i) & 0xFF)
      hs(i - k + 1) = mix(h)
      i += 1
    }
    if (m <= w) {
      // single (short) window: its minimum is the whole fingerprint
      var min = hs(0)
      i = 1
      while (i < m) { if (hs(i) <= min) min = hs(i); i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(min))
    }
    // winnow: rightmost minimum per window, amortized O(m)
    val sel = new Array[Long](m - w + 1)
    var selN = 0
    var minIdx = -1
    var j = 0
    while (j <= m - w) {
      if (minIdx < j) {
        // previous min slid out — rescan the window
        minIdx = j
        var t = j + 1
        while (t < j + w) { if (hs(t) <= hs(minIdx)) minIdx = t; t += 1 }
        sel(selN) = hs(minIdx); selN += 1
      } else if (hs(j + w - 1) <= hs(minIdx)) {
        minIdx = j + w - 1
        sel(selN) = hs(minIdx); selN += 1
      }
      j += 1
    }
    // sorted distinct (selection emits each chosen position once, but
    // equal hash VALUES can be chosen at different positions)
    val out = java.util.Arrays.copyOf(sel, selN)
    java.util.Arrays.sort(out)
    var d = 0
    i = 1
    while (i < out.length) {
      if (out(i) != out(d)) { d += 1; out(d) = out(i) }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (d + 1 == out.length) out else java.util.Arrays.copyOf(out, d + 1))
  }

  /** Tokens (single-space split, empties included) present in `set`. */
  def tokenSetCount(text: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val bytes = text.getBytes
    val nb = bytes.length
    var count = 0
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == ' '.toByte) {
        if (set.contains(UTF8String.fromBytes(bytes, start, i - start))) count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** Jaccard |A∩B| / |A∪B| over two SORTED distinct long arrays —
    * one merge pass, no per-call hash sets. NaN when both are empty
    * (matches `size(array_intersect)/size(array_union)` = 0/0).
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Containment |A∩B| / min(|A|,|B|) over two SORTED distinct long
    * arrays — one merge pass (the [[jaccardSorted]] merge with the
    * asymmetric denominator). The doc-in-doc statistic: a snippet
    * inside a 10× larger doc has jaccard ≈ 0.1 but containment 1.0.
    * NaN when either side is empty (0/0 discipline of jaccardSorted).
    */
  def containmentSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / math.min(na, nb).toDouble
  }

  /** Character-unigram Shannon entropy in NATS, one pass per row — the
    * boilerplate/gibberish quality signal (low entropy = repetitive
    * text). Counts per CODE POINT (matching an engine-side
    * `unnest(string_split(text, ''))` explode), each distinct-char
    * term `(k/n)·ln(n/k)` quantized to decimal(·,12) HALF_UP exactly
    * like a `cast(... as decimal(30,12))` per-term sum (the repo's
    * float-aggregation convention), so the exact decimal sum is
    * partition-order invariant AND replayable by an explode+group-by
    * oracle. ASCII fast path: a 128-slot array; anything else falls
    * into a hash map.
    */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val slot = other.computeIfAbsent(Integer.valueOf(cp), _ => new Array[Long](1))
        slot(0) += 1L
      }
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var sum = java.math.BigDecimal.ZERO
    def add(k: Long): Unit = if (k > 0L) {
      val term = (k.toDouble / n.toDouble) * math.log(n.toDouble / k.toDouble)
      sum = sum.add(java.math.BigDecimal.valueOf(term)
        .setScale(12, java.math.RoundingMode.HALF_UP))
    }
    var c = 0
    while (c < 128) { add(ascii(c)); c += 1 }
    if (other != null) other.values.forEach(slot => add(slot(0)))
    sum.doubleValue()
  }
}

/** Word n-grams of a single-space-tokenized string (array<string>). */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
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
    TextKernels.wordNgrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted-distinct xxhash64(seed 42) word-n-gram shingle set
  * (array<long>) — the minhash/jaccard input, computed in one pass.
  */
case class HashedShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    TextKernels.hashedShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.hashedShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (array<long> of numPerm slots) from a shingle-hash
  * array — one pass per row; see TextKernels.minhashFromHashes.
  */
case class MinHashSigExpr(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm >= 1, s"numPerm must be >= 1, got $numPerm")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint> input, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    TextKernels.minhashFromHashes(t.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.minhashFromHashes($c, $numPerm);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of the token stream (long) — one byte
  * scan per row; see TextKernels.simhash64.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    TextKernels.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of single-space tokens contained in a fixed string set —
  * the codegen'd form of `size(filter(split(text," "), w.isin(set)))`
  * (stopword density, language-marker scoring). The HOF form pays an
  * interpreted lambda per token AND recomputes the split per use site
  * under CollapseProject (langId scores 5 languages → 5 splits); this
  * is one byte scan with a hash probe per token.
  */
case class TokenSetCountExpr(child: Expression, tokens: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(t: Any): Any =
    TextKernels.tokenSetCount(t.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.tokenSetCount($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint of a document (sorted-distinct array<long>). */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    TextKernels.winnowFingerprint(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.winnowFingerprint($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge-based jaccard over two sorted-distinct array<long> columns. */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects array<long> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    TextKernels.jaccardSorted(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Containment over two sorted distinct long arrays — see
  * [[TextKernels.containmentSorted]].
  */
case class SortedLongContainment(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects array<long> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    TextKernels.containmentSorted(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.containmentSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-row character-unigram entropy (nats, double) — see
  * [[TextKernels.charEntropy]] for the exact-decimal term convention
  * that makes it oracle-replayable.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    TextKernels.charEntropy(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.charEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpr {
  /** Column-API entry points (codegen'd). */
  def wordNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(text), n))

  def hashedShingles(text: Column, n: Int): Column =
    ColumnBridge.column(HashedShinglesExpr(ColumnBridge.expression(text), n))

  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))

  def minhashSig(hashes: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes), numPerm))

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintExpr(
      ColumnBridge.expression(text), k, w))

  def tokenSetCount(text: Column, tokens: Seq[String]): Column =
    ColumnBridge.column(TokenSetCountExpr(
      ColumnBridge.expression(text), tokens))

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))

  def containmentSorted(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongContainment(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
