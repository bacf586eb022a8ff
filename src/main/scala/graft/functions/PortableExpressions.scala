package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels for the PORTABLE (md5-family, oracle-replayable)
  * near-dup pipelines — the perf twin of TextKernels for the hash
  * family DuckDB can replay.
  *
  * The composed-builtin formulations (`transform(...)` + md5 + conv in
  * DedupPortable) are bit-identical by construction and kept as spec
  * cross-checks, but they pay either an interpreted md5 per array
  * element under CollapseProject or an explode + wide-aggregate shuffle
  * per table. These kernels compute the same values in ONE codegen'd
  * pass per row — narrow projections, no explode, no shuffle — which
  * took the three portable bench queries from 13.3 s to kernel speed.
  *
  * Equality contract with the SQL oracle (DedupPortableSql): a value
  * here equals `CAST('0x' || substr(md5(x), 1, c) AS BIGINT)` — the
  * first c hex digits of md5 are the first 4c bits of the digest read
  * big-endian, so the long is `u64(digest[0..8)) >>> (64 - 4c)`.
  */
object PortableKernels {

  private val mdTl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def be64(h: Array[Byte]): Long =
    ((h(0) & 0xFFL) << 56) | ((h(1) & 0xFFL) << 48) |
      ((h(2) & 0xFFL) << 40) | ((h(3) & 0xFFL) << 32) |
      ((h(4) & 0xFFL) << 24) | ((h(5) & 0xFFL) << 16) |
      ((h(6) & 0xFFL) << 8) | (h(7) & 0xFFL)

  /** First 60 bits (15 hex chars) of md5 over a byte range. */
  def md5Long60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = mdTl.get()
    d.update(bytes, off, len)
    be64(d.digest()) >>> 4
  }

  /** First 40 bits (10 hex chars) of md5 over a byte range. */
  def md5Long40(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = mdTl.get()
    d.update(bytes, off, len)
    be64(d.digest()) >>> 24
  }

  private val EmptyLongs = UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

  private val SP: Byte = ' '.toByte

  /** Token-start offsets incl. sentinel (same contract as
    * TextKernels.tokenStarts; duplicated to keep both kernel files
    * self-contained).
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

  /** Sorted-distinct 60-bit md5 hashes of the word-n-gram shingle set —
    * value-identical to `sort_array(array_distinct(transform(
    * wordNgrams(text, n), g -> md5Long(g))))`. Grams hash straight from
    * their byte range (space never occurs inside a UTF-8 multi-byte
    * sequence, so the gram's byte slice IS its UTF-8 encoding).
    */
  def md5Shingles(text: UTF8String, n: Int): ArrayData = {
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
      hs(g) = md5Long60(bytes, s, e - s)
      g += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    var i = 0
    while (i < numGrams) {
      if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == numGrams) hs else java.util.Arrays.copyOf(hs, out))
  }

  // ---- affine MinHash permutations --------------------------------------

  private val Mask31 = 0x7FFFFFFFL

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Flat [a0, b0, a1, b1, …] affine constants — THE source of truth
    * (DedupPortable and the SQL generator read these). a odd ⇒ the map
    * h -> (a*h + b) mod 2^31 is a bijection; products stay < 2^63.
    */
  def permConstantsFlat(numPerm: Int): Array[Long] =
    permCache.computeIfAbsent(numPerm, np => {
      val out = new Array[Long](np * 2)
      var j = 0
      while (j < np) {
        out(2 * j) = (splitmix(2L * j) & Mask31) | 1L
        out(2 * j + 1) = splitmix(2L * j + 1) & Mask31
        j += 1
      }
      out
    })

  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** numPerm affine-permutation minima over an array of hashes —
    * value-identical to `array((0 until numPerm).map(j => array_min(
    * transform(hs, h -> (h & M) * a_j + b_j & M))))`. One pass per
    * permutation over a primitive array; no explode, no aggregate.
    */
  private def affineSigCore(hashes: ArrayData, numPerm: Int): Array[Long] = {
    val n = hashes.numElements()
    if (n == 0) return null
    val cs = permConstantsFlat(numPerm)
    val masked = new Array[Long](n)
    var i = 0
    while (i < n) { masked(i) = hashes.getLong(i) & Mask31; i += 1 }
    val out = new Array[Long](numPerm)
    var j = 0
    while (j < numPerm) {
      val a = cs(2 * j)
      val b = cs(2 * j + 1)
      var m = Long.MaxValue
      i = 0
      while (i < n) {
        val v = (masked(i) * a + b) & Mask31
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    out
  }

  def minhashAffineSig(hashes: ArrayData, numPerm: Int): ArrayData = {
    val sig = affineSigCore(hashes, numPerm)
    if (sig == null) EmptyLongs else UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Signature + LSH band keys fused in one pass: band b's key is the
    * 60-bit md5 prefix of the ASCII string
    * `"m_{b*r}|…|m_{b*r+r-1}"` (decimal-rendered slots) — value-
    * identical to `md5Long(concat_ws("|", slots.cast(string)))` over
    * the signature array, which the SQL oracle replays with
    * `concat_ws('|', m…::VARCHAR)`. Fusing removes the intermediate
    * signature materialization (and its CollapseProject persist
    * barrier) from the pair path.
    */
  def minhashBandKeysMd5(hashes: ArrayData, numPerm: Int,
                         bands: Int): ArrayData = {
    val sig = affineSigCore(hashes, numPerm)
    if (sig == null) return EmptyLongs
    val r = numPerm / bands
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(r * 11)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = 0
      while (i < r) {
        if (i > 0) sb.append('|')
        sb.append(sig(b * r + i))
        i += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(b) = md5Long60(bytes, 0, bytes.length)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 60-bit SimHash over md5-hashed whitespace tokens (counted WITH
    * multiplicity) — value-identical to the explode + 60-conditional-sum
    * aggregate formulation (DedupPortable.simhashPortableFingerprints).
    */
  def simhashMd5(text: UTF8String): Long = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes, 1) // numTokens >= 1 always
    val numTokens = starts.length - 1
    val counts = new Array[Int](60)
    var t = 0
    while (t < numTokens) {
      val s = starts(t)
      val e = starts(t + 1) - 1
      val h = md5Long60(bytes, s, e - s)
      var b = 0
      while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 >= numTokens) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Portable winnowing fingerprints: 40-bit md5 of each char-k-gram,
    * position packed into the key `(h40 << 20) + max(0, 2^20 - 1 - i)` so the
    * window MINIMUM is robust winnowing's smallest-hash-rightmost-pos
    * selection, exactly as the SQL replay computes it. Char positions
    * are CODE POINTS (Spark substr / DuckDB substr semantics); k-grams
    * hash straight from their byte range via a precomputed char→byte
    * offset table. Sorted-distinct selected hashes; empty when fewer
    * than one full window exists (doc shorter than k+w-1 chars).
    */
  def winnowMd5(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nb = bytes.length
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < nb) { if ((bytes(i) & 0xC0) != 0x80) nChars += 1; i += 1 }
    val m = nChars - k + 1 // k-gram count
    if (m < w) return EmptyLongs
    val charStart = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { charStart(c) = i; c += 1 }
      i += 1
    }
    charStart(nChars) = nb

    val keys = new Array[Long](m)
    var g = 0
    while (g < m) {
      val s = charStart(g)
      val e = charStart(g + k)
      // SQL i is 1-based: key = (h40 << 20) + max(0, 1048575 - (g+1)).
      // The position term is CLAMPED at zero: past 2^20-1 k-grams
      // (~1 MB of text) an unclamped term would go negative and borrow
      // into the hash bits — corrupting the recovered fingerprint and
      // silently breaking the shared-substring guarantee for large
      // documents. Clamped, the recovered hash stays exact everywhere;
      // only the rightmost-on-ties preference degrades to
      // leftmost-beyond-the-cap, identically in all three twins.
      keys(g) = (md5Long40(bytes, s, e - s) << 20) +
        math.max(0L, 1048575L - (g + 1))
      g += 1
    }
    // window minima (w is small — direct scan beats deque overhead),
    // dedup the SELECTED HASH (key >>> 20) via sort at the end
    val sel = new Array[Long](m - w + 1)
    var p = 0
    while (p <= m - w) {
      var mk = keys(p)
      var q = p + 1
      while (q < p + w) { if (keys(q) < mk) mk = keys(q); q += 1 }
      sel(p) = mk >>> 20
      p += 1
    }
    java.util.Arrays.sort(sel)
    var out = 0
    i = 0
    while (i < sel.length) {
      if (out == 0 || sel(i) != sel(out - 1)) { sel(out) = sel(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == sel.length) sel else java.util.Arrays.copyOf(sel, out))
  }
}

// ---- Expressions ---------------------------------------------------------

private[functions] trait StringInputExpr extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")
}

/** Sorted-distinct 60-bit md5 word-n-gram shingle hashes. */
case class Md5ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with StringInputExpr {
  require(n >= 1, s"need n >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    PortableKernels.md5Shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableKernels.md5Shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Affine-permutation MinHash signature over an array<long> of hashes. */
case class MinHashAffineSigExpr(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm >= 1, s"need numPerm >= 1, got $numPerm")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    PortableKernels.minhashAffineSig(a.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableKernels.minhashAffineSig($c, $numPerm);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash signature + band keys over an array<long> of hashes. */
case class MinHashBandKeysExpr(child: Expression, numPerm: Int, bands: Int)
    extends UnaryExpression {
  require(numPerm >= 1 && bands >= 1 && numPerm % bands == 0,
    s"numPerm must divide into bands, got numPerm=$numPerm bands=$bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    PortableKernels.minhashBandKeysMd5(a.asInstanceOf[ArrayData], numPerm, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableKernels.minhashBandKeysMd5($c, $numPerm, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit md5-family SimHash of whitespace tokens. */
case class SimHashMd5Expr(child: Expression)
    extends UnaryExpression with StringInputExpr {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    PortableKernels.simhashMd5(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableKernels.simhashMd5($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Portable winnowing fingerprints (sorted-distinct array<long>). */
case class WinnowMd5Expr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with StringInputExpr {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    PortableKernels.winnowMd5(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableKernels.winnowMd5($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points for the portable kernels. */
object PortableExpr {
  def md5Shingles(text: Column, n: Int): Column =
    ColumnBridge.column(Md5ShinglesExpr(ColumnBridge.expression(text), n))

  def minhashAffineSig(hashes: Column, numPerm: Int): Column =
    ColumnBridge.column(
      MinHashAffineSigExpr(ColumnBridge.expression(hashes), numPerm))

  def minhashBandKeys(hashes: Column, numPerm: Int, bands: Int): Column =
    ColumnBridge.column(
      MinHashBandKeysExpr(ColumnBridge.expression(hashes), numPerm, bands))

  def simhashMd5(text: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(text)))

  def winnowMd5(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowMd5Expr(ColumnBridge.expression(text), k, w))
}
