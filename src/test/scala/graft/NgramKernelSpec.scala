package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{NgramCountExpr, NgramCountKernel}

/** The single-pass counted-bigram / counted-token kernel
  * (NgramCountKernel, VERDICT r16 #3) must be bit-identical to the
  * positional split+posexplode formulation it replaced in the LM
  * family — same tokens, same pairs, same multiplicities — in BOTH
  * ngram modes, on hostile hand-picked strings, deterministic fuzz
  * (spaces runs, newlines, multi-byte, non-BMP surrogate pairs), and
  * the real documents corpus.
  */
class NgramKernelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Pins Curation.CodepointSplit verbatim (private[operators]); if
    * the production constant ever drifts, the operator-level oracle
    * rows (q236/q246 char fixtures) break — this spec pins the kernel
    * against the same contract.
    */
  private val CodepointSplit =
    "(?<=[^\\uD800-\\uDBFF])|(?<=[\\uD800-\\uDBFF][\\uDC00-\\uDFFF])"

  private def toks(mode: String)(c: Column): Column =
    if (mode == "char") filter(split(c, CodepointSplit), t => t =!= "")
    else filter(split(c, " "), t => t =!= "")

  private val hostile = Seq(
    "a b c d e",
    "single",
    "",
    " ",
    "   ",
    "a  b", // consecutive spaces → empty token dropped
    " leading and trailing ",
    "héllo wörld ünïcode ✓ 多字节 字符",
    "a a a a a", // max repetition: one distinct pair, count 4
    "ab ab ba ab ab",
    "𝄞 clef 𝄞 clef", // non-BMP (4-byte UTF-8, surrogate pair)
    "😀😀😀", // adjacent non-BMP codepoints, no spaces
    "tab\tand\nnewline stay inside word tokens",
    "x").toDF("text").withColumn("id", monotonically_increasing_id())

  private def fuzz(n: Int): DataFrame = {
    val rnd = new scala.util.Random(4217)
    val alphabet = Seq("a", "b", "th", "é", "多", "字", "𝄞", "😀", " ", " ",
      "\n", ".", "z ")
    val rows = (0 until n).map { i =>
      val len = rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString)
    }
    rows.toDF("id", "text")
  }

  private def refPairs(df: DataFrame, mode: String): DataFrame = {
    val base = df.select($"id", toks(mode)($"text").as("__t"))
      .withColumn("__n", size($"__t")).filter($"__n" >= 2)
    base.select($"id", $"__t",
        posexplode(sequence(lit(1), $"__n" - 1)).as(Seq("__x", "__i")))
      .select($"id",
        element_at($"__t", $"__i").as("w1"),
        element_at($"__t", $"__i" + 1).as("w2"))
      .groupBy($"id", $"w1", $"w2").agg(count(lit(1)).as("c"))
  }

  private def fastPairs(df: DataFrame, mode: String): DataFrame =
    df.select($"id",
        explode(NgramCountExpr.bigramCounts($"text", mode)).as("e"))
      .select($"id", $"e.w1".as("w1"), $"e.w2".as("w2"), $"e.c".as("c"))

  private def refToks(df: DataFrame, mode: String): DataFrame =
    df.select($"id", explode(toks(mode)($"text")).as("w"))
      .groupBy($"id", $"w").agg(count(lit(1)).as("c"))

  /** gramCounts' unigram block (w2 IS NULL). */
  private def fastToks(df: DataFrame, mode: String): DataFrame =
    df.select($"id",
        explode(NgramCountExpr.gramCounts($"text", mode)).as("e"))
      .filter($"e.w2".isNull)
      .select($"id", $"e.w1".as("w"), $"e.c".as("c"))

  /** gramCounts' bigram block must equal bigramCounts exactly. */
  private def fusedPairs(df: DataFrame, mode: String): DataFrame =
    df.select($"id",
        explode(NgramCountExpr.gramCounts($"text", mode)).as("e"))
      .filter($"e.w2".isNotNull)
      .select($"id", $"e.w1".as("w1"), $"e.w2".as("w2"), $"e.c".as("c"))

  private def assertSetEqual(fast: DataFrame, ref: DataFrame,
                             what: String): Unit = {
    val extra = fast.exceptAll(ref).count()
    val missing = ref.exceptAll(fast).count()
    assert(extra == 0 && missing == 0,
      s"$what: $extra extra / $missing missing counted rows vs reference")
  }

  for (mode <- Seq("word", "char")) {
    test(s"bigram counts == posexplode reference, $mode mode, hostile") {
      assertSetEqual(fastPairs(hostile, mode), refPairs(hostile, mode),
        s"hostile/$mode")
    }
    test(s"bigram counts == posexplode reference, $mode mode, fuzz") {
      val f = fuzz(250).cache()
      assertSetEqual(fastPairs(f, mode), refPairs(f, mode), s"fuzz/$mode")
      f.unpersist()
    }
    test(s"fused gramCounts: unigram block == explode reference, $mode mode") {
      val both = hostile.select($"id", $"text")
        .unionByName(fuzz(250).withColumn("id", $"id" + 1000000L))
      assertSetEqual(fastToks(both, mode), refToks(both, mode),
        s"tokens/$mode")
    }
    test(s"fused gramCounts: bigram block == bigramCounts, $mode mode") {
      val both = hostile.select($"id", $"text")
        .unionByName(fuzz(250).withColumn("id", $"id" + 1000000L))
      assertSetEqual(fusedPairs(both, mode), fastPairs(both, mode),
        s"fusedpairs/$mode")
    }
  }

  test("bigram counts == posexplode reference on the documents corpus, both modes") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id".as("id"), $"text")
    for (mode <- Seq("word", "char"))
      assertSetEqual(fastPairs(docs, mode), refPairs(docs, mode),
        s"documents/$mode")
  }

  test("kernel output is canonically ordered and interpreted eval == codegen") {
    // direct kernel call = the interpreted (nullSafeEval) path; the
    // DataFrame collect goes through codegen — both must agree, and
    // the array must be ascending (w1, w2) binary order.
    val texts = Seq("b a b a c", "😀 a 😀 a", "多字 多字 多")
    for (t <- texts; mode <- Seq("word", "char")) {
      val direct = NgramCountKernel
        .bigramCounts(UTF8String.fromString(t), mode == "char")
      val n = direct.numElements()
      val triples = (0 until n).map { i =>
        val r = direct.getStruct(i, 3)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getLong(2))
      }
      assert(triples == triples.sortBy(x => (x._1, x._2)),
        s"'$t'/$mode not canonically ordered: $triples")
      val viaDf = Seq(t).toDF("text")
        .select(explode(NgramCountExpr.bigramCounts($"text", mode)).as("e"))
        .select($"e.w1", $"e.w2", $"e.c")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq
      assert(viaDf.sorted == triples.sorted.map(identity),
        s"'$t'/$mode: codegen path disagrees with interpreted eval")
    }
  }

  test("malformed UTF-8 matches the regex path exactly (U+FFFD normalization)") {
    // raw crawl payloads reach char mode via warcread's binary→string
    // cast — a leading 0x80..0xBF byte once overflowed the token
    // array, and after that crash fix the byte-level tokenizer still
    // DISAGREED with the regex reference (which decodes via toString,
    // substituting U+FFFD per malformed sequence; ADVICE r17). The
    // kernel now routes invalid input through the identical decode,
    // so parity is unconditional, not well-formed-only: assert it on
    // a DataFrame whose string column carries raw invalid bytes
    // (binary→string cast, exactly the warcread path), in both modes.
    val badRows = Seq(
      Array(0x80.toByte, 'a'.toByte, 0x80.toByte, 'b'.toByte),
      Array(0xC3.toByte), // truncated 2-byte sequence at EOF
      Array('a'.toByte, ' '.toByte, 0xE2.toByte, 0x82.toByte), // cut 3-byte
      Array(0xF0.toByte, 0x9F.toByte, 'x'.toByte, ' '.toByte, 'y'.toByte))
    val df = badRows.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("id", "raw")
      .select($"id", $"raw".cast("string").as("text"))
    for (mode <- Seq("word", "char")) {
      assertSetEqual(fastPairs(df, mode), refPairs(df, mode),
        s"malformed/$mode pairs")
      assertSetEqual(fastToks(df, mode), refToks(df, mode),
        s"malformed/$mode tokens")
    }
    // direct-eval shape: [0x80, a, 0x80, b] decodes to 4 codepoints
    // (U+FFFD a U+FFFD b) → 3 adjacent char pairs
    val bad = UTF8String.fromBytes(Array(0x80.toByte, 'a'.toByte,
      0x80.toByte, 'b'.toByte))
    val p = NgramCountKernel.bigramCounts(bad, true)
    val total = (0 until p.numElements()).map(i => p.getStruct(i, 3).getLong(2)).sum
    assert(total == 3, s"expected 3 adjacent pairs post-normalization, got $total")
  }

  test("null text and <2-token docs vanish exactly like the old gate") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, ""), (3L, " "),
      (4L, "one"), (5L, "two words")).toDF("id", "text")
    val survivors = df
      .select($"id", NgramCountExpr.bigramCounts($"text", "word").as("p"))
      .filter(size($"p") > 0).select($"id").as[Long].collect().toSet
    assert(survivors == Set(5L))
  }
}
