package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{StringSimilarity, StringSimilarityKernels => K}
import graft.operators.Linkage

/** Record-linkage kernels and the blocked-pair operator.
  *
  * The Jaro-Winkler pins are decimal-exact doubles cross-checked
  * against DuckDB's jaro_winkler_similarity (the oracle engine), so a
  * kernel drift that would break the q133 hash-compare fails here
  * first with a readable value diff.
  */
class LinkageSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    K.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler matches the oracle engine bit-for-bit on pinned pairs") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DUNKIN", "DUNCAN") == 0.8444444444444443)
    assert(jw("CRAZY", "CRAZE") == 0.92)
    assert(jw("jon", "john") == 0.9333333333333333)
    assert(jw("abcdef", "badcfe") == 0.8333333333333334) // transpositions
    assert(jw("goldenrod", "goldenrdo") == 0.9777777777777777)
  }

  test("jaro-winkler corner semantics: empty, identical, disjoint, boost gate") {
    assert(jw("", "") == 0.0)       // oracle pins empty-vs-empty to 0, not 1
    assert(jw("", "abc") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // zero matches
    // Below the 0.7 jaro threshold the shared prefix must NOT boost.
    assert(jw("abcdexxxx", "abzzzyyyy") == 0.48148148148148145)
    assert(jw("prefix123", "pre999888") == 0.5555555555555555)
  }

  test("jaro-winkler column is null-safe and codegen'd") {
    val df = Seq(("martha", "marhta"), (null, "x"), ("y", null))
      .toDF("a", "b")
      .select(StringSimilarity.jaroWinkler($"a", $"b").as("s"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
      == Seq(0.9611111111111111, null, null))
    // Codegen gate on a scan-backed plan (local relations collapse to
    // LocalTableScan and show no codegen span regardless of kernel).
    val scanDf = Tables(spark, sf, "part")
      .select(StringSimilarity.jaroWinkler($"p_name", $"p_brand").as("s"))
      .agg(sum($"s"))
    val fp = Explain.finalPlan(scanDf)
    assert(Explain.inCodegen(fp, "jarowinkler"),
      s"jaroWinkler fell out of codegen:\n$fp")
  }

  test("nfc normalization composes combining marks; fast path returns input") {
    val dec = "cafe\u0301" // e + COMBINING ACUTE
    val pre = "caf\u00e9"  // precomposed
    assert(K.nfcNormalize(UTF8String.fromString(dec)).toString == pre)
    // Already-normalized input must come back as the SAME object (the
    // no-allocation fast path the 100 TB scan depends on).
    val in = UTF8String.fromString(pre)
    assert(K.nfcNormalize(in) eq in)
    val df = Seq(dec, pre).toDF("t")
      .select(length(StringSimilarity.nfcNormalize($"t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(4, 4))
  }

  test("candidatePairs: each unordered pair once; oversized blocks dropped") {
    val df = Seq(
      (1L, "aa", "b1"), (2L, "ab", "b1"), (3L, "ac", "b1"),
      (4L, "dd", "b2"), (5L, "de", "b2"),
      (6L, "x1", "hot"), (7L, "x2", "hot"), (8L, "x3", "hot"), (9L, "x4", "hot"))
      .toDF("id", "name", "blk")
    val pairs = Linkage.candidatePairs(df, "id", "name", Seq("blk"), maxBlock = 3)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    // b1 (3 rows) -> 3 pairs, b2 (2 rows) -> 1 pair, hot (4 > cap) -> dropped
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("jaroWinklerLinks thresholds and carries the bit-pinned score") {
    val df = Seq((1L, "martha", "b"), (2L, "marhta", "b"), (3L, "zzzzzz", "b"))
      .toDF("id", "name", "blk")
    val links = Linkage.jaroWinklerLinks(df, "id", "name", Seq("blk"), 0.9)
      .collect()
    assert(links.length == 1)
    assert(links(0).getLong(0) == 1L && links(0).getLong(1) == 2L)
    assert(links(0).getDouble(2) == 0.9611111111111111)
  }
}
