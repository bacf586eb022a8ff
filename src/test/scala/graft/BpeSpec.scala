package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Real BPE (Sennrich merge loop + lowest-rank-first application)
  * against the hand-computed classic fixture.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // the canonical BPE teaching corpus
  private val counts = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge training follows max-count with lexicographic tie-break") {
    val merges = Bpe.trainFromCounts(counts, 5)
    // (e,s)/(s,t)/(t,</w>) all count 9 -> lexicographic order resolves
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow), ("l", "o"), ("lo", "w")),
      merges.toString)
  }

  test("encode segments an UNSEEN word with trained merges") {
    val ranks = Bpe.trainFromCounts(counts, 5).zipWithIndex.toMap
    // the classic result: lowest = low + est</w>
    assert(Bpe.encodeWord("lowest", ranks) ==
      Vector("low", "est" + Bpe.Eow))
    // fully unseen characters fall back to chars + eow
    assert(Bpe.encodeWord("xyz", ranks) ==
      Vector("x", "y", "z", Bpe.Eow))
  }

  test("tokens round-trip to the original text") {
    val ranks = Bpe.trainFromCounts(counts, 5).zipWithIndex.toMap
    for (text <- Seq("low lower newest", "the lowest widest low")) {
      val restored = Bpe.encodeText(text, ranks)
        .mkString("").split(java.util.regex.Pattern.quote(Bpe.Eow))
        .filter(_.nonEmpty).mkString(" ")
      assert(restored == text, s"'$text' -> '$restored'")
    }
  }

  test("distributed train == driver train; encode column segments rows") {
    val corpus = counts.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w) }.mkString(" ")
    val df = Seq(corpus).toDF("text")
    val distributed = Bpe.train(df, "text", numMerges = 5)
    assert(distributed == Bpe.trainFromCounts(counts, 5))
    val toks = Seq("lowest").toDF("t")
      .select(Bpe.encode($"t", distributed).as("toks"))
      .head().getSeq[String](0)
    assert(toks == Seq("low", "est" + Bpe.Eow))
    // null propagates
    val n = Seq(Option.empty[String]).toDF("t")
      .select(Bpe.encode($"t", distributed)).head()
    assert(n.isNullAt(0))
  }

  test("train on the real corpus matches an independently computed table") {
    // expected table computed by a from-scratch reference
    // implementation (python) over the same sf0.001 word counts —
    // cross-validates counting, the merge loop, and the tie-break.
    val merges = Bpe.train(Tables(spark, sf, "documents"), "text", 8)
    assert(merges == Seq(
      ("e", "r"), ("e", Bpe.Eow), ("n", Bpe.Eow), ("o", "r"),
      ("t", Bpe.Eow), ("er", Bpe.Eow), ("o", "w"), ("ow", Bpe.Eow)),
      merges.toString)
  }

  test("bpe pipeline module trains on the stream and appends tokens") {
    val d = java.nio.file.Files.createTempDirectory("bpe").toString
    val corpus = counts.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w) }.mkString(" ")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/in.csv"), s"id,body\n1,$corpus\n2,lowest\n")
    graft.pipeline.Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread:infer=1:out=docs",
      "bpe:in=docs:text=body:merges=5:out=toks",
      "select:in=toks:exprs=id;size(tokens) AS n:out=sel",
      "sort:in=sel:by=id:out=so",
      "csvwrite:in=so", s"filewrite:out=$d/out.csv"))
    val lines = new java.io.File(s"$d/out.csv").listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
    // doc 2 "lowest" -> [low, est</w>] = 2 tokens
    assert(lines.last == "2,2", lines.toString)
  }
}
