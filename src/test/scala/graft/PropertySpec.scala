package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.Sources
import graft.sinks.Sinks

/** Property tests for the codec layer (SURVEY §5 strategy): arbitrary
  * adversarial content must survive write→read unchanged. ScalaCheck
  * generators driven from fixed seeds (deterministic CI).
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // CSV-hostile strings: separators, quotes, unicode, whitespace
  // (newlines excluded: a raw embedded newline is a record boundary
  // for line-based readers — multiLine CSV is a different mode).
  private val hostile: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(',', '"', '\\', '\t', ';', 'é', '中', '✓', ' ', 'a'))
      .map(_.mkString))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_prop").toString

  test("csv round-trip: arbitrary strings and numbers survive") {
    val gen = Gen.listOfN(20, Gen.zip(Gen.choose(0, 100000), hostile,
      Gen.double))
    samples(gen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "s", "d")
      val out = tmp()
      Sinks.csv(df, out)
      val back = Sources.csv(spark, out, schema = Some(df.schema))
      assert(df.orderBy("id", "s", "d").collect().toSeq ==
        back.orderBy("id", "s", "d").collect().toSeq)
    }
  }

  test("ndjson round-trip: arbitrary strings survive") {
    val gen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 1L << 40), hostile))
    samples(gen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "s")
      val out = tmp()
      Sinks.ndjson(df, out)
      val back = Sources.ndjson(spark, out, Some(df.schema))
      assert(df.orderBy("id", "s").collect().toSeq ==
        back.orderBy("id", "s").collect().toSeq)
    }
  }

  test("fixed-width: output lines always exactly sum(widths) wide") {
    val gen = Gen.listOfN(10, Gen.zip(Gen.choose(0, 999999), Gen.alphaNumStr))
    samples(gen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("n", "s")
      val out = tmp()
      Sinks.fixedWidth(df, out, Seq(8, 12))
      val lines = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("part-"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines())
      assert(lines.forall(_.length == 20))
      assert(lines.length == rows.length)
    }
  }

  test("BSON codec: arbitrary flat rows round-trip") {
    val value: Gen[Any] = Gen.oneOf(
      Gen.choose(Int.MinValue, Int.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.double, hostile, Gen.oneOf(true, false), Gen.const(null))
    val gen = Gen.listOfN(8, Gen.listOfN(5, value))
    samples(gen, 25).foreach { rows =>
      val named = rows.map(_.zipWithIndex.map { case (v, i) => s"f$i" -> v })
      val back = graft.formats.Bson.decodeRows(graft.formats.Bson.encodeRows(named))
      assert(back == named)
    }
  }
}
