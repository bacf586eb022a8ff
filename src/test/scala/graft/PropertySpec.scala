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

  test("portable md5 kernels == composed builtins on adversarial unicode") {
    // The kernels hash byte ranges via hand-rolled token/char offset
    // tables (UTF-8 continuation-byte scanning in winnowMd5) — fuzz
    // them against the composed Spark-builtin formulations, which use
    // Spark's own split/substr/md5. Multi-byte chars, empty tokens,
    // consecutive spaces, and short docs are the edge cases.
    import graft.functions.PortableExpr
    import graft.operators.DedupPortable
    import org.apache.spark.sql.functions._
    val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.oneOf("a", "bb", "word", "", " ", "  "),
      Gen.oneOf("é", "中文字", "✓✓", "naïve", "🙂"),
      Gen.alphaNumStr.map(_.take(8))
    )).map(_.mkString(" "))
    val texts = samples(textGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.select(
        PortableExpr.md5Shingles($"t", 2).as("ks"),
        DedupPortable.hashedShinglesMd5Hof($"t", 2).as("cs"),
        PortableExpr.winnowMd5($"t", 4, 3).as("kw"),
        PortableExpr.simhashMd5($"t").as("kf"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"shingle kernel/composed mismatch")
    }
    // winnow: compare against the windowed DataFrame reference
    val ww = DedupPortable.winnowPortableFingerprintsWindowed(
        df, "id", "t", 4, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kw = df.select($"id", PortableExpr.winnowMd5($"t", 4, 3).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      .filter(_._2.nonEmpty).toMap
    assert(kw == ww, "winnow kernel/windowed mismatch")
    // simhash: kernel vs aggregate formulation
    val fa = DedupPortable.simhashPortableFingerprintsAgg(df, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fk = df.select($"id", PortableExpr.simhashMd5($"t").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fk == fa, "simhash kernel/aggregate mismatch")
  }

  test("spreadsheet codecs (xlsx/ods/xls): arbitrary grids round-trip") {
    // Cells: strings (xml/markup-hostile incl. newlines — fine here,
    // these aren't line-based formats), typed numbers, nulls. Every
    // codec must return the same STRING grid (numbers via the shared
    // integral-without-dot-zero display rule, nulls preserved).
    val cellStr: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(40)),
      Gen.listOf(Gen.oneOf('<', '>', '&', '"', '\'', 'é', '中', '✓', '\n', ' ', 'x'))
        .map(_.mkString.take(40)))
    val cell: Gen[Any] = Gen.oneOf(
      cellStr,
      Gen.choose(-1000000, 1000000),
      Gen.choose(-1e6, 1e6).map(d => math.rint(d * 100) / 100.0),
      Gen.const(null))
    val gen = Gen.listOfN(6, Gen.listOfN(4, cell))
    def expected(grid: Seq[Seq[Any]]): Seq[Seq[String]] = grid.map(_.map {
      case null => null
      case i: Int => i.toString
      case d: Double =>
        if (d == math.rint(d)) d.toLong.toString else d.toString
      case v => v.toString
    })
    // drop trailing nulls per row / trailing empty rows the way sparse
    // formats legitimately do (absent cell == null cell)
    def clip(g: Seq[Seq[String]]): Seq[Seq[String]] = {
      val rows = g.map { r => r.take(r.lastIndexWhere(_ != null) + 1) }
      rows.take(rows.lastIndexWhere(_.nonEmpty) + 1)
    }
    samples(gen, 10).foreach { grid =>
      val d = tmp()
      graft.formats.Xlsx.write(s"$d/g.xlsx", grid)
      assert(clip(graft.formats.Xlsx.read(s"$d/g.xlsx").map(_.map(identity)))
        == clip(expected(grid)), "xlsx")
      graft.formats.Ods.write(s"$d/g.ods", grid)
      // ODS display text ≠ value attr for doubles like 2.0 ("2.0" vs 2.0):
      // reader prefers office:value, which our writer stringifies raw —
      // compare against raw toString for ODS
      val odsExp = clip(grid.map(_.map {
        case null => null; case v => v.toString
      }))
      assert(clip(graft.formats.Ods.read(s"$d/g.ods")) == odsExp, "ods")
      graft.formats.Xls.write(s"$d/g.xls", grid)
      assert(clip(graft.formats.Xls.read(s"$d/g.xls")) == clip(expected(grid)),
        "xls")
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

  test("image codec properties: decode/resize dims, throw-free on garbage") {
    import graft.multimodal.ImageIoCodec
    // arbitrary dims: painted PNG decodes to its true size; resize to
    // arbitrary positive dims yields a decodable PNG of those dims
    val dims = Gen.zip(Gen.choose(1, 80), Gen.choose(1, 60),
      Gen.choose(1, 40), Gen.choose(1, 40), Gen.choose(0, 255))
    samples(dims, 10).foreach { case (w, h, rw, rh, seed) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 31 + y * 7 + seed) & 0xFFFFFF); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      val m = ImageIoCodec.decode(bytes)
      assert(m.valid && m.format == "png" && m.width == w && m.height == h)
      val resized = ImageIoCodec.resize(bytes, rw, rh)
      val rm = ImageIoCodec.decode(resized)
      assert(rm.valid && rm.width == rw && rm.height == rh)
      val f = ImageIoCodec.features(bytes, 16)
      assert(f.length == 16 && f.forall(v => v >= -0.5f && v <= 0.5f))
    }
    // arbitrary garbage bytes: never throw, never claim validity
    val garbage = Gen.listOfN(64, Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    samples(garbage, 10).foreach { g =>
      assert(!ImageIoCodec.decode(g).valid || !ImageIoCodec.supports(g))
      ImageIoCodec.features(g, 8) // must not throw
      ImageIoCodec.resize(g, 4, 4)
      ImageIoCodec.sampleFrames(g, 2)
    }
    // truncated real PNG header: sniffs as png but must fail SOFT
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
      10, 10, java.awt.image.BufferedImage.TYPE_INT_RGB), "png", bos2)
    val truncated = bos2.toByteArray.take(20)
    val tm = ImageIoCodec.decode(truncated)
    assert(!tm.valid && tm.format == "png")
  }
}
