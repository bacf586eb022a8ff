package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.StubCodec
import graft.operators.Similarity

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val mediaDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    (0 until 20).foreach { i =>
      val payload = Array.fill[Byte](100 + i * 37)((i * 31 + 7).toByte)
      val bytes = StubCodec.encode(
        if (i % 2 == 0) "img" else "vid", 640 + i, 480 + i, 1000L * i, payload)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/media_$i.bin"), bytes)
    }
    // one corrupt file (no magic)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/corrupt.bin"), Array[Byte](1, 2, 3))
    dir
  }

  test("binaryFile read + decodeMeta: schema, validity, dimensions") {
    val df = Multimodal.decodeMeta(
      Multimodal.readBinary(spark, mediaDir, "*.bin"))
    assert(df.schema("meta").dataType == Multimodal.metaSchema)
    assert(df.count() == 21)
    assert(df.filter($"meta.valid").count() == 20)
    val r = df.filter($"path".endsWith("media_4.bin")).select("meta.*").head()
    assert(r.getAs[String]("format") == "img")
    assert(r.getAs[Int]("width") == 644 && r.getAs[Int]("height") == 484)
  }

  test("feature extraction is deterministic and feeds real ANN ops") {
    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, mediaDir, "*.bin"))
      .withColumn("vec_id", xxhash64($"path"))
      .select($"vec_id", $"embedding")
    val a = feats.orderBy("vec_id").collect().map(_.getSeq[Float](1))
    val b = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, mediaDir, "*.bin"))
      .withColumn("vec_id", xxhash64($"path"))
      .select($"vec_id", $"embedding")
      .orderBy("vec_id").collect().map(_.getSeq[Float](1))
    assert(a.zip(b).forall { case (x, y) => x == y }, "not deterministic")
    assert(a.head.length == 64)
    // end-to-end: stub features → real brute-force cosine top-k
    val topk = Similarity.bruteForceTopK(feats, feats.limit(3),
      "vec_id", "embedding", 4)
    assert(topk.count() == 12)
  }

  test("resize and frame sampling keep plumbing contracts") {
    val df = Multimodal.readBinary(spark, mediaDir, "media_1.bin")
    val resized = Multimodal.resize(df, 100, 50)
    val m = StubCodec.decode(resized.select("resized").head().getAs[Array[Byte]](0))
    assert(m.width == 100 && m.height == 50 && m.format == "vid")
    val frames = Multimodal.sampleFrames(df, 5)
    assert(frames.select(size($"frames")).head().getInt(0) == 5)
  }

  /** Real PNG/JPEG bytes drawn with java.awt — no fixtures needed. */
  private def paintImage(w: Int, h: Int, fmt: String, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 7 + seed) % 256 << 16) |
          ((y * 5 + seed) % 256 << 8) | ((x + y + seed) % 256))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private lazy val imageDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_img").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.png"),
      paintImage(64, 48, "png", 1))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.jpg"),
      paintImage(32, 32, "jpg", 99))
    dir
  }

  test("real PNG/JPEG decode end-to-end: format + true dimensions") {
    val df = Multimodal.decodeMeta(Multimodal.readBinary(spark, imageDir, "*"))
      .select($"path", $"meta.*")
    val png = df.filter($"path".endsWith("a.png")).head()
    assert(png.getAs[String]("format") == "png")
    assert(png.getAs[Int]("width") == 64 && png.getAs[Int]("height") == 48)
    assert(png.getAs[Boolean]("valid"))
    val jpg = df.filter($"path".endsWith("b.jpg")).head()
    assert(jpg.getAs[String]("format") == "jpeg")
    assert(jpg.getAs[Int]("width") == 32 && jpg.getAs[Int]("height") == 32)
  }

  test("real image resize resamples pixels and re-encodes as PNG") {
    val df = Multimodal.readBinary(spark, imageDir, "a.png")
    val out = Multimodal.resize(df, 16, 12).select("resized")
      .head().getAs[Array[Byte]](0)
    val m = graft.multimodal.ImageIoCodec.decode(out)
    assert(m.valid && m.format == "png" && m.width == 16 && m.height == 12)
    // resampled content, not a header rewrite: output decodes to pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 16 && img.getHeight == 12)
  }

  test("real image features: deterministic, content-sensitive, in range") {
    val df = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, imageDir, "*"))
      .select($"path", $"embedding").orderBy($"path")
    val rows = df.collect().map(_.getSeq[Float](1))
    assert(rows.forall(_.length == 64))
    assert(rows.forall(_.forall(v => v >= -0.5f && v <= 0.5f)))
    assert(rows(0) != rows(1), "different images must differ")
    val again = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, imageDir, "*"))
      .select($"path", $"embedding").orderBy($"path")
      .collect().map(_.getSeq[Float](1))
    assert(rows.zip(again).forall { case (x, y) => x == y })
  }

  test("real image frame sampling yields PNG frames") {
    val df = Multimodal.readBinary(spark, imageDir, "a.png")
    val frames = Multimodal.sampleFrames(df, 3).select("frames")
      .head().getSeq[Array[Byte]](0)
    // a still image has exactly one frame; it must be a decodable PNG
    assert(frames.length == 1)
    assert(graft.multimodal.ImageIoCodec.decode(frames.head).valid)
  }

  test("corrupt payloads surface as valid=false, never throw") {
    val df = Multimodal.decodeMeta(
      Multimodal.readBinary(spark, mediaDir, "corrupt.bin"))
    val m = df.select("meta.*").head()
    assert(!m.getAs[Boolean]("valid"))
  }

  test("partitionByBytes sizes tasks by payload bytes") {
    val df = Multimodal.readBinary(spark, mediaDir, "*.bin")
    val p = Multimodal.partitionByBytes(df, "length", targetBytes = 2000)
    assert(p.rdd.getNumPartitions >= 2)
    assert(p.count() == 21)
  }
}
