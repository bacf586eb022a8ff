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
