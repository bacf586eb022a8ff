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

  // ---- real WAV audio codec (javax.sound.sampled) -------------------

  /** 16-bit signed mono PCM WAV: `freq` Hz sine at `rate` Hz for
    * `ms` milliseconds, via the JDK encoder itself.
    */
  private def sineWav(freq: Double, rate: Float = 8000f,
                      ms: Int = 500): Array[Byte] = {
    import javax.sound.sampled._
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      bb.putShort((math.sin(2 * math.Pi * freq * i / rate) * 12000).toShort)
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("wav decode: header-only meta (rate, channels, duration)") {
    import graft.multimodal.WavCodec
    val m = WavCodec.decode(sineWav(440.0, rate = 8000f, ms = 500))
    assert(m.valid && m.format == "wav")
    assert(m.width == 8000 && m.height == 1)
    assert(m.durationMs == 500, s"durationMs=${m.durationMs}")
    // AutoCodec routes RIFF/WAVE payloads to the real codec
    val auto = Multimodal.AutoCodec.decode(sineWav(220.0))
    assert(auto.valid && auto.format == "wav")
  }

  test("wav features: RMS/zero-crossing grid separates tone pitch and silence") {
    import graft.multimodal.WavCodec
    val lo = WavCodec.features(sineWav(200.0), 64)
    val hi = WavCodec.features(sineWav(2000.0), 64)
    val silence = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](8000) // 0.5 s of zeros
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4000L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      WavCodec.features(bos.toByteArray, 64)
    }
    assert(lo.length == 64 && hi.length == 64)
    assert(lo.toSeq == WavCodec.features(sineWav(200.0), 64).toSeq, "deterministic")
    // same amplitude → similar RMS halves; 10× frequency → much higher
    // zero-crossing half
    val zcrLo = lo.drop(32).map(_.toDouble).sum / 32
    val zcrHi = hi.drop(32).map(_.toDouble).sum / 32
    assert(zcrHi > zcrLo + 0.2, s"zcrLo=$zcrLo zcrHi=$zcrHi")
    // silence: RMS slots at the -0.5 floor, no crossings
    assert(silence.take(32).forall(v => math.abs(v + 0.5f) < 1e-6))
    assert(lo.take(32).forall(_ > -0.4f))
  }

  test("wav frame sampling cuts standalone playable segments") {
    import graft.multimodal.WavCodec
    val segs = WavCodec.sampleFrames(sineWav(440.0, ms = 600), 3)
    assert(segs.length == 3)
    segs.foreach { seg =>
      val m = WavCodec.decode(seg)
      assert(m.valid && m.width == 8000)
      assert(math.abs(m.durationMs - 200) <= 1, s"durationMs=${m.durationMs}")
    }
  }

  test("wav valid flag means featurizable: float WAVs are consistent") {
    // 32-bit IEEE-float WAV (format tag 3), hand-crafted: the contract
    // is CONSISTENCY — valid=true implies real (content-sensitive)
    // features via the JDK's PCM conversion; if this JDK can't convert,
    // the file must surface as valid=false rather than flowing
    // downstream with an all-zero "embedding".
    def floatWav(freq: Double, rate: Int = 8000, n: Int = 4000): Array[Byte] = {
      val dataLen = n * 4
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(3) // IEEE float
        .putShort(1).putInt(rate).putInt(rate * 4).putShort(4).putShort(32)
      bb.put("data".getBytes).putInt(dataLen)
      (0 until n).foreach(i =>
        bb.putFloat((math.sin(2 * math.Pi * freq * i / rate) * 0.8).toFloat))
      bb.array()
    }
    import graft.multimodal.WavCodec
    val m = WavCodec.decode(floatWav(440.0))
    val lo = WavCodec.features(floatWav(200.0), 64)
    val hi = WavCodec.features(floatWav(2000.0), 64)
    if (m.valid) {
      assert(m.width == 8000 && m.height == 1 && m.durationMs == 500)
      assert(lo.toSeq != hi.toSeq, "features must be content-sensitive")
      assert(lo.exists(_ != 0f))
    } else {
      assert(lo.forall(_ == 0f) && hi.forall(_ == 0f))
    }
  }

  test("corrupt wav surfaces as valid=false, never throws") {
    import graft.multimodal.WavCodec
    val junk = "RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](20)(7)
    val m = WavCodec.decode(junk)
    assert(!m.valid)
    assert(WavCodec.features(junk, 16).toSeq == Seq.fill(16)(0f))
    assert(WavCodec.sampleFrames(junk, 2).isEmpty)
  }

  test("renderGray8x8 -> averageHash64 round-trip is exact integer arithmetic") {
    // The q149 oracle derives the hash relationally from the pixel
    // ints; this is the by-construction exactness it relies on: for ANY
    // 64 gray levels, PNG-encode + codec decode + average-hash equals
    // the direct integer-arithmetic hash.
    import graft.multimodal.ImageIoCodec
    def directHash(px: Seq[Int]): Long = {
      val s = px.map(_.toLong).sum
      (0 until 60).foldLeft(0L)((h, i) =>
        if (px(i).toLong * 64 > s) h | (1L << i) else h)
    }
    val rng = new scala.util.Random(42)
    val cases = Seq(
      Seq.fill(64)(0), Seq.fill(64)(255), (0 until 64).toSeq,
      Seq.tabulate(64)(i => if (i % 2 == 0) 10 else 240)) ++
      Seq.fill(20)(Seq.fill(64)(rng.nextInt(256)))
    cases.foreach { px =>
      val bytes = Multimodal.renderGray8x8(px)
      assert(ImageIoCodec.sniff(bytes).contains("png"))
      assert(ImageIoCodec.averageHash64(bytes) == directHash(px),
        s"round-trip hash mismatch for $px")
    }
    // throw-free contract on nonsense inputs
    assert(ImageIoCodec.averageHash64(Array[Byte](1, 2, 3)) == 0L)
    val clamped = Multimodal.renderGray8x8(Seq(-5, 900)) // clamp + pad
    assert(ImageIoCodec.averageHash64(clamped) ==
      directHash(Seq(0, 255) ++ Seq.fill(62)(0)))
  }

  test("encodePcm16 -> audioFingerprint60 round-trip is exact integer arithmetic") {
    // The q161 oracle derives the hash relationally from the quantized
    // sample ints; this is the by-construction exactness it relies on:
    // for ANY 64 sample values (each held 4 frames, so every feature
    // window is constant), WAV-encode + codec decode + windowed-RMS
    // fingerprint equals the direct integer-arithmetic hash.
    import graft.multimodal.WavCodec
    def directHash(sv: Seq[Int]): Long = {
      val a = sv.take(60).map(v => math.abs(v).toLong)
      val s = a.sum
      (0 until 60).foldLeft(0L)((h, i) =>
        if (a(i) * 60 > s) h | (1L << i) else h)
    }
    def clip(sv: Seq[Int]): Array[Byte] =
      WavCodec.encodePcm16(sv.flatMap(v => Seq.fill(4)(v)))
    val rng = new scala.util.Random(161)
    val cases = Seq(
      Seq.fill(64)(0), Seq.fill(64)(16384), Seq.tabulate(64)(i => i * 256 - 8192),
      Seq.tabulate(64)(i => if (i % 2 == 0) -12000 else 300)) ++
      Seq.fill(20)(Seq.fill(64)((rng.nextInt(8193) - 4096) * 4))
    cases.foreach { sv =>
      val bytes = clip(sv)
      assert(WavCodec.supports(bytes))
      assert(WavCodec.audioFingerprint60(bytes) == directHash(sv),
        s"round-trip hash mismatch for $sv")
    }
    // gain invariance: a uniform re-master scales every window AND the
    // mean equally, so the mean-relative bits cannot move (this is what
    // makes the hash a RE-MASTER-robust dedup key, and why q161's
    // planted variants differ only at their edited segment)
    val sv = Seq.fill(20)(Seq.fill(64)((rng.nextInt(8193) - 4096) * 4))
    sv.foreach { v =>
      assert(WavCodec.audioFingerprint60(clip(v.map(_ / 2))) ==
        WavCodec.audioFingerprint60(clip(v)), "half-gain changed the hash")
    }
    // throw-free contract on nonsense input
    assert(WavCodec.audioFingerprint60(Array[Byte](1, 2, 3)) == 0L)
  }

  test("renderBlockFrame MJPEG round-trip lands on planted sign bits (verify corpus)") {
    // q162's exactness is by MARGIN (JPEG is lossy): block-constant
    // 0/255 frames with 4 forced-high + 4 forced-low cells keep every
    // averageHash64 decision ≥ 3×255 from the mean threshold, so the
    // build→parse→DHT-splice→decode→hash chain must reproduce the
    // planted sign bits EXACTLY. Pinned over the full verify-scale
    // corpus — the same rows the driver's DuckDB oracle replays.
    import graft.multimodal.{AviCodec, ImageIoCodec}
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    assert(embs.nonEmpty)
    def cellsOf(e: Seq[Float], f: Int): Seq[Int] =
      (0 until 64).map { j =>
        if (j < 4) 255
        else if (j < 8) 0
        else if (e((j + 16 * f) % 64).toDouble > 0) 255 else 0
      }
    def hashOf(cells: Seq[Int]): Long =
      (0 until 60).foldLeft(0L)((h, j) =>
        if (cells(j) == 255) h | (1L << j) else h)
    def roundTrip(frames: Seq[Seq[Int]]): Seq[Long] = {
      val avi = AviCodec.buildAvi(
        frames.map(c => AviCodec.renderBlockFrame(c)), 64, 64)
      AviCodec.sampleFrames(avi, 4).map(ImageIoCodec.averageHash64)
    }
    embs.foreach { case (v, e) =>
      val frames = (0 until 4).map(f => cellsOf(e, f))
      assert(roundTrip(frames) == frames.map(hashOf), s"vec $v base clip")
      if (v % 10 == 0) { // planted edit: one block toggled in one frame
        val (fd, d) = ((v % 4).toInt, (8 + v % 52).toInt)
        val ed = frames.updated(fd,
          frames(fd).updated(d, 255 - frames(fd)(d)))
        assert(roundTrip(ed) == ed.map(hashOf), s"vec $v edited clip")
      }
    }
  }

  test("partitionByBytes sizes tasks by payload bytes") {
    val df = Multimodal.readBinary(spark, mediaDir, "*.bin")
    val p = Multimodal.partitionByBytes(df, "length", targetBytes = 2000)
    assert(p.rdd.getNumPartitions >= 2)
    assert(p.count() == 21)
  }
}
