package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, ImageIoCodec}
import graft.multimodal.Multimodal.AutoCodec

/** MJPEG-in-AVI video codec: container round-trip, frame sampling into
  * the still-image pipeline, Annex-K DHT interop splice, honest
  * invalidity for undecodable payloads.
  */
class AviSpec extends AnyFunSuite {

  /** Solid-gray frame; level varies per frame so features are
    * content-sensitive (dark → bright ramp).
    */
  private def frame(w: Int, h: Int, level: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      val l = math.min(255, math.max(0, level))
      g2.setColor(new java.awt.Color(l, l, l))
      g2.fillRect(0, 0, w, h)
    } finally g2.dispose()
    img
  }

  private def mkAvi(n: Int, w: Int = 32, h: Int = 24,
                    usPerFrame: Long = 40000L): Array[Byte] =
    AviCodec.buildAvi(
      (0 until n).map(i => AviCodec.toJpeg(frame(w, h, 20 + i * 40))),
      w, h, usPerFrame)

  test("decode: header meta (dims, duration, fps) without full decode") {
    val avi = mkAvi(5) // 5 frames @ 25 fps = 200 ms
    assert(AviCodec.supports(avi))
    val m = AviCodec.decode(avi)
    assert(m.format == "avi" && m.valid)
    assert(m.width == 32 && m.height == 24)
    assert(m.durationMs == 200L)
  }

  test("sampleFrames: evenly spaced standalone JPEGs, image-pipeline ready") {
    val avi = mkAvi(7)
    val frames = AviCodec.sampleFrames(avi, 3)
    assert(frames.length == 3)
    frames.foreach { f =>
      val meta = ImageIoCodec.decode(f) // the STILL codec must accept them
      assert(meta.valid && meta.format == "jpeg")
      assert(meta.width == 32 && meta.height == 24)
    }
    // endpoints included: first sample dark, last sample bright
    def lum(f: Array[Byte]): Double = {
      val img = ImageIO.read(new ByteArrayInputStream(f))
      val rgb = img.getRGB(16, 12)
      (rgb >> 16) & 0xFF
    }
    assert(lum(frames.head) < lum(frames.last) - 100,
      "frame samples must span the dark→bright ramp")
    // oversampling clamps to available frames
    assert(AviCodec.sampleFrames(avi, 99).length == 7)
    assert(AviCodec.sampleFrames(avi, 0).isEmpty)
  }

  test("features: temporal mean of frame luminance grid, content-sensitive") {
    val dark = AviCodec.features(mkAvi(3, usPerFrame = 40000L), 16)
    val brightFrames = (0 until 3).map(_ => AviCodec.toJpeg(frame(32, 24, 230)))
    val bright = AviCodec.features(AviCodec.buildAvi(brightFrames, 32, 24), 16)
    assert(dark.length == 16 && bright.length == 16)
    assert(dark.sum < bright.sum, "luminance features must track brightness")
    // deterministic
    assert(AviCodec.features(mkAvi(3), 16).toSeq ==
      AviCodec.features(mkAvi(3), 16).toSeq)
  }

  test("resize is a real transcode: AVI in, AVI out, new dims, same frames") {
    val avi = mkAvi(4)
    val out = AviCodec.resize(avi, 16, 12)
    assert(AviCodec.supports(out))
    val m = AviCodec.decode(out)
    assert(m.valid && m.width == 16 && m.height == 12)
    assert(AviCodec.sampleFrames(out, 99).length == 4)
    // throw-free contract: nonsense dims pass through
    assert(AviCodec.resize(avi, -1, 5) eq avi)
  }

  test("Annex-K DHT splice makes baseline MJPEG frames decodable") {
    val withDht = AviCodec.toJpeg(frame(32, 24, 128))
    // strip every DHT segment, as baseline MJPEG encoders do
    def stripDht(j: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(j(0)); out.write(j(1))
      var p = 2
      while (p + 4 <= j.length) {
        val marker = j(p + 1) & 0xFF
        if (marker == 0xDA) { out.write(j, p, j.length - p); p = j.length }
        else {
          val len = ((j(p + 2) & 0xFF) << 8) | (j(p + 3) & 0xFF)
          if (marker != 0xC4) out.write(j, p, 2 + len)
          p += 2 + len
        }
      }
      out.toByteArray
    }
    val bare = stripDht(withDht)
    assert(bare.length < withDht.length, "strip must remove DHT bytes")
    val fixed = AviCodec.ensureDecodable(bare)
    assert(fixed.length > bare.length, "splice must insert a DHT segment")
    val img = ImageIO.read(new ByteArrayInputStream(fixed))
    assert(img != null && img.getWidth == 32 && img.getHeight == 24)
    val rgb = img.getRGB(16, 12)
    assert(math.abs(((rgb >> 16) & 0xFF) - 128) < 16,
      "spliced-table decode must reproduce pixel content")
    // this JDK's ImageIO supplies Annex-K defaults itself for
    // table-less JPEGs — decode `bare` with those and compare every
    // pixel: proves our embedded table constants ARE the standard ones
    // (and keeps decodability JRE-vendor-independent)
    val jdkDefault = ImageIO.read(new ByteArrayInputStream(bare))
    if (jdkDefault != null) {
      val same = (0 until img.getHeight).forall { y =>
        (0 until img.getWidth).forall(x => img.getRGB(x, y) == jdkDefault.getRGB(x, y))
      }
      assert(same, "spliced tables must decode identically to Annex-K defaults")
    }
    // already-tabled JPEGs pass through untouched
    assert(AviCodec.ensureDecodable(withDht) eq withDht)
    // a bare-MJPEG AVI is valid end-to-end through the codec
    val aviBare = AviCodec.buildAvi(Seq(bare, bare), 32, 24)
    assert(AviCodec.decode(aviBare).valid)
    assert(AviCodec.features(aviBare, 8).exists(_ != 0f))
  }

  test("honest invalidity: truncation, garbage frames, non-MJPEG, no throw") {
    val avi = mkAvi(3)
    // container parses but frames are not JPEG (stands in for H.264)
    val junkFrames = Seq(Array.fill[Byte](200)(0x5A), Array.fill[Byte](180)(0x33))
    val junk = AviCodec.buildAvi(junkFrames, 32, 24)
    val mj = AviCodec.decode(junk)
    assert(!mj.valid, "undecodable frames must not claim featurizable")
    assert(AviCodec.features(junk, 8).forall(_ == 0f))
    assert(AviCodec.resize(junk, 8, 8) eq junk)
    // truncated container
    val m1 = AviCodec.decode(avi.take(40))
    assert(!m1.valid)
    // not an AVI at all
    assert(!AviCodec.decode("hello".getBytes("UTF-8")).valid)
    assert(AviCodec.decode(null).valid == false)
    assert(AviCodec.sampleFrames(avi.take(40), 3).isEmpty)
  }

  test("AutoCodec sniffs AVI and dispatches to the real video codec") {
    val avi = mkAvi(2)
    val m = AutoCodec.decode(avi)
    assert(m.format == "avi" && m.valid && m.width == 32)
    assert(AutoCodec.sampleFrames(avi, 2).length == 2)
  }
}
