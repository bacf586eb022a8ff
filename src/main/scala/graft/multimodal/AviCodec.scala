package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import graft.multimodal.Multimodal.MediaMeta

/** Real video codec for MJPEG-in-AVI on pure JDK — no external
  * libraries. Closes the last third of the media stub (images r3,
  * audio r4): the JDK ships no inter-frame video decoder, but
  * Motion-JPEG stores every frame as an independent JPEG, which
  * `javax.imageio` decodes. Container parsing (RIFF/AVI) is ~100 lines
  * of little-endian chunk walking; anything that is an AVI but not
  * MJPEG (H.264 etc.) reports `valid=false` honestly instead of
  * pretending.
  *
  *  - `decode` walks chunk headers only (avih/strh/strf + frame chunk
  *    offsets; no pixel decode) plus ONE bounded first-frame decode to
  *    make `valid` mean "features are real" (the WavCodec rule: a
  *    payload we cannot featurize must not flow downstream valid with
  *    an all-zero embedding and become everyone's nearest neighbor).
  *  - `features` = elementwise mean of the still-image luminance-grid
  *    signature over ≤4 evenly-spaced frames — temporal average of the
  *    exact signature stills get, so mixed image/video corpora embed
  *    into one comparable space for the Similarity ops.
  *  - `resize` re-encodes every frame through the image resampler and
  *    rebuilds the container (a real transcode, AVI in → AVI out).
  *  - `sampleFrames` cuts n evenly-spaced frames as STANDALONE JPEGs —
  *    video frame-sampling feeds the still-image pipeline directly.
  *
  * Baseline MJPEG omits the Huffman tables from each frame (the spec
  * says decoders use the default tables from ITU T.81 Annex K, public
  * standard). Some ImageIO implementations supply those defaults
  * themselves, some refuse table-less JPEGs; `ensureDecodable` splices
  * the standard DHT segment in before the scan — the classic MJPEG
  * interop fix — so decodability never depends on the JRE vendor
  * (AviSpec proves the embedded constants decode pixel-identically to
  * the JDK's own defaults).
  *
  * The reference has no media handling at all (SURVEY.md §2.6
  * north-star surface).
  */
object AviCodec extends MediaCodec {

  /** RIFF....AVI magic. */
  def supports(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  // ---------------------------------------------------------------- parse

  /** Header fields + frame-chunk spans (offsets into the payload —
    * frames are sliced lazily, never copied during the walk).
    */
  private case class Avi(width: Int, height: Int, usPerFrame: Long,
                         totalFrames: Long, handler: String,
                         frames: Vector[(Int, Int)])

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Defensive RIFF walk: every chunk is bounds-checked; malformed
    * input yields None, never an exception (throw-free contract).
    */
  private def parse(bytes: Array[Byte]): Option[Avi] = {
    if (!supports(bytes)) return None
    try {
      var width = 0; var height = 0
      var usPerFrame = 0L; var totalFrames = 0L
      var scale = 0L; var rate = 0L; var strhLen = 0L
      var handler = ""
      var inVideoStream = false
      val frames = Vector.newBuilder[(Int, Int)]
      val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt

      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourcc(bytes, p)
          val sz = u32(bytes, p + 4)
          val dataStart = p + 8
          if (sz < 0 || dataStart + sz > to) return // truncated chunk
          val dataEnd = (dataStart + sz).toInt
          id match {
            case "LIST" if sz >= 4 =>
              // recurse into hdrl/strl/movi/rec lists uniformly
              walk(dataStart + 4, dataEnd)
            case "avih" if sz >= 40 =>
              usPerFrame = u32(bytes, dataStart)
              totalFrames = u32(bytes, dataStart + 16)
              width = u32(bytes, dataStart + 32).toInt
              height = u32(bytes, dataStart + 36).toInt
            case "strh" if sz >= 36 =>
              // track whether the FOLLOWING strf belongs to the video
              // stream (audio streams carry WAVEFORMATEX, not dims)
              inVideoStream = fourcc(bytes, dataStart) == "vids"
              if (inVideoStream) {
                handler = fourcc(bytes, dataStart + 4).trim
                scale = u32(bytes, dataStart + 20)
                rate = u32(bytes, dataStart + 24)
                strhLen = u32(bytes, dataStart + 32)
              }
            case "strf" if inVideoStream && sz >= 24 =>
              if (width == 0) width = u32(bytes, dataStart + 4).toInt
              if (height == 0)
                height = math.abs(u32(bytes, dataStart + 8).toInt)
              val comp = fourcc(bytes, dataStart + 16).trim
              if (comp.nonEmpty && handler.isEmpty) handler = comp
            case c if c.endsWith("dc") || c.endsWith("db") =>
              // ##dc / ##db: compressed / uncompressed frame data for
              // stream ## (we keep stream 00 = first video stream)
              if (c.startsWith("00") && sz > 0)
                frames += ((dataStart, sz.toInt))
            case _ => // ignore idx1, JUNK, vendor chunks
          }
          p = dataEnd + (sz & 1L).toInt // chunks pad to even
        }
      }

      walk(12, end)
      if (rate > 0 && scale > 0) usPerFrame = scale * 1000000L / rate
      if (strhLen > 0) totalFrames = strhLen
      val fs = frames.result()
      if (totalFrames == 0) totalFrames = fs.length.toLong
      Some(Avi(width, height, usPerFrame, totalFrames, handler, fs))
    } catch { case NonFatal(_) => None }
  }

  // --------------------------------------------- MJPEG DHT interop fix

  /** Standard JPEG Huffman tables, ITU-T T.81 Annex K (Tables K.3-K.6,
    * public standard) packed as one DHT segment payload: baseline MJPEG
    * frames omit them and expect the decoder to supply these defaults.
    */
  private lazy val standardDht: Array[Byte] = {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val dcLumBits = hex("00010501010101010100000000000000")
    val dcVals = hex("000102030405060708090a0b")
    val dcChrBits = hex("00030101010101010101010000000000")
    val acLumBits = hex("0002010303020403050504040000017d")
    val acLumVals = hex(
      "01020300041105122131410613516107227114328191a1082342b1c11552" +
      "d1f02433627282090a161718191a25262728292a3435363738393a434445" +
      "464748494a535455565758595a636465666768696a737475767778797a83" +
      "8485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6" +
      "b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8" +
      "e9eaf1f2f3f4f5f6f7f8f9fa")
    val acChrBits = hex("00020102040403040705040400010277")
    // AC chrominance values, Table K.6 (162 entries)
    val acChrVals = hex(
      "000102031104052131061241510761711322328108144291a1b1c1092333" +
      "52f0156272d10a162434e125f11718191a262728292a35363738393a4344" +
      "45464748494a535455565758595a636465666768696a737475767778797a" +
      "82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4" +
      "b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7" +
      "e8e9eaf2f3f4f5f6f7f8f9fa")
    val bos = new ByteArrayOutputStream()
    def table(clazz: Int, id: Int, bits: Array[Byte], vals: Array[Byte]): Unit = {
      bos.write((clazz << 4) | id); bos.write(bits, 0, bits.length)
      bos.write(vals, 0, vals.length)
    }
    table(0, 0, dcLumBits, dcVals)   // DC luminance
    table(0, 1, dcChrBits, dcVals)   // DC chrominance
    table(1, 0, acLumBits, acLumVals) // AC luminance
    table(1, 1, acChrBits, acChrVals) // AC chrominance
    bos.toByteArray
  }

  /** Splice the standard DHT before SOS when a JPEG carries none —
    * returns the input unchanged when it already has tables (or is not
    * a parseable JPEG; downstream decode then fails cleanly).
    */
  def ensureDecodable(jpeg: Array[Byte]): Array[Byte] = {
    if (jpeg == null || jpeg.length < 4 ||
        (jpeg(0) & 0xFF) != 0xFF || (jpeg(1) & 0xFF) != 0xD8) return jpeg
    var p = 2
    while (p + 4 <= jpeg.length) {
      if ((jpeg(p) & 0xFF) != 0xFF) return jpeg // marker desync
      val marker = jpeg(p + 1) & 0xFF
      if (marker == 0xC4) return jpeg // has a DHT already
      if (marker == 0xDA) { // SOS: no DHT seen — splice here
        val dht = standardDht
        val out = new Array[Byte](jpeg.length + 4 + dht.length)
        System.arraycopy(jpeg, 0, out, 0, p)
        out(p) = 0xFF.toByte; out(p + 1) = 0xC4.toByte
        val len = dht.length + 2
        out(p + 2) = ((len >> 8) & 0xFF).toByte
        out(p + 3) = (len & 0xFF).toByte
        System.arraycopy(dht, 0, out, p + 4, dht.length)
        System.arraycopy(jpeg, p, out, p + 4 + dht.length, jpeg.length - p)
        return out
      }
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { p += 2 }
      else {
        val segLen = ((jpeg(p + 2) & 0xFF) << 8) | (jpeg(p + 3) & 0xFF)
        if (segLen < 2) return jpeg
        p += 2 + segLen
      }
    }
    jpeg
  }

  private def frameBytes(bytes: Array[Byte], span: (Int, Int)): Array[Byte] =
    ensureDecodable(java.util.Arrays.copyOfRange(bytes, span._1, span._1 + span._2))

  private def decodeFrame(bytes: Array[Byte], span: (Int, Int)): Option[BufferedImage] =
    // via the thread-local cached JPEG reader (ImageIoCodec.readImage):
    // ImageIO.read's per-call registry scan serializes 32-thread frame
    // decoding on the registry lock
    ImageIoCodec.readImage(frameBytes(bytes, span))

  // ------------------------------------------------------------- codec

  def decode(bytes: Array[Byte]): MediaMeta = parse(bytes) match {
    case None => MediaMeta("unknown", 0, 0, 0L, valid = false)
    case Some(avi) =>
      val durMs = avi.usPerFrame * avi.totalFrames / 1000L
      // valid = featurizable: at least one frame and the first one
      // actually decodes (bounded one-frame check; H.264-in-AVI etc.
      // parse fine as a container but must not claim valid)
      val ok = avi.frames.nonEmpty &&
        avi.frames.headOption.exists(decodeFrame(bytes, _).isDefined)
      MediaMeta("avi", avi.width, avi.height, durMs, valid = ok)
  }

  /** Evenly-spaced picks including both endpoints (the ImageIoCodec
    * GIF-frame rule).
    */
  private def spacedIdx(total: Int, n: Int): Seq[Int] = {
    val take = math.min(math.max(n, 0), total)
    (0 until take).map(i => if (take <= 1) 0 else i * (total - 1) / (take - 1))
  }

  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (dim <= 0) return Array.empty
    val out = new Array[Float](dim)
    parse(bytes).foreach { avi =>
      var n = 0
      spacedIdx(avi.frames.length, 4).distinct.foreach { i =>
        val f = ImageIoCodec.features(frameBytes(bytes, avi.frames(i)), dim)
        if (f.exists(_ != 0f)) {
          var j = 0
          while (j < dim) { out(j) += f(j); j += 1 }
          n += 1
        }
      }
      if (n > 1) { var j = 0; while (j < dim) { out(j) /= n; j += 1 } }
    }
    out
  }

  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    // throw-free: nonsense dims or undecodable input pass through
    if (w <= 0 || h <= 0) bytes
    else parse(bytes) match {
      case Some(avi) if avi.frames.nonEmpty =>
        val resized = new ArrayBuffer[Array[Byte]](avi.frames.length)
        avi.frames.foreach { span =>
          decodeFrame(bytes, span) match {
            case Some(img) => resized += toJpeg(scaleTo(img, w, h))
            case None => return bytes // one bad frame ⇒ keep original
          }
        }
        buildAvi(resized.toSeq, w, h,
          if (avi.usPerFrame > 0) avi.usPerFrame else 40000L)
      case _ => bytes
    }

  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (n <= 0) return Seq.empty
    parse(bytes) match {
      case Some(avi) if avi.frames.nonEmpty =>
        spacedIdx(avi.frames.length, n).map(i => frameBytes(bytes, avi.frames(i)))
      case _ => Seq.empty
    }
  }

  // ----------------------------------------------------------- writer

  private def scaleTo(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = dst.createGraphics()
    try {
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
    } finally g2.dispose()
    dst
  }

  // One JPEG writer per thread — ImageIO.write's per-call registry
  // scan serializes 32-thread frame encoding on the registry lock
  // (same issue as the read side, see ImageIoCodec.readImage).
  private val jpegWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("jpeg").next()
  }

  /** JPEG-encode one frame (JDK writer always embeds its DHT, so our
    * own output never needs the Annex-K splice).
    */
  def toJpeg(img: BufferedImage): Array[Byte] = {
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else scaleTo(img, img.getWidth, img.getHeight)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val w = jpegWriter.get()
    try { w.setOutput(ios); w.write(rgb) }
    catch { case NonFatal(e) =>
      // a writer that threw has suspect state: drop it for this thread
      jpegWriter.remove(); w.dispose(); throw e
    } finally ios.close()
    bos.toByteArray
  }

  /** One MJPEG frame as an 8×8 grid of constant-gray blocks (`block`
    * pixels square, so a 64×64 frame at the default) — the
    * deterministic frame synthesizer behind q162's video dedup, twin
    * of [[Multimodal.renderGray8x8]]. JPEG is lossy, so unlike the PNG
    * path exactness is by MARGIN, not by bit: averageHash64 area-means
    * each block back into one grid cell, which averages the codec's
    * ringing to a few luminance levels, while the synthesized patterns
    * keep every decision ≥ 3×255 away from the mean threshold
    * (cells are 0/255 with 4 forced-high + 4 forced-low cells, so the
    * high count stays in [4, 60]) — MultimodalSpec verifies the
    * round-trip over the full verify-scale corpus.
    */
  def renderBlockFrame(cells: Seq[Int], block: Int = 8): Array[Byte] = {
    val g = 8
    val side = g * block
    val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val c = (y / block) * g + (x / block)
        val v0 = if (cells != null && c < cells.length) cells(c) else 0
        val v = math.max(0, math.min(255, v0))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    toJpeg(img)
  }

  /** Minimal spec-complete MJPEG AVI writer: RIFF(hdrl(avih,
    * strl(strh,strf)), movi(00dc…), idx1). Used by `resize` (real
    * transcode out) and by specs to fabricate inputs byte-up.
    */
  def buildAvi(jpegFrames: Seq[Array[Byte]], w: Int, h: Int,
               usPerFrame: Long = 40000L): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) 1 else 0
      val out = new Array[Byte](8 + data.length + pad)
      System.arraycopy(id.getBytes("US-ASCII"), 0, out, 0, 4)
      System.arraycopy(le32(data.length.toLong), 0, out, 4, 4)
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    def list(kind: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val body = new ByteArrayOutputStream()
      body.write(kind.getBytes("US-ASCII"))
      parts.foreach(body.write)
      chunk("LIST", body.toByteArray)
    }
    val nFrames = jpegFrames.length
    val maxFrame = if (nFrames == 0) 0 else jpegFrames.map(_.length).max
    val fps = if (usPerFrame > 0) 1000000L / usPerFrame else 25L
    val avih = {
      val b = new ByteArrayOutputStream()
      Seq(usPerFrame, maxFrame.toLong * fps, 0L, 0x10L /* HASINDEX */,
        nFrames.toLong, 0L, 1L, maxFrame.toLong, w.toLong, h.toLong,
        0L, 0L, 0L, 0L).foreach(v => b.write(le32(v)))
      chunk("avih", b.toByteArray)
    }
    val strh = {
      val b = new ByteArrayOutputStream()
      b.write("vids".getBytes("US-ASCII"))
      b.write("MJPG".getBytes("US-ASCII"))
      // flags, prio+lang, initialFrames, scale, rate, start, length,
      // bufSize, quality, sampleSize, rcFrame(4×u16 → two u32)
      Seq(0L, 0L, 0L, usPerFrame, 1000000L, 0L, nFrames.toLong,
        maxFrame.toLong, 0xFFFFFFFFL, 0L).foreach(v => b.write(le32(v)))
      b.write(le32(0)); b.write(le32((h.toLong << 16) | w.toLong))
      chunk("strh", b.toByteArray)
    }
    val strf = {
      val b = new ByteArrayOutputStream()
      Seq(40L, w.toLong, h.toLong).foreach(v => b.write(le32(v)))
      b.write(Array(1.toByte, 0.toByte, 24.toByte, 0.toByte)) // planes=1, 24bpp
      b.write("MJPG".getBytes("US-ASCII"))
      Seq(w.toLong * h * 3, 0L, 0L, 0L, 0L).foreach(v => b.write(le32(v)))
      chunk("strf", b.toByteArray)
    }
    val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
    val frameChunks = jpegFrames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks)
    val idx1 = {
      val b = new ByteArrayOutputStream()
      var off = 4L // offsets are relative to the start of 'movi' data
      jpegFrames.foreach { f =>
        b.write("00dc".getBytes("US-ASCII"))
        b.write(le32(0x10L)) // AVIIF_KEYFRAME — every MJPEG frame is one
        b.write(le32(off)); b.write(le32(f.length.toLong))
        off += 8 + f.length + (f.length & 1)
      }
      chunk("idx1", b.toByteArray)
    }
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write(hdrl); body.write(movi); body.write(idx1)
    val payload = body.toByteArray
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(payload.length.toLong))
    bos.write(payload)
    bos.toByteArray
  }
}
