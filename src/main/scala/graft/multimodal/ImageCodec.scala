package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import scala.util.control.NonFatal

import graft.multimodal.Multimodal.MediaMeta

/** Codec contract the multimodal UDFs program against. Implementations
  * must be deterministic, null-safe and throw-free: a corrupt payload
  * yields `valid=false` / empty output, never an executor-killing
  * exception (one bad file in a 100 TB crawl must not fail the stage).
  */
trait MediaCodec extends Serializable {
  def decode(bytes: Array[Byte]): MediaMeta
  def features(bytes: Array[Byte], dim: Int): Array[Float]
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
}

/** Real still-image codec on pure-JDK `javax.imageio` — no external
  * libraries. Handles PNG / JPEG / GIF / BMP (the formats the JDK ships
  * readers for; format is sniffed from magic bytes, never from file
  * names).
  *
  *  - `decode` reads ONLY the header (ImageReader.getWidth/getHeight
  *    peek dimensions without a pixel decode) — metadata scans over big
  *    corpora don't pay for decompression.
  *  - `features` is a g×g mean-luminance grid over the decoded pixels,
  *    normalized to [-0.5, 0.5] — a deterministic perceptual signature
  *    that feeds the real Similarity ops (cosine top-k, ANN, near-dup).
  *  - `resize` is a bilinear resample re-encoded as PNG.
  *  - `sampleFrames` picks n evenly-spaced frames (multi-frame GIFs;
  *    degenerates to the single frame for stills), each a PNG.
  *
  * The reference has no media handling at all (its narrowest analogue
  * is opaque BLOB pass-through, dbitool.pl jdbc rows); this is §2.6
  * extension surface.
  */
object ImageIoCodec extends MediaCodec {

  // Per-call ImageIO disk caching is pure overhead for byte-array
  // inputs; keep everything in memory.
  ImageIO.setUseCache(false)

  /** Format from magic bytes; None = not a JDK-decodable image. */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 8) None
    else if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' &&
             bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8 &&
             (bytes(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
             bytes(3) == '8') Some("gif")
    else if (bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else None
  }

  def supports(bytes: Array[Byte]): Boolean = sniff(bytes).isDefined

  def decode(bytes: Array[Byte]): MediaMeta = sniff(bytes) match {
    case None => MediaMeta("unknown", 0, 0, 0L, valid = false)
    case Some(fmt) =>
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) MediaMeta(fmt, 0, 0, 0L, valid = false)
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              // header-only: width/height come from the stream header,
              // no pixel decode happens here.
              MediaMeta(fmt, r.getWidth(0), r.getHeight(0), 0L, valid = true)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case NonFatal(_) => MediaMeta(fmt, 0, 0, 0L, valid = false) }
  }

  // ImageIO.read scans the (synchronized) global plugin registry on
  // EVERY call — with 32 executor threads decoding thousands of small
  // frames (q149/q162) the registry lock serializes the codec work.
  // Cache one reader per format per thread; a reader that throws is
  // dropped (its internal state is suspect) and recreated next call.
  private val readerCache =
    new ThreadLocal[scala.collection.mutable.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() = scala.collection.mutable.HashMap.empty
    }

  private[multimodal] def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    sniff(bytes) match {
      case Some(fmt) =>
        try {
          val r = readerCache.get().getOrElseUpdate(fmt,
            ImageIO.getImageReadersByFormatName(fmt).next())
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          try { r.setInput(iis, true, true); Option(r.read(0)) }
          finally iis.close()
        } catch { case NonFatal(_) =>
          readerCache.get().remove(fmt).foreach(_.dispose())
          None
        }
      case None =>
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case NonFatal(_) => None }
    }

  /** g×g grid of mean luminances (0..255 scale, `NaN` for cells no
    * pixel maps into — only when w or h < g). The shared pixel pass
    * behind `features` and `averageHash64`; None = undecodable.
    */
  def gridLuminance(bytes: Array[Byte], g: Int): Option[Array[Double]] =
    readImage(bytes).map { img =>
      val sums = new Array[Double](g * g)
      val counts = new Array[Long](g * g)
      val w = img.getWidth
      val h = img.getHeight
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w) // one bulk row read per scanline
        val cy = y * g / h
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          val c = cy * g + x * g / w
          sums(c) += lum
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(g * g)(c =>
        if (counts(c) == 0) Double.NaN else sums(c) / counts(c))
    }

  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (dim <= 0) return Array.empty
    val out = new Array[Float](dim)
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    gridLuminance(bytes, g).foreach { means =>
      var i = 0
      while (i < dim) {
        val c = i % (g * g)
        out(i) = if (means(c).isNaN) 0f
          else (means(c) / 255.0 - 0.5).toFloat
        i += 1
      }
    }
    out
  }

  /** 60-bit average-hash perceptual fingerprint: 8×8 mean-luminance
    * grid, each cell rounded to an int, bit_i (i < 60) set iff
    * 64·cell_i > Σcells — i.e. the cell is brighter than the grid
    * mean, in EXACT integer arithmetic (no float threshold, so a SQL
    * oracle replays it bit-for-bit from known cell values). 60 bits so
    * the fingerprint rides the existing SimHash band machinery
    * (4 × 15-bit bands) unchanged. Undecodable payload → 0L (the
    * throw-free codec contract).
    */
  def averageHash64(bytes: Array[Byte]): Long =
    gridLuminance(bytes, 8) match {
      case None => 0L
      case Some(means) =>
        val cells = means.map(m => if (m.isNaN) 0L else math.round(m))
        val s = cells.sum
        var fp = 0L
        var i = 0
        while (i < 60) {
          if (cells(i) * 64 > s) fp |= (1L << i)
          i += 1
        }
        fp
    }

  private def toPng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    // throw-free contract: nonsense dims pass the payload through
    // rather than killing the stage from inside a UDF
    if (w <= 0 || h <= 0) bytes
    else readImage(bytes) match {
      case None => bytes
      case Some(img) =>
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try {
          g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, w, h, null)
        } finally g2.dispose()
        toPng(dst)
    }

  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (n <= 0) return Seq.empty
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val total = math.max(1,
              try r.getNumImages(true) catch { case NonFatal(_) => 1 })
            val take = math.min(n, total)
            (0 until take).map { i =>
              // evenly spaced including both endpoints
              val idx = if (take == 1) 0 else i * (total - 1) / (take - 1)
              toPng(toRgb(r.read(idx)))
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case NonFatal(_) => Seq.empty }
  }

  /** PNG writes of palette/ARGB frames are most portable via RGB. */
  private def toRgb(img: BufferedImage): BufferedImage =
    if (img.getType == BufferedImage.TYPE_INT_RGB) img
    else {
      val dst = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try g2.drawImage(img, 0, 0, null) finally g2.dispose()
      dst
    }
}
