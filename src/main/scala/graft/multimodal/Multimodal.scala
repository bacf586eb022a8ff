package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside — the parquet/shuffle layer never interprets them.
  * Decode / feature-extract / resize / frame-sample run as typed Scala
  * UDFs over ONLY the binary column: the rest of the row never leaves
  * Tungsten (an `df.rdd.mapPartitions` round-trip would deserialize
  * every column and break whole-stage codegen around the operator).
  * Per-partition codec state (a real decoder instance) amortizes via a
  * lazy transient val in the codec object.
  *
  * Codecs: STILL IMAGES ARE REAL — `ImageIoCodec` (pure-JDK
  * javax.imageio) decodes PNG/JPEG/GIF/BMP with header-only metadata
  * reads, bilinear resampling and luminance-grid features. AUDIO IS
  * REAL for WAV — `WavCodec` (pure-JDK javax.sound.sampled): header-only
  * metadata, windowed RMS + zero-crossing features, segment sampling.
  * VIDEO IS REAL for MJPEG-in-AVI — `AviCodec` (RIFF walk + per-frame
  * javax.imageio decode, Annex-K DHT splice for baseline MJPEG);
  * inter-frame codecs the JDK cannot decode (H.264 …) report
  * `valid=false` honestly. `AutoCodec` sniffs magic bytes and
  * dispatches per payload; `StubCodec` remains only for the `GMM1`
  * test format exercising the contract plumbing.
  *
  * Scale notes: binaryFile scans support pathGlobFilter/pruning;
  * payloads ride shuffles only when explicitly selected; partition
  * sizing for ~even decode cost uses byte-size repartitioning (media
  * files are wildly skewed — row-count partitioning is wrong).
  */
object Multimodal {

  val Magic: Array[Byte] = "GMM1".getBytes("US-ASCII")

  case class MediaMeta(format: String, width: Int, height: Int,
                       durationMs: Long, valid: Boolean)

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("durationMs", LongType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))

  /** Magic-sniffing dispatcher: JDK-decodable image payloads go through
    * the real `ImageIoCodec`, RIFF/WAVE audio through the real
    * `WavCodec`; everything else (incl. the `GMM1` test format standing
    * in for video) through `StubCodec`.
    */
  object AutoCodec extends MediaCodec {
    private def pick(bytes: Array[Byte]): MediaCodec =
      if (ImageIoCodec.supports(bytes)) ImageIoCodec
      else if (WavCodec.supports(bytes)) WavCodec
      else if (AviCodec.supports(bytes)) AviCodec
      else StubCodec
    def decode(bytes: Array[Byte]): MediaMeta = pick(bytes).decode(bytes)
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      pick(bytes).features(bytes, dim)
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      pick(bytes).resize(bytes, w, h)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      pick(bytes).sampleFrames(bytes, n)
  }

  /** The stub codec for formats with no in-container decoder (audio/
    * video): parses the deterministic fake `GMM1` header so plumbing
    * contracts stay testable end-to-end.
    */
  object StubCodec extends MediaCodec {
    /** Parse the fake header: GMM1 | fmt(4) | w(4) | h(4) | durMs(8). */
    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.length < 24 ||
          !bytes.take(4).sameElements(Magic))
        return MediaMeta("unknown", 0, 0, 0L, valid = false)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.position(4)
      val fmt = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII").trim
      }
      MediaMeta(fmt, bb.getInt(), bb.getInt(), bb.getLong(), valid = true)
    }

    /** Deterministic fake feature vector from content bytes (stands in
      * for a CNN/audio embedding; feeds the REAL similarity ops).
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (dim <= 0) return Array.empty
      val out = new Array[Float](dim)
      var h = 0x9E3779B97F4A7C15L
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001B3L; i += 1 }
      }
      var j = 0
      var z = h
      while (j < dim) {
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        out(j) = ((z >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
        j += 1
      }
      out
    }

    /** Fake resize: re-encode header with new dims, keep a content
      * checksum byte trail (real impl: decoded-pixels resample).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val m = decode(bytes)
      encode(m.format, w, h, m.durationMs,
        payload = if (bytes.length > 24) bytes.drop(24).take(16) else Array.empty)
    }

    /** Fake frame sampler: n copies of the resized-to-thumbnail bytes. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      (0 until n).map(i => resize(bytes, 32 + i, 32 + i))

    def encode(fmt: String, w: Int, h: Int, durMs: Long,
               payload: Array[Byte] = Array.empty): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.put(Magic).put(fmt.padTo(4, ' ').take(4).getBytes("US-ASCII"))
        .putInt(w).putInt(h).putLong(durMs).put(payload)
      bb.array()
    }
  }

  /** Read media files as (path, modificationTime, length, content). */
  def readBinary(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    graft.sources.Sources.binary(spark, dir, glob)

  /** Repartition so each task decodes ~targetBytes of payload —
    * size-based, not row-based, because media sizes are skewed.
    */
  def partitionByBytes(df: DataFrame, lengthCol: String,
                       targetBytes: Long): DataFrame = {
    val total = df.agg(sum(col(lengthCol))).head().getLong(0)
    val parts = math.max(1, math.min(Int.MaxValue.toLong,
      (total + targetBytes - 1) / targetBytes)).toInt
    df.repartition(parts)
  }

  /** Decode metadata: adds a `meta` struct column. Struct-returning
    * UDF over the binary column only — the plan stays in Catalyst.
    */
  def decodeMeta(df: DataFrame, binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => AutoCodec.decode(bytes))
    df.withColumn("meta", f(col(binCol)))
  }

  /** Feature extraction: adds `embedding array<float>` — composable
    * with graft.operators.Similarity (cosine top-k / ANN).
    */
  def extractFeatures(df: DataFrame, binCol: String = "content",
                      dim: Int = 64): DataFrame = {
    val f = udf((bytes: Array[Byte]) => AutoCodec.features(bytes, dim))
    df.withColumn("embedding", f(col(binCol)))
  }

  /** Resize: adds `resized binary`. */
  def resize(df: DataFrame, w: Int, h: Int,
             binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) null else AutoCodec.resize(bytes, w, h))
    df.withColumn("resized", f(col(binCol)))
  }

  /** Frame sampling: adds `frames array<binary>`. */
  def sampleFrames(df: DataFrame, n: Int,
                   binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) null else AutoCodec.sampleFrames(bytes, n))
    df.withColumn("frames", f(col(binCol)))
  }

  /** Render 64 gray levels (0..255, row-major) as a REAL 8×8 PNG —
    * the deterministic image synthesizer behind q149's perceptual-hash
    * dedup: numeric columns become genuine codec-decodable payloads, so
    * the downstream pipeline (decode → grid luminance → average-hash)
    * exercises the true image path, while a SQL oracle can still derive
    * the expected hash from the input ints (PNG is lossless, and with
    * one pixel per grid cell the decoded cell means are exactly the
    * inputs). Out-of-range / short input is clamped / zero-padded —
    * throw-free like the codecs.
    */
  def renderGray8x8(levels: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val v0 = if (levels != null && i < levels.length) levels(i) else 0
      val v = math.max(0, math.min(255, v0))
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual hashing: adds `phash long` (see
    * [[ImageIoCodec.averageHash64]]) — feeds
    * [[graft.operators.Dedup.fingerprintDuplicatePairs]].
    */
  def perceptualHash(df: DataFrame, binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) 0L else ImageIoCodec.averageHash64(bytes))
    df.withColumn("phash", f(col(binCol)))
  }

  /** Type-dispatched media fingerprints: sniffs each payload and adds
    * `kind` (image/audio/video/unknown), `fp` (60-bit perceptual /
    * mean-energy hash for stills and WAV) and `fhs` (per-frame hash
    * array for MJPEG/AVI). One narrow UDF pass over the binary column
    * only — throw-free, unknown payloads tagged rather than killed.
    */
  def mediaFingerprints(df: DataFrame, binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) ("unknown", 0L, Seq.empty[Long])
      else if (WavCodec.supports(bytes))
        ("audio", WavCodec.audioFingerprint60(bytes), Seq.empty[Long])
      else if (AviCodec.supports(bytes))
        ("video", 0L,
          AviCodec.sampleFrames(bytes, 4).map(ImageIoCodec.averageHash64))
      else if (ImageIoCodec.sniff(bytes).isDefined)
        ("image", ImageIoCodec.averageHash64(bytes), Seq.empty[Long])
      else ("unknown", 0L, Seq.empty[Long]))
    df.withColumn("__mfp", f(col(binCol)))
      .withColumn("kind", col("__mfp._1"))
      .withColumn("fp", col("__mfp._2"))
      .withColumn("fhs", col("__mfp._3"))
      .drop("__mfp")
  }

  /** Mixed-corpus media near-dup: each modality goes to ITS dedup
    * family — stills and audio to the banded-hamming fingerprint join
    * (hamming distance on the 60-bit hash ≤ maxDist), video to the
    * positional frame-hash band join (dist = frames that differ,
    * ≤ 4 - minShared) — and the three pair sets union with a `kind`
    * tag. Modalities can never cross-match (separate joins), every
    * join is banded with the hub cut — never all-pairs on media, and
    * the codec UDFs see only (id, binary) narrow rows.
    */
  def mediaDuplicatePairs(df: DataFrame, idCol: String,
                          binCol: String = "content", maxDist: Int = 3,
                          minShared: Int = 3,
                          maxBucket: Int = 256): DataFrame = {
    import graft.operators.Dedup
    val fps = mediaFingerprints(df.select(col(idCol), col(binCol)), binCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairsOf(kind: String) = Dedup.fingerprintDuplicatePairs(
        fps.filter(col("kind") === kind)
          .select(col(idCol).as("id"), col("fp")), maxDist, maxBucket)
      .withColumn("kind", lit(kind))
    val video = Dedup.frameHashDuplicatePairs(
        fps.filter(col("kind") === "video")
          .select(col(idCol).as("id"), col("fhs")), minShared, maxBucket)
      .select(col("idA"), col("idB"),
        (lit(4) - col("shared")).cast("int").as("dist"))
      .withColumn("kind", lit("video"))
    pairsOf("image").unionByName(pairsOf("audio")).unionByName(video)
  }
}
