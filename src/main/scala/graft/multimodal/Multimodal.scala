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
  * !!! The codecs themselves are STUBS — this container has no image/
  * audio libraries, so `decodeMeta`/`extractFeatures`/`resize`/
  * `sampleFrames` parse a deterministic fake header (`GMM1` magic) or
  * derive pseudo-content from a hash. The Spark-side contracts —
  * schemas, batch iteration, partition sizing, null passthrough — are
  * real and tested; swapping a real codec into `StubCodec` changes no
  * plumbing.
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

  /** The stub "codec": real codecs (JPEG/PNG/WAV decoders) slot in
    * behind exactly this interface.
    */
  object StubCodec {
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
    val f = udf((bytes: Array[Byte]) => StubCodec.decode(bytes))
    df.withColumn("meta", f(col(binCol)))
  }

  /** Feature extraction: adds `embedding array<float>` — composable
    * with graft.operators.Similarity (cosine top-k / ANN).
    */
  def extractFeatures(df: DataFrame, binCol: String = "content",
                      dim: Int = 64): DataFrame = {
    val f = udf((bytes: Array[Byte]) => StubCodec.features(bytes, dim))
    df.withColumn("embedding", f(col(binCol)))
  }

  /** Resize: adds `resized binary`. */
  def resize(df: DataFrame, w: Int, h: Int,
             binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) null else StubCodec.resize(bytes, w, h))
    df.withColumn("resized", f(col(binCol)))
  }

  /** Frame sampling: adds `frames array<binary>`. */
  def sampleFrames(df: DataFrame, n: Int,
                   binCol: String = "content"): DataFrame = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) null else StubCodec.sampleFrames(bytes, n))
    df.withColumn("frames", f(col(binCol)))
  }
}
