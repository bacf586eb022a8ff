package graft.formats

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal BSON codec for flat documents — enough to reproduce the
  * reference's bsonread/bsonwrite surface (/root/reference/scripts/
  * dbitool.pl:2438-2559): ONE document `{"a": [row, row, ...]}` where
  * each row is a flat object. Hand-rolled against the public BSON spec
  * (bsonspec.org); no external dependency.
  *
  * Like the reference (which buffers the whole input, dbitool.pl:
  * 2476-2478), this is an in-memory, single-document format — the
  * scalable path is NDJSON/parquet; BSON exists for format parity.
  *
  * Supported element types: double(0x01), string(0x02), document(0x03),
  * array(0x04), bool(0x08), null(0x0A), int32(0x10), int64(0x12).
  */
object Bson {

  /** Ordered embedded document (BSON preserves field order; Scala Map
    * does not).
    */
  final case class Doc(fields: Seq[(String, Any)])

  // ---- encoding --------------------------------------------------------

  private def cstring(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private def encodeValue(name: String, v: Any): Array[Byte] = v match {
    case null => Array(0x0A.toByte) ++ cstring(name)
    case d: Double =>
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d)
      Array(0x01.toByte) ++ cstring(name) ++ b.array()
    case f: Float => encodeValue(name, f.toDouble)
    case i: Int =>
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i)
      Array(0x10.toByte) ++ cstring(name) ++ b.array()
    case l: Long =>
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l)
      Array(0x12.toByte) ++ cstring(name) ++ b.array()
    case s: String =>
      val utf = s.getBytes(StandardCharsets.UTF_8)
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(utf.length + 1)
      Array(0x02.toByte) ++ cstring(name) ++ b.array() ++ utf :+ 0.toByte
    case b: Boolean =>
      Array(0x08.toByte) ++ cstring(name) :+ (if (b) 1 else 0).toByte
    case d: Doc =>
      Array(0x03.toByte) ++ cstring(name) ++ encodeDoc(d.fields)
    case m: Map[_, _] =>
      Array(0x03.toByte) ++ cstring(name) ++
        encodeDoc(m.asInstanceOf[Map[String, Any]].toSeq)
    case xs: Seq[_] =>
      Array(0x04.toByte) ++ cstring(name) ++
        encodeDoc(xs.zipWithIndex.map { case (x, i) => i.toString -> x })
    case other =>
      throw new IllegalArgumentException(s"unsupported BSON value: $other")
  }

  def encodeDoc(fields: Seq[(String, Any)]): Array[Byte] = {
    val body = fields.flatMap { case (k, v) => encodeValue(k, v) }.toArray
    val len = 4 + body.length + 1
    ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(len).put(body).put(0.toByte).array()
  }

  /** The reference's wrapper shape: {"a": [rows...]} (dbitool.pl:2476). */
  def encodeRows(rows: Seq[Seq[(String, Any)]]): Array[Byte] =
    encodeDoc(Seq("a" -> rows.map(Doc)))

  // ---- decoding --------------------------------------------------------

  private def readCString(b: ByteBuffer): String = {
    val sb = new mutable.ArrayBuilder.ofByte
    var c = b.get()
    while (c != 0) { sb += c; c = b.get() }
    new String(sb.result(), StandardCharsets.UTF_8)
  }

  def decodeDoc(b: ByteBuffer): Seq[(String, Any)] = {
    b.order(ByteOrder.LITTLE_ENDIAN)
    val start = b.position()
    val len = b.getInt()
    val out = mutable.ArrayBuffer[(String, Any)]()
    while (b.position() < start + len - 1) {
      val tpe = b.get()
      val name = readCString(b)
      val v: Any = tpe match {
        case 0x01 => b.getDouble()
        case 0x02 =>
          val n = b.getInt()
          val arr = new Array[Byte](n - 1); b.get(arr); b.get() // NUL
          new String(arr, StandardCharsets.UTF_8)
        case 0x03 => Doc(decodeDoc(b))
        case 0x04 => decodeDoc(b).map(_._2)
        case 0x08 => b.get() != 0
        case 0x0A => null
        case 0x10 => b.getInt()
        case 0x12 => b.getLong()
        case t => throw new IllegalArgumentException(f"BSON type 0x$t%02x unsupported")
      }
      out += ((name, v))
    }
    b.get() // trailing NUL
    out.toSeq
  }

  def decodeRows(bytes: Array[Byte]): Seq[Seq[(String, Any)]] = {
    val top = decodeDoc(ByteBuffer.wrap(bytes))
    top.collectFirst { case ("a", xs: Seq[_]) =>
      xs.map(_.asInstanceOf[Doc].fields)
    }.getOrElse(Seq.empty)
  }

  // ---- Spark surface ---------------------------------------------------

  private def sparkType(v: Any): DataType = v match {
    case _: Double => DoubleType
    case _: Int => IntegerType
    case _: Long => LongType
    case _: Boolean => BooleanType
    case _ => StringType
  }

  /** bsonread: decode one BSON file → DataFrame. Schema from the first
    * row's fields (reference dbitool.pl:2479-2481). Driver-side decode,
    * matching the reference's in-memory semantics.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val rows = decodeRows(bytes)
    require(rows.nonEmpty, s"empty BSON document: $path")
    val colNames = rows.head.map(_._1)
    val fields = rows.head.map { case (k, v) => StructField(k, sparkType(v), true) }
    val data = rows.map { r =>
      val m = r.toMap
      Row.fromSeq(colNames.map(m.getOrElse(_, null)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), StructType(fields))
  }

  /** bsonwrite: DataFrame → one BSON file (in-memory accumulation,
    * reference dbitool.pl:2504-2559).
    */
  def write(df: DataFrame, path: String): Unit = {
    val cols = df.columns.toSeq
    val rows = df.collect().toSeq.map { r =>
      cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }
    }
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
    java.nio.file.Files.write(p, encodeRows(rows))
  }
}
