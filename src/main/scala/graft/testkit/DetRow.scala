package graft.testkit

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic, re-derivable test rows — the reference's TestRow
  * strategy (/root/reference/t/TestRow.pm): row *n* is a pure function
  * of *n*, and `check` re-derives any row from its first column, so a
  * round-trip through any format is self-validating with no stored
  * expected output. (Fresh derivation — splitmix64 over the row index;
  * the reference's dictionary/seed scheme is not copied. Column shapes
  * exercise the same encodings: ints, floats, ISO timestamps, hex,
  * binaryish text, punctuation-stress strings. TestRow.pm:31-47.)
  */
object DetRow {

  val schema: StructType = StructType(Seq(
    StructField("row", LongType, nullable = false),
    StructField("int32", IntegerType, nullable = false),
    StructField("dbl", DoubleType, nullable = false),
    StructField("date", TimestampType, nullable = false),
    StructField("hex", StringType, nullable = false),
    StructField("stress", StringType, nullable = false),
    StructField("words", StringType, nullable = false)))

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val dict = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private val stressChars = ",\";'\\|&<>\t é中✓%$#@!"

  /** Row n, derived entirely from n. */
  def derive(n: Long): Row = {
    val s = mix(n)
    val i32 = (s >>> 16).toInt
    val dbl = (mix(s) >>> 11).toDouble / (1L << 53).toDouble * 1e6
    // timestamps in 2000-2029, µs precision
    val us = 946684800000000L + Math.floorMod(mix(s + 1), 30L * 365 * 86400) * 1000000L +
      Math.floorMod(mix(s + 2), 1000000L)
    val ts = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt); t
    }
    val hex = java.lang.Long.toHexString(s)
    val stress = (0 until 8).map { k =>
      stressChars(Math.floorMod(mix(s + 3 + k), stressChars.length.toLong).toInt)
    }.mkString
    val words = (0 until 4).map { k =>
      dict(Math.floorMod(mix(s + 11 + k), dict.length.toLong).toInt)
    }.mkString(" ")
    Row(n, i32, dbl, ts, hex, stress, words)
  }

  /** Round-trip oracle (TestRow.pm:50-57): re-derive from row(0) and
    * compare every field; throws on the first mismatch.
    */
  def check(r: Row): Unit = {
    val expect = derive(r.getLong(0))
    require(r == expect, s"row ${r.getLong(0)} corrupted:\n  got $r\n  want $expect")
  }

  def frame(spark: SparkSession, n: Int, partitions: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize((0L until n.toLong).map(derive), partitions),
      schema)
}
