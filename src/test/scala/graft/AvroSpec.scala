package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.formats.Avro

class AvroSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"avro_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("day", DateType, nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  test("round-trips every supported type including nulls, bit-exact") {
    val ts = Timestamp.valueOf("2024-03-05 06:07:08.123456")
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, ts, Date.valueOf("2024-03-05"),
        Array[Byte](1, 2, -3)),
      Row(2L, null, null, null, null, null, null),
      Row(3L, "", 0.0, false, Timestamp.valueOf("1999-12-31 23:59:59.000001"),
        Date.valueOf("1970-01-01"), Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("rt")
    assert(Avro.write(df, dir) == 3L)
    val back = Avro.read(spark, dir, Some(schema))
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getString(1) == "alpha")
    assert(back(0).getTimestamp(4) == ts) // micros survive exactly
    assert(back(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, -3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(4) && back(1).isNullAt(6))
    assert(back(2).getTimestamp(4) ==
      Timestamp.valueOf("1999-12-31 23:59:59.000001"))
    assert(back(2).getDate(5) == Date.valueOf("1970-01-01"))
  }

  test("schema is self-describing: read without a caller schema") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, "x", 2.5, true,
        Timestamp.valueOf("2024-01-01 00:00:00"), Date.valueOf("2024-01-02"),
        Array[Byte](9))), 1), schema)
    val dir = tmp("selfdesc")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 1)
  }

  test("writer emits one container per partition; reader one task per file") {
    val df = spark.range(0, 100, 1, 5)
      .selectExpr("id", "CAST(id AS STRING) AS s")
    val dir = tmp("parts")
    assert(Avro.write(df, dir) == 100L)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 5, files.map(_.getName).mkString(","))
    val back = Avro.read(spark, dir)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 100L).sum)
  }

  test("TimestampNTZ round-trips through local-timestamp-micros") {
    val df = spark.sql(
      "SELECT id, timestamp_ntz'2024-06-07 08:09:10.654321' + " +
        "make_interval(0,0,0,0,0,0,id) AS t FROM range(3)")
    assert(df.schema("t").dataType == TimestampNTZType)
    val dir = tmp("ntz")
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema("t").dataType == TimestampNTZType)
    assert(back.orderBy("id").collect().map(_.get(1).toString).toSeq ==
      Seq("2024-06-07T08:09:10.654321", "2024-06-07T08:09:11.654321",
        "2024-06-07T08:09:12.654321"))
  }

  test("rejects unsupported Spark types loudly") {
    val bad = spark.range(1).selectExpr("array(id) AS a")
    intercept[IllegalArgumentException](Avro.write(bad, tmp("bad")))
  }
}
