package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.formats.Bson

class BsonSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("byte-level encoding matches the BSON spec for a known doc") {
    // {"x": 1} per bsonspec.org: \x0c\x00\x00\x00\x10x\x00\x01\x00\x00\x00\x00
    val bytes = Bson.encodeDoc(Seq("x" -> 1))
    assert(bytes.toSeq == Seq[Byte](0x0c, 0, 0, 0, 0x10, 'x'.toByte, 0, 1, 0, 0, 0, 0))
    // {"hello": "world"} = \x16... \x02hello\x00\x06\x00\x00\x00world\x00\x00
    val hw = Bson.encodeDoc(Seq("hello" -> "world"))
    assert(hw.length == 0x16 && hw(0) == 0x16 && hw(4) == 0x02)
  }

  test("encode/decode round-trip across all supported types") {
    val rows = Seq(
      Seq("i" -> 42, "l" -> 9999999999L, "d" -> 3.25, "s" -> "héllo ✓",
        "b" -> true, "n" -> null),
      Seq("i" -> -1, "l" -> 0L, "d" -> -0.5, "s" -> "", "b" -> false, "n" -> null))
    val decoded = Bson.decodeRows(Bson.encodeRows(rows))
    assert(decoded == rows)
  }

  test("DataFrame round-trip through a BSON file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bson").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.0))
      .toDF("id", "name", "score")
    Bson.write(df, s"$dir/data.bson")
    val back = Bson.read(spark, s"$dir/data.bson")
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("pipeline bsonwrite -> bsonread round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bsonp").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"), "k,v\n1,a\n2,b")
    graft.pipeline.Pipeline.run(spark, Seq(
      s"fileread:in=$dir/in.csv", "csvread", s"bsonwrite:out=$dir/d.bson"))
    graft.pipeline.Pipeline.run(spark, Seq(
      s"bsonread:in=$dir/d.bson", "csvwrite", s"filewrite:out=$dir/out.csv"))
    val f = new java.io.File(s"$dir/out.csv").listFiles()
      .filter(_.getName.startsWith("part-")).head
    assert(scala.io.Source.fromFile(f).getLines().toSeq == Seq("k,v", "1,a", "2,b"))
  }
}
