package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.formats.{Cfb, Xls}
import graft.pipeline.Pipeline

class XlsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_xls_$tag").toString

  test("cfb stream round-trip, including sub-cutoff sizes") {
    for (size <- Seq(100, 4095, 4096, 9000, 70000)) {
      val data = Array.tabulate[Byte](size)(i => (i * 31 + size).toByte)
      val file = Cfb.writeStream("Workbook", data)
      val back = Cfb.readStream(file, "Workbook")
      assert(back.toSeq == data.toSeq, s"size=$size")
    }
  }

  test("xls grid round-trip: strings, unicode, numbers, sparse cells") {
    val f = s"${tmp("rt")}/t.xls"
    val grid: Seq[Seq[Any]] = Seq(
      Seq("plain", "a&b<c>d", "héllo ✓ 多字节"),
      Seq[Any](42, 3.14, -7L),
      Seq("x", null, "x"), // repeated string must hit the same SST slot
      Seq(" spaces kept ", "", "multi\nline"))
    Xls.write(f, grid)
    val back = Xls.read(f)
    assert(back(0) == Seq("plain", "a&b<c>d", "héllo ✓ 多字节"))
    assert(back(1) == Seq("42", "3.14", "-7"))
    assert(back(2) == Seq("x", null, "x"))
    assert(back(3) == Seq(" spaces kept ", "", "multi\nline"))
  }

  test("reader handles RK, MULRK and CONTINUE-split SST") {
    // Hand-built workbook exercising record types our writer never
    // emits (real producers use RK/MULRK for most numbers and split
    // big SSTs across CONTINUE records).
    def rec(id: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(id.toShort).putShort(body.length.toShort).put(body)
      b.array()
    }
    def bof(t: Int) = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0600.toShort).putShort(t.toShort)
      rec(0x0809, b.array())
    }
    // SST: 2 strings; the second's characters continue into CONTINUE
    val sstBody = {
      val b = ByteBuffer.allocate(8 + 3 + 2 + 3 + 2).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(3).putInt(2)
      b.putShort(2.toShort).put(0.toByte).put("ab".getBytes("ISO-8859-1"))
      b.putShort(4.toShort).put(0.toByte).put("cd".getBytes("ISO-8859-1")) // 2 of 4 chars
      b.array()
    }
    val continueBody = {
      val b = ByteBuffer.allocate(3).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0.toByte) // fresh grbit: still compressed
      b.put("ef".getBytes("ISO-8859-1"))
      b.array()
    }
    // rk: 1234 as 30-bit int (bit1 set); 2.5 as /100 int 250 (bits 0+1)
    def rkCell(row: Int, col: Int, rk: Int) = {
      val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(row.toShort).putShort(col.toShort).putShort(0.toShort).putInt(rk)
      rec(0x027E, b.array())
    }
    val mulrk = {
      val b = ByteBuffer.allocate(4 + 6 * 2 + 2).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(1.toShort).putShort(0.toShort) // row 1, colFirst 0
      b.putShort(0.toShort).putInt((7 << 2) | 2)
      b.putShort(0.toShort).putInt((250 << 2) | 3)
      b.putShort(1.toShort) // colLast
      rec(0x00BD, b.array())
    }
    def labelsst(row: Int, col: Int, idx: Int) = {
      val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(row.toShort).putShort(col.toShort).putShort(0.toShort).putInt(idx)
      rec(0x00FD, b.array())
    }
    val sheet = Array.concat(bof(0x0010),
      labelsst(0, 0, 0), labelsst(0, 1, 1), rkCell(0, 2, (1234 << 2) | 2),
      mulrk, rec(0x000A, Array.empty))
    val boundsheet = {
      val name = "S1".getBytes("ISO-8859-1")
      val globalsLen = 16 + 4 + (4 + sstBody.length) + (4 + continueBody.length) +
        (4 + 8 + name.length) + 4
      val b = ByteBuffer.allocate(8 + name.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(globalsLen).put(0.toByte).put(0.toByte)
        .put(name.length.toByte).put(0.toByte).put(name)
      rec(0x0085, b.array())
    }
    val globals = Array.concat(bof(0x0005),
      rec(0x00FC, sstBody), rec(0x003C, continueBody),
      boundsheet, rec(0x000A, Array.empty))
    val f = s"${tmp("rk")}/h.xls"
    new java.io.File(f).getParentFile.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      Cfb.writeStream("Workbook", Array.concat(globals, sheet)))

    val grid = Xls.read(f, "S1")
    assert(grid(0) == Seq("ab", "cdef", "1234"))
    assert(grid(1) == Seq("7", "2.5"))
  }

  test("formula cells read their cached results (numeric, bool, error, string)") {
    // Real producers store the last-evaluated result inside the FORMULA
    // record; we read that cache (never evaluate). String results
    // arrive in a following STRING record.
    def rec(id: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(id.toShort).putShort(body.length.toShort).put(body)
      b.array()
    }
    def bof(t: Int) = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0600.toShort).putShort(t.toShort)
      rec(0x0809, b.array())
    }
    // FORMULA: row(2) col(2) xf(2) num(8) grbit(2) chn(4) cce(2)
    def formulaNum(row: Int, col: Int, v: Double) = {
      val b = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(row.toShort).putShort(col.toShort).putShort(0.toShort)
        .putDouble(v).putShort(0.toShort).putInt(0).putShort(0.toShort)
      rec(0x0006, b.array())
    }
    // tagged result: num = tag,0,value,0,0,0,0xFF,0xFF
    def formulaTagged(row: Int, col: Int, tag: Int, value: Int) = {
      val b = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(row.toShort).putShort(col.toShort).putShort(0.toShort)
        .put(tag.toByte).put(0.toByte).put(value.toByte).put(0.toByte)
        .putShort(0.toShort).putShort(0xFFFF.toShort)
        .putShort(0.toShort).putInt(0).putShort(0.toShort)
      rec(0x0006, b.array())
    }
    def stringRec(s: String) = {
      val bytes = s.getBytes("ISO-8859-1")
      val b = ByteBuffer.allocate(3 + bytes.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(s.length.toShort).put(0.toByte).put(bytes)
      rec(0x0207, b.array())
    }
    val sheet = Array.concat(bof(0x0010),
      formulaNum(0, 0, 6.0),
      formulaTagged(0, 1, 1, 1),     // bool TRUE
      formulaTagged(0, 2, 2, 0x07),  // #DIV/0!
      formulaTagged(1, 0, 0, 0), stringRec("cat"), // string via STRING rec
      formulaTagged(1, 1, 3, 0),     // empty string
      rec(0x000A, Array.empty))
    val boundsheet = {
      val name = "S1".getBytes("ISO-8859-1")
      val globalsLen = 20 + (4 + 8 + name.length) + 4
      val b = ByteBuffer.allocate(8 + name.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(globalsLen).put(0.toByte).put(0.toByte)
        .put(name.length.toByte).put(0.toByte).put(name)
      rec(0x0085, b.array())
    }
    val globals = Array.concat(bof(0x0005), boundsheet, rec(0x000A, Array.empty))
    val f = s"${tmp("fml")}/fml.xls"
    new java.io.File(f).getParentFile.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      Cfb.writeStream("Workbook", Array.concat(globals, sheet)))

    val grid = Xls.read(f, "S1")
    assert(grid(0) == Seq("6", "TRUE", "#DIV/0!"))
    assert(grid(1) == Seq("cat", ""))

    // Malformed stream: a non-string FORMULA intervenes between a
    // string-tagged FORMULA and its STRING record. The STRING must NOT
    // attach to the stale (row, col) — it is orphaned and dropped
    // (ADVICE r3).
    val sheet2 = Array.concat(bof(0x0010),
      formulaTagged(0, 0, 0, 0),  // expects a STRING…
      formulaNum(0, 1, 5.0),      // …but a number formula intervenes
      stringRec("ghost"),         // orphaned: must not land at (0,0)
      rec(0x000A, Array.empty))
    val f2 = s"${tmp("fml2")}/fml2.xls"
    new java.io.File(f2).getParentFile.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(f2),
      Cfb.writeStream("Workbook", Array.concat(globals, sheet2)))
    val grid2 = Xls.read(f2, "S1")
    assert(!grid2.flatten.contains("ghost"), s"grid=$grid2")
    assert(grid2(0)(1) == "5")
  }

  test("spreadsheet modules round-trip type=xls") {
    val d = tmp("mod")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/in.csv"),
      "k,v\n1,alpha\n2,beta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread",
      s"spreadsheetwrite:fname=$d/out.xls:type=xls"))
    val r = Pipeline.run(spark, Seq(
      s"spreadsheetread:fname=$d/out.xls:type=xls:out=s",
      "csvwrite:in=s", s"filewrite:out=$d/back.csv"))
    val lines = new java.io.File(s"$d/back.csv").listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines == Seq("k,v", "1,alpha", "2,beta"))
  }
}
