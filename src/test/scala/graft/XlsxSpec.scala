package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.formats.Xlsx
import graft.pipeline.Pipeline

class XlsxSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_xlsx_$tag").toString

  test("column ref round-trip") {
    for (i <- Seq(0, 1, 25, 26, 27, 51, 52, 701, 702, 16383)) {
      assert(Xlsx.colIndex(Xlsx.colRef(i) + "1") == i, s"col $i")
    }
  }

  test("grid round-trip: strings, escapes, unicode, numbers, sparse cells") {
    val f = s"${tmp("rt")}/t.xlsx"
    val grid: Seq[Seq[Any]] = Seq(
      Seq("plain", "a&b<c>d", "héllo ✓"),
      Seq[Any](42, 3.14, -7L),
      Seq("x", null, "z"), // sparse middle cell
      Seq.empty, // empty row
      Seq(" leading and trailing ", "", "multi\nline"))
    Xlsx.write(f, grid)
    val back = Xlsx.read(f)
    assert(back(0) == Seq("plain", "a&b<c>d", "héllo ✓"))
    assert(back(1) == Seq("42", "3.14", "-7"))
    assert(back(2) == Seq("x", null, "z"))
    assert(back(3).isEmpty)
    assert(back(4) == Seq(" leading and trailing ", "", "multi\nline"))
  }

  test("spreadsheet modules round-trip type=xlsx with x/y origin") {
    val d = tmp("mod")
    val in = s"$d/in.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in),
      "k,v\n1,alpha\n2,beta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$in", "csvread",
      s"spreadsheetwrite:fname=$d/out.xlsx:type=xlsx:x=2:y=3"))
    // read the block back from the same origin
    val r = Pipeline.run(spark, Seq(
      s"spreadsheetread:fname=$d/out.xlsx:type=xlsx:x=2:y=3:out=s",
      "csvwrite:in=s", s"filewrite:out=$d/back.csv"))
    val lines = new java.io.File(s"$d/back.csv").listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines == Seq("k,v", "1,alpha", "2,beta"))
  }

  test("reads files with shared strings and explicit cell refs") {
    // Hand-built workbook exercising the parts our writer does NOT
    // emit: sharedStrings.xml and gap-jumping r= refs.
    val d = tmp("ss")
    val f = s"$d/ss.xlsx"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream({
        new java.io.File(d).mkdirs(); f
      }))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        "<si><t>one</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>")
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="B2"><v>9</v></c></row>""" +
        "</sheetData></worksheet>")
    zos.close()
    val grid = Xlsx.read(f)
    assert(grid(0) == Seq("one", null, "rich"))
    assert(grid(1) == Seq(null, "9"))
  }
}
