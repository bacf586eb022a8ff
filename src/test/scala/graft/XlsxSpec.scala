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

  test("ods grid round-trip: strings, escapes, numbers, sparse cells") {
    import graft.formats.Ods
    val f = s"${tmp("ods")}/t.ods"
    val grid: Seq[Seq[Any]] = Seq(
      Seq("plain", "a&b<c>\"d\"", "héllo ✓"),
      Seq[Any](42, 3.14, -7L),
      Seq("x", null, "z"))
    Ods.write(f, grid)
    val back = Ods.read(f)
    assert(back(0) == Seq("plain", "a&b<c>\"d\"", "héllo ✓"))
    assert(back(1) == Seq("42", "3.14", "-7"))
    assert(back(2) == Seq("x", null, "z"))
    // mimetype must be the FIRST entry and STORED (OpenDocument spec)
    val zf = new java.util.zip.ZipFile(f)
    try {
      val first = zf.entries().nextElement()
      assert(first.getName == "mimetype")
      assert(first.getMethod == java.util.zip.ZipEntry.STORED)
    } finally zf.close()
  }

  test("ods reader expands repeated columns/rows and selects sheets") {
    import graft.formats.Ods
    val d = tmp("odsrep")
    val f = s"$d/rep.ods"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream({ new java.io.File(d).mkdirs(); f }))
    zos.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
    zos.write((
      """<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:spreadsheet>""" +
        """<table:table table:name="First"><table:table-row>""" +
        """<table:table-cell table:number-columns-repeated="3" office:value-type="string"><text:p>x</text:p></table:table-cell>""" +
        """<table:table-cell table:number-columns-repeated="1000"/>""" +
        """</table:table-row><table:table-row table:number-rows-repeated="2">""" +
        """<table:table-cell office:value-type="float" office:value="5"><text:p>5</text:p></table:table-cell>""" +
        """</table:table-row></table:table>""" +
        """<table:table table:name="Second"><table:table-row>""" +
        """<table:table-cell office:value-type="string"><text:p>only</text:p></table:table-cell>""" +
        """</table:table-row></table:table>""" +
        """</office:spreadsheet></office:body></office:document-content>""").getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val first = Ods.read(f)
    assert(first == Seq(Seq("x", "x", "x"), Seq("5"), Seq("5")))
    assert(Ods.read(f, "Second") == Seq(Seq("only")))
    assert(Ods.read(f, "2") == Seq(Seq("only")))
    intercept[IllegalArgumentException](Ods.read(f, "nope"))

    // value-bearing repeats above the empty-padding cap (4096) expand
    // in full (bounded by the real grid limit) — data is never dropped
    val f2 = s"$d/big.ods"
    val z2 = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f2))
    z2.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
    z2.write((
      """<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:spreadsheet>""" +
        """<table:table table:name="S"><table:table-row>""" +
        """<table:table-cell table:number-columns-repeated="5000" office:value="7"/>""" +
        """</table:table-row></table:table>""" +
        """</office:spreadsheet></office:body></office:document-content>""").getBytes("UTF-8"))
    z2.closeEntry(); z2.close()
    val wide = Ods.read(f2)
    assert(wide.head.length == 5000, s"got ${wide.head.length}")
    assert(wide.head.forall(_ == "7"))

    // the grid limit is CUMULATIVE, not per-run: many value-bearing
    // runs in one row (or many repeated rows) clamp at the real grid
    // bounds instead of multiplying — a few-KB crafted file must not
    // allocate beyond 16384 cols / 2^20 rows (ADVICE r3)
    val f3 = s"$d/cum.ods"
    val z3 = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f3))
    z3.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
    z3.write((
      """<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:spreadsheet>""" +
        """<table:table table:name="S"><table:table-row>""" +
        """<table:table-cell table:number-columns-repeated="10000" office:value="1"/>""" +
        """<table:table-cell table:number-columns-repeated="10000" office:value="2"/>""" +
        """<table:table-cell table:number-columns-repeated="10000" office:value="3"/>""" +
        """</table:table-row>""" +
        """<table:table-row table:number-rows-repeated="600000"><table:table-cell office:value="4"/></table:table-row>""" +
        """<table:table-row table:number-rows-repeated="600000"><table:table-cell office:value="5"/></table:table-row>""" +
        """<table:table-row table:number-rows-repeated="600000"><table:table-cell office:value="6"/></table:table-row>""" +
        """</table:table></office:spreadsheet></office:body></office:document-content>""").getBytes("UTF-8"))
    z3.closeEntry(); z3.close()
    val cum = Ods.read(f3)
    assert(cum.head.length == 16384, s"cols=${cum.head.length}")
    assert(cum.length == (1 << 20), s"rows=${cum.length}")
  }

  test("spreadsheet modules round-trip type=ods") {
    val d = tmp("odsmod")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/in.csv"),
      "k,v\n1,alpha\n2,beta")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/in.csv", "csvread",
      s"spreadsheetwrite:fname=$d/out.ods:type=ods"))
    val r = Pipeline.run(spark, Seq(
      s"spreadsheetread:fname=$d/out.ods:type=ods:out=s",
      "csvwrite:in=s", s"filewrite:out=$d/back.csv"))
    val lines = new java.io.File(s"$d/back.csv").listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines == Seq("k,v", "1,alpha", "2,beta"))
  }

  test("xlsx sheet selection by name and index via workbook rels") {
    // Two-sheet workbook with rels in NON-sequential part order: sheet
    // "B" (workbook first) lives in sheet2.xml — name/index selection
    // must follow workbook order, not part numbering.
    val d = tmp("sheets")
    val f = s"$d/two.xlsx"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream({ new java.io.File(d).mkdirs(); f }))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="B" sheetId="1" r:id="rId2"/><sheet name="A" sheetId="2" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>""" +
        """</Relationships>""")
    def sheetXml(v: String) =
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        s"""<row r="1"><c r="A1" t="inlineStr"><is><t>$v</t></is></c></row>""" +
        "</sheetData></worksheet>"
    put("xl/worksheets/sheet1.xml", sheetXml("in-sheet1"))
    put("xl/worksheets/sheet2.xml", sheetXml("in-sheet2"))
    zos.close()
    assert(Xlsx.read(f) == Seq(Seq("in-sheet2")))        // first by workbook order = B
    assert(Xlsx.read(f, "A") == Seq(Seq("in-sheet1")))
    assert(Xlsx.read(f, "2") == Seq(Seq("in-sheet1")))   // index follows workbook order
    intercept[IllegalArgumentException](Xlsx.read(f, "missing"))
  }

  test("formula cells return cached <v> results, formula text ignored") {
    val d = tmp("fml")
    val f = s"$d/fml.xlsx"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream({ new java.io.File(d).mkdirs(); f }))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1">""" +
        """<c r="A1"><f>1+5</f><v>6</v></c>""" +
        """<c r="B1" t="str"><f>A9&amp;B9</f><v>cat</v></c>""" +
        """<c r="C1" t="b"><f>1=1</f><v>1</v></c>""" +
        """</row>""" +
        "</sheetData></worksheet>")
    zos.close()
    assert(Xlsx.read(f) == Seq(Seq("6", "cat", "TRUE")))
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
