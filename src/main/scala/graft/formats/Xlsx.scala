package graft.formats

import java.io.{FileOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal xlsx (ECMA-376 SpreadsheetML) reader/writer in pure JDK —
  * java.util.zip + StAX; no POI exists in this image. Covers the cell
  * block the reference's spreadsheetread consumes
  * (/root/reference/scripts/dbitool.pl:2696-2784): one worksheet,
  * strings + numbers. Read side understands shared strings, inline
  * strings, sparse rows (explicit `r=` cell refs) and formula cells —
  * the cached result in `<v>` is returned (formula text in `<f>` is
  * ignored, never evaluated); write side emits inline strings
  * (self-contained, no sharedStrings part).
  *
  * In-memory by design, like the reference (whole-workbook formats
  * aren't splittable) — the distributed path is csv/parquet.
  */
object Xlsx {

  // ---- read ------------------------------------------------------------

  /** Cell grid of a worksheet, row-major; missing cells null.
    * `sheet` selects by name or 1-based index from workbook order
    * (reference `sheet=`, dbitool.pl:2734, 2752-2754); "" = first.
    */
  def read(path: String, sheet: String = ""): Seq[Seq[String]] = {
    val zf = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.toSeq
      def entry(name: String) = entries.find(_.getName == name)
      val shared = entry("xl/sharedStrings.xml")
        .map(e => parseSharedStrings(zf.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      // workbook order: sheet name -> r:id, then rels: r:id -> part
      val sheets: Seq[(String, String)] = entry("xl/workbook.xml")
        .map(e => parseWorkbookSheets(zf.getInputStream(e)))
        .getOrElse(Seq.empty)
      val rels: Map[String, String] = entry("xl/_rels/workbook.xml.rels")
        .map(e => parseRels(zf.getInputStream(e)))
        .getOrElse(Map.empty)
      val partName: Option[String] =
        if (sheets.isEmpty) None
        else {
          val pick =
            if (sheet.isEmpty) Some(sheets.head)
            else sheets.find(_._1 == sheet)
              .orElse(sheet.toIntOption.flatMap(i => sheets.lift(i - 1)))
          val chosen = pick.getOrElse(throw new IllegalArgumentException(
            s"""sheet "$sheet" not found in $path (has: ${sheets.map(_._1).mkString(", ")})"""))
          rels.get(chosen._2).map(t =>
            if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
        }
      val sheetEntry = partName.flatMap(entry).orElse {
        // fallback for rels-less minimal files: lowest-numbered part —
        // but ONLY for a default read. An explicitly requested sheet
        // that can't be resolved must fail, not silently read another.
        if (sheet.isEmpty)
          entries.filter(_.getName.matches("xl/worksheets/sheet\\d+\\.xml"))
            .sortBy(e => e.getName.stripPrefix("xl/worksheets/sheet")
              .stripSuffix(".xml").toInt).headOption
        else None
      }.getOrElse(throw new IllegalArgumentException(
        if (sheet.isEmpty) s"no worksheet in $path"
        else s"""sheet "$sheet" could not be resolved in $path"""))
      parseSheet(zf.getInputStream(sheetEntry), shared)
    } finally zf.close()
  }

  /** (name, r:id) per sheet, workbook order. */
  private def parseWorkbookSheets(in: InputStream): Seq[(String, String)] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = mutable.ArrayBuffer[(String, String)]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
          var rid: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
            i += 1
          }
          if (rid != null) out += ((name, rid))
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** r:id -> Target map from a .rels part. */
  private def parseRels(in: InputStream): Map[String, String] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = mutable.Map[String, String]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null) out(id) = target
        }
      }
    } finally r.close()
    out.toMap
  }

  /** "BC" -> 54 (0-based column index). */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT =>
            cur ++= r.getText
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  private def parseSheet(in: InputStream,
                         shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer[Seq[String]]()
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = -1          // from r="B3"; -1 = sequential
    var cellType = ""         // t attr: "", "s", "inlineStr", "str", "n"
    var text = new StringBuilder
    var collecting = false    // inside <v> or <is><t>
    def endCell(): Unit = {
      if (row != null && cellCol >= 0) {
        while (row.length < cellCol) row += null
        val v = cellType match {
          case "s" => shared.lift(text.toString.trim.toInt).orNull
          // "b" boolean cells (common as cached formula results) align
          // with the BIFF reader's TRUE/FALSE rendering.
          case "b" => if (text.toString.trim == "1") "TRUE" else "FALSE"
          case _ => text.toString
        }
        if (row.length == cellCol) row += v else row(cellCol) = v
      }
      cellCol = -1; cellType = ""; text = new StringBuilder
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = mutable.ArrayBuffer[String]()
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r"))
                cellCol = ref.map(colIndex).getOrElse(row.length)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text = new StringBuilder
              case "v" => collecting = true
              case "t" if cellType == "inlineStr" => collecting = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if collecting =>
            text ++= r.getText
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => collecting = false
              case "t" => collecting = false
              case "c" => endCell()
              case "row" =>
                if (row != null) rows += row.toSeq
                row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  // ---- write -----------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  private[graft] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write one worksheet; numeric values typed, everything else an
    * inline string, nulls skipped (sparse cells).
    */
  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>""")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>""")
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sb ++= s"""<row r="${ri + 1}">"""
        cells.zipWithIndex.foreach { case (v, ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          v match {
            case null => // sparse
            case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float) =>
              sb ++= s"""<c r="$ref"><v>$n</v></c>"""
            case n: java.math.BigDecimal =>
              sb ++= s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
            case s =>
              sb ++= s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s.toString)}</t></is></c>"""
          }
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }
}
