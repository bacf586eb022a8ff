package graft.formats

import java.io.{FileOutputStream, InputStream}
import java.util.zip.{CRC32, ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal ODS (OASIS OpenDocument spreadsheet) reader/writer in pure
  * JDK — the `ods`/`sxc` types of the reference's spreadsheet modules
  * (/root/reference/scripts/dbitool.pl:2711, via Spreadsheet::Read).
  * Reader handles multiple tables (sheet selection by name or 1-based
  * index), `table:number-columns-repeated` / `table:number-rows-
  * repeated` expansion (capped — LibreOffice pads to 2^20 trailing
  * empty rows), typed `office:value` numbers and `text:p` strings.
  * Writer emits a spec-conforming package: STORED `mimetype` first
  * entry, manifest, single-table content.xml.
  *
  * In-memory by design, like the reference — the distributed path is
  * csv/parquet.
  */
object Ods {

  val Mime = "application/vnd.oasis.opendocument.spreadsheet"

  /** EMPTY repeats beyond this are treated as trailing padding and
    * clipped (the reference's Spreadsheet::Read `clip` behavior —
    * LibreOffice pads sheets to 2^20 trailing empty rows/columns).
    * Repeated runs carrying REAL values expand in full up to the
    * actual LibreOffice grid limits (2^20 rows × 16384 columns) —
    * capping below that would silently drop data, while honoring a
    * larger claim would let a few-KB crafted file allocate billions of
    * cells.
    */
  private val RepeatCap = 4096
  private val MaxCols = 16384
  private val MaxRows = 1 << 20

  // ---- read ------------------------------------------------------------

  def read(path: String, sheet: String = ""): Seq[Seq[String]] = {
    val zf = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val content = zf.entries().asScala.find(_.getName == "content.xml")
        .getOrElse(throw new IllegalArgumentException(s"no content.xml in $path"))
      val tables = parseContent(zf.getInputStream(content))
      val pick =
        if (sheet.isEmpty) tables.headOption
        else tables.find(_._1 == sheet)
          .orElse(sheet.toIntOption.flatMap(i => tables.lift(i - 1)))
      val grid = pick.getOrElse(throw new IllegalArgumentException(
        s"""sheet "$sheet" not found in $path (has: ${tables.map(_._1).mkString(", ")})"""))._2
      clip(grid)
    } finally zf.close()
  }

  /** Drop trailing all-null rows and per-row trailing nulls (absent
    * cell == null; an empty `<text:p/>` is a REAL empty string and is
    * kept).
    */
  private def clip(grid: Seq[Seq[String]]): Seq[Seq[String]] = {
    val rows = grid.map { r =>
      val last = r.lastIndexWhere(_ != null)
      r.take(last + 1)
    }
    val lastRow = rows.lastIndexWhere(_.nonEmpty)
    rows.take(lastRow + 1)
  }

  private def parseContent(in: InputStream): Seq[(String, Seq[Seq[String]])] = {
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val tables = mutable.ArrayBuffer[(String, Seq[Seq[String]])]()
    var tableName: String = null
    var rows: mutable.ArrayBuffer[Seq[String]] = null
    var row: mutable.ArrayBuffer[String] = null
    var rowRepeat = 1
    var cellRepeat = 1
    var cellValue: String = null     // typed office:value, wins over text
    var text = new StringBuilder
    var inCell = false
    var inP = false
    var sawP = false                 // <text:p/> present ⇒ "" not null
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "table" =>
                tableName = Option(r.getAttributeValue(null, "name"))
                  .getOrElse(s"Sheet${tables.length + 1}")
                rows = mutable.ArrayBuffer[Seq[String]]()
              case "table-row" if rows != null =>
                row = mutable.ArrayBuffer[String]()
                rowRepeat =
                  Option(r.getAttributeValue(null, "number-rows-repeated"))
                    .flatMap(_.toIntOption).getOrElse(1)
              case "table-cell" | "covered-table-cell" if row != null =>
                inCell = true
                cellRepeat =
                  Option(r.getAttributeValue(null, "number-columns-repeated"))
                    .flatMap(_.toIntOption).getOrElse(1)
                cellValue = r.getAttributeValue(null, "value")
                text = new StringBuilder
                sawP = false
              case "p" if inCell => inP = true; sawP = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inP =>
            text ++= r.getText
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" => inP = false
              case "table-cell" | "covered-table-cell" if row != null =>
                val v =
                  if (cellValue != null) cellValue
                  else if (sawP) text.toString
                  else null
                // cap applies ONLY to empty padding runs; real values
                // expand in full up to the grid limit. The limit is
                // CUMULATIVE over the row (MaxCols - cells already
                // present), not per-run — many value-bearing runs each
                // claiming 16384 repeats must not multiply (crafted-file
                // OOM, ADVICE r3).
                val rep = math.max(0, math.min(
                  if (v == null || v.isEmpty) math.min(RepeatCap, cellRepeat)
                  else cellRepeat,
                  MaxCols - row.length))
                var i = 0
                while (i < rep) { row += v; i += 1 }
                inCell = false; cellValue = null
              case "table-row" if rows != null =>
                val snap = row.toSeq
                // same cumulative clamp as cells: bound by the rows the
                // grid can still hold, not per-run
                val rep = math.max(0, math.min(
                  if (snap.forall(c => c == null || c.isEmpty))
                    math.min(RepeatCap, rowRepeat)
                  else rowRepeat,
                  MaxRows - rows.length))
                var i = 0
                while (i < rep) { rows += snap; i += 1 }
                row = null
              case "table" if rows != null =>
                tables += ((tableName, rows.toSeq))
                rows = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    tables.toSeq
  }

  // ---- write -----------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      // mimetype MUST be the first entry and STORED (OpenDocument
      // packaging spec) — consumers sniff it without inflating.
      val mimeBytes = Mime.getBytes("US-ASCII")
      val mimeEntry = new ZipEntry("mimetype")
      mimeEntry.setMethod(ZipEntry.STORED)
      mimeEntry.setSize(mimeBytes.length)
      val crc = new CRC32
      crc.update(mimeBytes)
      mimeEntry.setCrc(crc.getValue)
      zos.putNextEntry(mimeEntry)
      zos.write(mimeBytes)
      zos.closeEntry()

      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("META-INF/manifest.xml",
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">""" +
          s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="$Mime"/>""" +
          """<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
          """</manifest:manifest>""")
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8"?>"""
      sb ++= """<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" office:version="1.2"><office:body><office:spreadsheet>"""
      sb ++= """<table:table table:name="Sheet1">"""
      rows.foreach { cells =>
        sb ++= "<table:table-row>"
        cells.foreach {
          case null => sb ++= "<table:table-cell/>"
          case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float) =>
            sb ++= s"""<table:table-cell office:value-type="float" office:value="$n"><text:p>$n</text:p></table:table-cell>"""
          case n: java.math.BigDecimal =>
            sb ++= s"""<table:table-cell office:value-type="float" office:value="${n.toPlainString}"><text:p>${n.toPlainString}</text:p></table:table-cell>"""
          case v =>
            sb ++= s"""<table:table-cell office:value-type="string"><text:p>${xmlEscape(v.toString)}</text:p></table:table-cell>"""
        }
        sb ++= "</table:table-row>"
      }
      sb ++= "</table:table></office:spreadsheet></office:body></office:document-content>"
      put("content.xml", sb.toString)
    } finally zos.close()
  }
}
