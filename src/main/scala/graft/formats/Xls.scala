package graft.formats

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal legacy .xls (BIFF8, [MS-XLS]) reader/writer over the Cfb
  * container — completes the reference's spreadsheet type set
  * (/root/reference/scripts/dbitool.pl:2711) without POI.
  *
  * Reader subset: BOUNDSHEET sheet map (selection by name or 1-based
  * index), SST with CONTINUE continuation, LABELSST / LABEL / NUMBER /
  * RK / MULRK / BLANK cells, compressed (latin-1) and UTF-16LE string
  * encodings. FORMULA cells read their CACHED RESULTS (numeric inline;
  * string via the trailing STRING record; boolean/error from the
  * tagged payload) — spec-pinned. Writer subset: workbook globals + one sheet,
  * SST-backed strings, NUMBER cells; enough for any BIFF8 consumer to
  * open the grid.
  */
object Xls {

  private val RecBOF = 0x0809
  private val RecEOF = 0x000A
  private val RecBOUNDSHEET = 0x0085
  private val RecSST = 0x00FC
  private val RecCONTINUE = 0x003C
  private val RecLABELSST = 0x00FD
  private val RecLABEL = 0x0204
  private val RecNUMBER = 0x0203
  private val RecRK = 0x027E
  private val RecMULRK = 0x00BD
  private val RecFORMULA = 0x0006
  private val RecSTRING = 0x0207
  private val RecDIMENSION = 0x0200
  private val RecCODEPAGE = 0x0042
  private val RecWINDOW1 = 0x003D

  // ---- read ------------------------------------------------------------

  def read(path: String, sheet: String = ""): Seq[Seq[String]] = {
    val fileBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb =
      try Cfb.readStream(fileBytes, "Workbook")
      catch {
        case _: IllegalArgumentException => Cfb.readStream(fileBytes, "Book")
      }
    val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)

    // pass 1 over workbook globals: BOUNDSHEETs + SST
    var sheets = Vector.empty[(String, Int)] // name -> substream offset
    var sst = IndexedSeq.empty[String]
    var pos = 0
    var depth = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val rec = bb.getShort(pos) & 0xFFFF
      val len = bb.getShort(pos + 2) & 0xFFFF
      rec match {
        case RecBOF => depth += 1
        case RecEOF => depth -= 1; if (depth == 0) done = true
        case RecBOUNDSHEET =>
          val off = bb.getInt(pos + 4)
          val cch = wb(pos + 10) & 0xFF
          val grbit = wb(pos + 11) & 0xFF
          val name =
            if ((grbit & 1) == 0) new String(wb, pos + 12, cch, "ISO-8859-1")
            else new String(wb, pos + 12, cch * 2, "UTF-16LE")
          sheets :+= (name -> off)
        case RecSST =>
          sst = parseSst(wb, pos)
        case _ =>
      }
      pos += 4 + len
    }
    if (sheets.isEmpty)
      throw new IllegalArgumentException(s"no sheets in $path")
    val chosen =
      (if (sheet.isEmpty) sheets.headOption
       else sheets.find(_._1 == sheet)
         .orElse(sheet.toIntOption.flatMap(i => sheets.lift(i - 1))))
        .getOrElse(throw new IllegalArgumentException(
          s"""sheet "$sheet" not found in $path (has: ${sheets.map(_._1).mkString(", ")})"""))

    parseSheetSubstream(wb, chosen._2, sst)
  }

  /** Format a cell double the way displayed grids do: integral values
    * without the trailing ".0".
    */
  private def fmtNum(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString
    else d.toString

  /** RK value: 30-bit payload, bit0 = /100, bit1 = int (else high 30
    * bits of an IEEE double).
    */
  private def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** XLUnicodeRichExtendedString at `at` (SST member), spanning
    * CONTINUE boundaries via `next()` which returns the next readable
    * byte position (skipping record headers). Returns (string, posAfter).
    */
  private final class SstCursor(wb: Array[Byte], var pos: Int, var recEnd: Int) {
    private val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    /** advance into the next CONTINUE record; returns the first byte's
      * "fresh grbit" when `expectGrbit` (string data resumed mid-run).
      */
    private def hop(expectGrbit: Boolean): Int = {
      val rec = bb.getShort(recEnd) & 0xFFFF
      val len = bb.getShort(recEnd + 2) & 0xFFFF
      require(rec == RecCONTINUE, f"SST continuation expected, got 0x$rec%04x")
      pos = recEnd + 4
      recEnd = pos + len
      if (expectGrbit) { val g = wb(pos) & 0xFF; pos += 1; g } else -1
    }
    def u8(): Int = { if (pos >= recEnd) hop(false); val v = wb(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { u8() | (u8() << 8) }
    def u32(): Int = { u16() | (u16() << 16) }
    /** cch chars, compressed flag per active run; re-reads the flag
      * byte when a CONTINUE boundary splits the character data.
      */
    def chars(cch: Int, compressed0: Boolean): String = {
      val sb = new StringBuilder
      var left = cch
      var compressed = compressed0
      while (left > 0) {
        if (pos >= recEnd) {
          val g = hop(true)
          compressed = (g & 1) == 0
        }
        val avail = recEnd - pos
        val take =
          if (compressed) math.min(left, avail)
          else math.min(left, avail / 2)
        if (take == 0) {
          // a lone byte of a 2-byte char before the boundary cannot
          // happen (writers split on char boundaries); guard anyway
          val g = hop(true)
          compressed = (g & 1) == 0
        } else {
          if (compressed) {
            sb ++= new String(wb, pos, take, "ISO-8859-1")
            pos += take
          } else {
            sb ++= new String(wb, pos, take * 2, "UTF-16LE")
            pos += take * 2
          }
          left -= take
        }
      }
      sb.toString
    }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (pos >= recEnd) hop(false)
        val take = math.min(left, recEnd - pos)
        pos += take
        left -= take
      }
    }
  }

  private def parseSst(wb: Array[Byte], recPos: Int): IndexedSeq[String] = {
    val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    val len = bb.getShort(recPos + 2) & 0xFFFF
    val cur = new SstCursor(wb, recPos + 4, recPos + 4 + len)
    cur.skip(4) // cstTotal
    val unique = cur.u32()
    val out = new Array[String](unique)
    var i = 0
    while (i < unique) {
      val cch = cur.u16()
      val grbit = cur.u8()
      val compressed = (grbit & 1) == 0
      val rich = (grbit & 8) != 0
      val ext = (grbit & 4) != 0
      val cRun = if (rich) cur.u16() else 0
      val cbExt = if (ext) cur.u32() else 0
      out(i) = cur.chars(cch, compressed)
      cur.skip(cRun * 4 + cbExt)
      i += 1
    }
    out.toIndexedSeq
  }

  private def parseSheetSubstream(wb: Array[Byte], start: Int,
                                  sst: IndexedSeq[String]): Seq[Seq[String]] = {
    val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    val cells = mutable.Map[(Int, Int), String]()
    var maxRow = -1
    var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      cells((r, c)) = v
      if (r > maxRow) maxRow = r
      if (c > maxCol) maxCol = c
    }
    var pos = start
    var depth = 0
    var done = false
    // (row, col) of a FORMULA whose cached string result arrives in the
    // following STRING record (string-valued formulas only).
    var pendingString: Option[(Int, Int)] = None
    // BIFF error-code byte -> display string ([MS-XLS] BErr).
    def errName(code: Int): String = code match {
      case 0x00 => "#NULL!"
      case 0x07 => "#DIV/0!"
      case 0x0F => "#VALUE!"
      case 0x17 => "#REF!"
      case 0x1D => "#NAME?"
      case 0x24 => "#NUM!"
      case 0x2A => "#N/A"
      case _ => "#ERR!"
    }
    while (!done && pos + 4 <= wb.length) {
      val rec = bb.getShort(pos) & 0xFFFF
      val len = bb.getShort(pos + 2) & 0xFFFF
      val body = pos + 4
      rec match {
        case RecBOF => depth += 1
        case RecEOF =>
          pendingString = None // a STRING never crosses a sheet boundary
          depth -= 1; if (depth == 0) done = true
        case RecNUMBER =>
          put(bb.getShort(body) & 0xFFFF, bb.getShort(body + 2) & 0xFFFF,
            fmtNum(bb.getDouble(body + 6)))
        case RecRK =>
          put(bb.getShort(body) & 0xFFFF, bb.getShort(body + 2) & 0xFFFF,
            fmtNum(decodeRk(bb.getInt(body + 6))))
        case RecMULRK =>
          val r = bb.getShort(body) & 0xFFFF
          val colFirst = bb.getShort(body + 2) & 0xFFFF
          val colLast = bb.getShort(body + len - 2) & 0xFFFF
          var c = colFirst
          while (c <= colLast) {
            put(r, c, fmtNum(decodeRk(bb.getInt(body + 4 + (c - colFirst) * 6 + 2))))
            c += 1
          }
        case RecLABELSST =>
          put(bb.getShort(body) & 0xFFFF, bb.getShort(body + 2) & 0xFFFF,
            sst.lift(bb.getInt(body + 6)).orNull)
        case RecLABEL =>
          val r = bb.getShort(body) & 0xFFFF
          val c = bb.getShort(body + 2) & 0xFFFF
          val cch = bb.getShort(body + 6) & 0xFFFF
          val grbit = wb(body + 8) & 0xFF
          val s =
            if ((grbit & 1) == 0) new String(wb, body + 9, cch, "ISO-8859-1")
            else new String(wb, body + 9, cch * 2, "UTF-16LE")
          put(r, c, s)
        case RecFORMULA =>
          // The cached RESULT rides in the record (the reference gets
          // these evaluated-for-free from its parser, dbitool.pl:
          // 2696-2784; we read the cache, we don't evaluate): 8 bytes at
          // body+6 are an IEEE double UNLESS the high word is 0xFFFF, in
          // which case byte 0 tags the type — 0 string (value follows in
          // a STRING record), 1 boolean, 2 error, 3 empty string.
          val r = bb.getShort(body) & 0xFFFF
          val c = bb.getShort(body + 2) & 0xFFFF
          // Any new FORMULA invalidates a stale pending string target —
          // a malformed stream must not attribute a later STRING record
          // to an earlier formula's (row, col).
          pendingString = None
          if ((bb.getShort(body + 12) & 0xFFFF) == 0xFFFF) {
            (wb(body + 6) & 0xFF) match {
              case 0 => pendingString = Some((r, c))
              case 1 => put(r, c, if (wb(body + 8) != 0) "TRUE" else "FALSE")
              case 2 => put(r, c, errName(wb(body + 8) & 0xFF))
              case 3 => put(r, c, "")
              case _ => // unknown result tag: leave the cell empty
            }
          } else put(r, c, fmtNum(bb.getDouble(body + 6)))
        case RecSTRING =>
          // XLUnicodeString: cch(2) grbit(1) chars
          pendingString.foreach { case (r, c) =>
            val cch = bb.getShort(body) & 0xFFFF
            val grbit = wb(body + 2) & 0xFF
            val s =
              if ((grbit & 1) == 0) new String(wb, body + 3, cch, "ISO-8859-1")
              else new String(wb, body + 3, cch * 2, "UTF-16LE")
            put(r, c, s)
          }
          pendingString = None
        case _ => // BLANK/MULBLANK/styles: no value contribution
      }
      pos += 4 + len
    }
    (0 to maxRow).map { r =>
      val last = (0 to maxCol).lastIndexWhere(c => cells.contains((r, c)))
      (0 to last).map(c => cells.getOrElse((r, c), null))
    }
  }

  // ---- write -----------------------------------------------------------

  private def rec(id: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putShort(id.toShort).putShort(body.length.toShort).put(body)
    out.array()
  }

  private def bofBody(substreamType: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x0600.toShort) // BIFF8
    b.putShort(substreamType.toShort) // 0x0005 globals, 0x0010 worksheet
    b.putShort(0x0DBB.toShort).putShort(0x07CC.toShort) // build/year
    b.putInt(0x000000C1).putInt(0x00000006)
    b.array()
  }

  /** BIFF8 unicode string with 16-bit length: picks compressed latin-1
    * when possible, UTF-16LE otherwise.
    */
  private def xlString(s: String): Array[Byte] = {
    val compressed = s.forall(_ < 0x100)
    val chars = if (compressed) s.getBytes("ISO-8859-1") else s.getBytes("UTF-16LE")
    val b = ByteBuffer.allocate(3 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(s.length.toShort).put(if (compressed) 0.toByte else 1.toByte)
      .put(chars)
    b.array()
  }

  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    // BIFF8 row/col indices are 16/8-bit: silently wrapping via toShort
    // would overwrite earlier cells. Fail loudly instead (xlsx has no
    // such limit — the module layer steers big grids there).
    require(rows.length <= 65536,
      s"xls supports at most 65536 rows, got ${rows.length}")
    val maxCols = rows.map(_.length).maxOption.getOrElse(0)
    require(maxCols <= 256, s"xls supports at most 256 columns, got $maxCols")
    // SST over distinct strings (single SST record: string data capped
    // at one record — ample for the module's in-memory scope)
    val strings = mutable.LinkedHashMap[String, Int]()
    var totalRefs = 0
    rows.foreach(_.foreach {
      case null =>
      case _: Int | _: Long | _: Short | _: Byte | _: Double | _: Float =>
      case v =>
        totalRefs += 1
        strings.getOrElseUpdate(v.toString, strings.size)
    })

    val sheetRecs = mutable.ArrayBuffer[Array[Byte]]()
    sheetRecs += rec(RecBOF, bofBody(0x0010))
    val dim = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    dim.putInt(0).putInt(rows.length)
      .putShort(0.toShort)
      .putShort(rows.map(_.length).maxOption.getOrElse(0).toShort)
      .putShort(0.toShort)
    sheetRecs += rec(RecDIMENSION, dim.array())
    rows.zipWithIndex.foreach { case (cells, r) =>
      cells.zipWithIndex.foreach { case (v, c) =>
        v match {
          case null =>
          case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float) =>
            val d = n match {
              case x: Int => x.toDouble
              case x: Long => x.toDouble
              case x: Short => x.toDouble
              case x: Byte => x.toDouble
              case x: Double => x
              case x: Float => x.toDouble
            }
            val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
            b.putShort(r.toShort).putShort(c.toShort).putShort(0.toShort)
              .putDouble(d)
            sheetRecs += rec(RecNUMBER, b.array())
          case s =>
            val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
            b.putShort(r.toShort).putShort(c.toShort).putShort(0.toShort)
              .putInt(strings(s.toString))
            sheetRecs += rec(RecLABELSST, b.array())
        }
      }
    }
    sheetRecs += rec(RecEOF, Array.empty)
    val sheetBytes = sheetRecs.toSeq.flatten.toArray

    // globals: BOF, CODEPAGE(utf16), WINDOW1, SST, BOUNDSHEET, EOF —
    // BOUNDSHEET's offset field needs the globals length, which needs
    // the BOUNDSHEET length: sheet name length is known, so compute
    // the record sizes first.
    val sheetName = "Sheet1"
    val globalsFixed = mutable.ArrayBuffer[Array[Byte]]()
    globalsFixed += rec(RecBOF, bofBody(0x0005))
    globalsFixed += rec(RecCODEPAGE,
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(0x04B0.toShort).array()) // UTF-16
    globalsFixed += rec(RecWINDOW1,
      ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(0x0168.toShort).putShort(0x001F.toShort)
        .putShort(0x3A5C.toShort).putShort(0x1F33.toShort)
        .putShort(0x0038.toShort).putShort(0.toShort).putShort(0.toShort)
        .putShort(1.toShort).putShort(0x0258.toShort).array())
    val sstBody = {
      val parts = mutable.ArrayBuffer[Array[Byte]]()
      val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      head.putInt(math.max(totalRefs, strings.size)).putInt(strings.size)
      parts += head.array()
      strings.keys.foreach(s => parts += xlString(s))
      parts.toSeq.flatten.toArray
    }
    require(sstBody.length <= 8224,
      "Xls.write: SST exceeds one record (string table too large for the minimal writer)")
    globalsFixed += rec(RecSST, sstBody)
    val boundsheetLen = 4 + 8 + sheetName.length // header + body (compressed name)
    val globalsLen = globalsFixed.map(_.length).sum + boundsheetLen + 4 // + EOF
    val bs = ByteBuffer.allocate(8 + sheetName.length).order(ByteOrder.LITTLE_ENDIAN)
    bs.putInt(globalsLen) // absolute offset of the sheet BOF
    bs.put(0.toByte).put(0.toByte) // visible, worksheet
    bs.put(sheetName.length.toByte).put(0.toByte) // cch, compressed
    bs.put(sheetName.getBytes("ISO-8859-1"))
    globalsFixed += rec(RecBOUNDSHEET, bs.array())
    globalsFixed += rec(RecEOF, Array.empty)

    val workbook = globalsFixed.toSeq.flatten.toArray ++ sheetBytes
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
    java.nio.file.Files.write(p, Cfb.writeStream("Workbook", workbook))
  }
}
