package graft.formats

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal Compound File Binary (OLE2 / [MS-CFB]) container — the
  * envelope of legacy .xls workbooks. Pure JDK.
  *
  * Reader: 512-byte-sector version 3 files; DIFAT from the header
  * (sufficient for < ~6.8 MB of FAT coverage) plus chained DIFAT
  * sectors; FAT-chained streams; mini-stream (< 4096 bytes) streams
  * via the mini FAT. Writer: single-stream files, stream padded to
  * ≥ 4096 bytes so the mini stream is never needed.
  */
object Cfb {

  private val Signature = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)
  private val SectorSize = 512
  private val MiniSectorSize = 64
  private val MiniCutoff = 4096
  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD
  private val FREESECT = 0xFFFFFFFF

  // ---- read ------------------------------------------------------------

  final case class Entry(name: String, entryType: Int, startSector: Int,
                         size: Long)

  /** Read one stream by name (case-insensitive) from a CFB file. */
  def readStream(bytes: Array[Byte], streamName: String): Array[Byte] = {
    require(bytes.length >= SectorSize, "truncated CFB file")
    require(Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a CFB (OLE2) file")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sectorShift = bb.getShort(30).toInt
    require(sectorShift == 9, s"unsupported sector size 2^$sectorShift")
    val numFatSectors = bb.getInt(44)
    val dirStart = bb.getInt(48)
    val miniFatStart = bb.getInt(60)
    val difatStart = bb.getInt(68)
    val numDifatSectors = bb.getInt(72)

    def sectorOffset(sid: Int): Int = SectorSize * (sid + 1)

    // FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < 109 && fatSectors.length < numFatSectors) {
      val s = bb.getInt(76 + i * 4)
      if (s >= 0) fatSectors += s
      i += 1
    }
    var difatSid = difatStart
    var difatGuard = 0
    while (difatSid != ENDOFCHAIN && difatSid >= 0 && difatGuard <= numDifatSectors) {
      val off = sectorOffset(difatSid)
      var j = 0
      while (j < 127 && fatSectors.length < numFatSectors) {
        val s = bb.getInt(off + j * 4)
        if (s >= 0) fatSectors += s
        j += 1
      }
      difatSid = bb.getInt(off + 127 * 4)
      difatGuard += 1
    }

    val fat = new Array[Int](fatSectors.length * 128)
    fatSectors.zipWithIndex.foreach { case (sid, k) =>
      val off = sectorOffset(sid)
      var j = 0
      while (j < 128) { fat(k * 128 + j) = bb.getInt(off + j * 4); j += 1 }
    }

    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer[Int]()
      var sid = start
      var guard = 0
      while (sid != ENDOFCHAIN && sid >= 0 && guard < fat.length + 1) {
        out += sid
        sid = fat(sid)
        guard += 1
      }
      out.toSeq
    }

    def readChain(start: Int): Array[Byte] = {
      val sids = chain(start)
      val out = new Array[Byte](sids.length * SectorSize)
      sids.zipWithIndex.foreach { case (sid, k) =>
        System.arraycopy(bytes, sectorOffset(sid), out, k * SectorSize, SectorSize)
      }
      out
    }

    // directory
    val dirBytes = readChain(dirStart)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val e = ByteBuffer.wrap(dirBytes, k * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = e.getShort(k * 128 + 64).toInt
      val name =
        if (nameLen >= 2)
          new String(dirBytes, k * 128, nameLen - 2, "UTF-16LE")
        else ""
      Entry(name, dirBytes(k * 128 + 66).toInt,
        e.getInt(k * 128 + 116), e.getLong(k * 128 + 120) & 0xFFFFFFFFL)
    }
    val root = entries.find(_.entryType == 5)
      .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
    val target = entries.find(e => e.entryType == 2 &&
        e.name.equalsIgnoreCase(streamName))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: stream '$streamName' not found (has: ${
          entries.filter(_.entryType == 2).map(_.name).mkString(", ")})"))

    if (target.size >= MiniCutoff) {
      readChain(target.startSector).take(target.size.toInt)
    } else {
      // mini stream: FAT-chained container stream owned by the root
      // entry, sliced into 64-byte mini sectors addressed by the mini FAT
      val miniContainer = readChain(root.startSector)
      val miniFatBytes = readChain(miniFatStart)
      val miniFat = ByteBuffer.wrap(miniFatBytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = mutable.ArrayBuffer[Byte]()
      var sid = target.startSector
      var guard = 0
      while (sid != ENDOFCHAIN && sid >= 0 && guard < miniFatBytes.length / 4 + 1) {
        val from = sid * MiniSectorSize
        out ++= miniContainer.slice(from, from + MiniSectorSize)
        sid = miniFat.getInt(sid * 4)
        guard += 1
      }
      out.take(target.size.toInt).toArray
    }
  }

  // ---- write -----------------------------------------------------------

  /** Write a single-stream CFB file. Streams ≥ 4096 bytes live in the
    * regular FAT; smaller streams go through the mini stream + mini
    * FAT as the spec requires (conforming readers look there based on
    * the directory size field).
    */
  def writeStream(streamName: String, data: Array[Byte]): Array[Byte] = {
    val trueSize = data.length
    val mini = trueSize < MiniCutoff

    // regular-FAT payload: either the stream itself, or the mini
    // stream container holding it in 64-byte mini sectors
    val payload =
      if (mini)
        java.util.Arrays.copyOf(data,
          (trueSize + MiniSectorSize - 1) / MiniSectorSize * MiniSectorSize)
      else data
    val payloadSectors =
      math.max(1, (payload.length + SectorSize - 1) / SectorSize)
    val miniFatSectors = if (mini) 1 else 0
    val dirSectors = 1 // 4 entries

    // FAT must also cover itself; iterate to fixpoint
    var fatSectors = 1
    def total = fatSectors + dirSectors + miniFatSectors + payloadSectors
    while (fatSectors * 128 < total) fatSectors += 1
    require(fatSectors <= 109, "CFB writer: stream too large for header DIFAT")

    // layout: [header][fat...][dir][miniFAT?][payload...]
    val dirSid = fatSectors
    val miniFatSid = dirSid + dirSectors
    val payloadSid = miniFatSid + miniFatSectors
    val out = ByteBuffer.allocate(SectorSize * (1 + total))
      .order(ByteOrder.LITTLE_ENDIAN)

    // header
    out.put(Signature)
    out.position(24)
    out.putShort(0x003E.toShort) // minor
    out.putShort(0x0003.toShort) // major 3 → 512-byte sectors
    out.putShort(0xFFFE.toShort) // little-endian marker
    out.putShort(9.toShort)      // sector shift
    out.putShort(6.toShort)      // mini sector shift
    out.position(44)
    out.putInt(fatSectors)
    out.putInt(dirSid)           // first directory sector
    out.putInt(0)                // transaction signature
    out.putInt(MiniCutoff)       // mini stream cutoff
    out.putInt(if (mini) miniFatSid else ENDOFCHAIN) // first mini FAT sector
    out.putInt(miniFatSectors)   // # mini FAT sectors
    out.putInt(ENDOFCHAIN)       // first DIFAT sector (header only)
    out.putInt(0)                // # DIFAT sectors
    var i = 0
    while (i < 109) {
      out.putInt(if (i < fatSectors) i else FREESECT)
      i += 1
    }

    // FAT
    val fat = new Array[Int](fatSectors * 128)
    java.util.Arrays.fill(fat, FREESECT)
    (0 until fatSectors).foreach(s => fat(s) = FATSECT)
    fat(dirSid) = ENDOFCHAIN
    if (mini) fat(miniFatSid) = ENDOFCHAIN
    (0 until payloadSectors).foreach { k =>
      fat(payloadSid + k) =
        if (k == payloadSectors - 1) ENDOFCHAIN else payloadSid + k + 1
    }
    fat.foreach(out.putInt)

    // directory: Root Entry (type 5) + stream + 2 unused
    def dirEntry(name: String, entryType: Int, child: Int, start: Int,
                 size: Long): Unit = {
      val base = out.position()
      val utf16 = name.getBytes("UTF-16LE")
      out.put(utf16)
      out.position(base + 64)
      out.putShort((utf16.length + 2).toShort)
      out.put(entryType.toByte)
      out.put(1.toByte) // black
      out.putInt(-1)    // left
      out.putInt(-1)    // right
      out.putInt(child)
      out.position(base + 116)
      out.putInt(start)
      out.putLong(size)
      out.position(base + 128)
    }
    // root owns the mini stream container (when present)
    dirEntry("Root Entry", 5, child = 1,
      start = if (mini) payloadSid else ENDOFCHAIN,
      size = if (mini) payload.length.toLong else 0L)
    dirEntry(streamName, 2, child = -1,
      start = if (mini) 0 else payloadSid, size = trueSize.toLong)
    // remaining two directory slots stay zeroed = unused (type 0)

    // mini FAT: chain of 64-byte mini sectors inside the container
    if (mini) {
      out.position(SectorSize * (1 + miniFatSid))
      val miniSectors = payload.length / MiniSectorSize
      (0 until miniSectors).foreach { k =>
        out.putInt(if (k == miniSectors - 1) ENDOFCHAIN else k + 1)
      }
      (miniSectors until 128).foreach(_ => out.putInt(FREESECT))
    }

    // payload
    out.position(SectorSize * (1 + payloadSid))
    out.put(payload)
    out.array()
  }
}
