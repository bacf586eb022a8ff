package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SHA-1/base32 payload digest — the digest CDXJ actually ships
  * (`sha1:XXXX…`, 20 SHA-1 bytes in RFC 4648 base32 = exactly 32
  * chars, uppercase, no padding): the LAST documented interop gap of
  * the capture index after the www/port collapse (r19) and the
  * replay locators (q284). Wayback-family tools compare this string
  * to decide revisit/identity, so emitting it makes the published
  * CDXJ consumable by standard archive tooling.
  *
  * Oracle posture (documented up front): DuckDB 1.0 has NO sha1, so
  * this column is NOT oracle-replayable — the md5 digest stays the
  * default (every q269-family oracle row replays it byte-for-byte)
  * and sha1-b32 is an opt-in second column pinned at the kernel level
  * instead (FormatsSpec: RFC 3174 test vectors against hardcoded
  * base32 strings, expression ≡ reference equality on fixture
  * payloads — the deflate-kernel precedent).
  *
  * Scale: per-row kernel riding the container scan, inside
  * whole-stage codegen via [[Sha1B32Expr]]; MessageDigest is
  * thread-local + reset per row.
  */
object Sha1B32Kernel {

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567".toCharArray

  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-1")
  }

  /** RFC 4648 base32 of exactly 20 digest bytes → 32 chars (160 bits
    * = 32 × 5, so no padding exists to omit).
    */
  private def base32(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var acc = 0L
    var bits = 0
    var i = 0
    var o = 0
    while (i < d.length) {
      acc = (acc << 8) | (d(i) & 0xFFL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        out(o) = B32(((acc >> bits) & 31L).toInt)
        o += 1
      }
      i += 1
    }
    new String(out)
  }

  /** The executor path (codegen calls this): sha1-base32 of raw
    * payload bytes.
    */
  def sha1B32(bytes: Array[Byte]): UTF8String = {
    val md = local.get()
    md.reset()
    UTF8String.fromString(base32(md.digest(bytes)))
  }

  /** Independent reference for the spec's equality pin: fresh
    * MessageDigest per call, base32 via BigInteger arithmetic —
    * shares only the SHA-1/RFC 4648 CONTRACT with the kernel path.
    */
  def sha1B32Reference(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val n = new java.math.BigInteger(1, d)
    val sb = new StringBuilder
    var i = 31
    while (i >= 0) {
      sb.append("ABCDEFGHIJKLMNOPQRSTUVWXYZ234567".charAt(
        n.shiftRight(i * 5).and(java.math.BigInteger.valueOf(31L)).intValue))
      i -= 1
    }
    sb.toString
  }

  def sha1B32Col(c: Column): Column =
    ColumnBridge.column(Sha1B32Expr(ColumnBridge.expression(c)))
}

case class Sha1B32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a binary input, got ${child.dataType}")

  override def nullSafeEval(b: Any): Any =
    Sha1B32Kernel.sha1B32(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sha1B32Kernel.sha1B32($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
