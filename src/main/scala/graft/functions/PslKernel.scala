package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix (registrable-domain / eTLD+1) resolution against a
  * SUPPLIED rule table — publicsuffix.org list semantics (normal
  * rules, `*.` wildcards, `!` exceptions, `//` comment lines), the
  * grouping key real crawl pipelines cap/dedup/schedule on: raw
  * host keys over-split sites (`a.blogspot.com` and `b.blogspot.com`
  * are ONE operator under the PSL's `blogspot.com` rule), while a
  * naive "last two labels" heuristic merges distinct sites under
  * multi-label suffixes (`a.co.uk` vs `b.co.uk`). The rule table is
  * DATA (a column of rule strings), not a bundled list — the engine
  * ships mechanism; the pipeline supplies the PSL snapshot it pins.
  *
  * Match semantics (publicsuffix.org/list — the public algorithm):
  * a rule matches when its labels are a suffix of the host's labels,
  * `*` matching exactly one label. The prevailing rule is any
  * matching EXCEPTION rule (public suffix = the exception rule with
  * its leftmost label removed), else the LONGEST matching rule, else
  * the implicit `*` (public suffix = the host's last label).
  * Registrable domain = public suffix plus one more host label;
  * null when the host IS a public suffix.
  *
  * Scale: the PSL is bounded side data (~10⁴ rules — the
  * centroid/BPE-merge class of driver-collected inputs); it compiles
  * once into three hash sets embedded in a codegen expression via
  * `addReferenceObj`, so resolution is a per-row hash-probe loop
  * over the host's OWN suffixes (≤ label count) riding the scan —
  * ZERO joins, ZERO shuffles, and no |rules| factor per row.
  */
object PslKernel {

  /** Compiled rule table: plain suffixes, wildcard tails (`*.ck`
    * stored as `ck`), exception suffixes (`!www.ck` as `www.ck`).
    */
  final class Rules(val normal: java.util.HashSet[String],
                    val wildcard: java.util.HashSet[String],
                    val exception: java.util.HashSet[String])
      extends Serializable

  /** Parse raw PSL lines: trim, lowercase, drop blanks + `//`
    * comments (the list's own file format).
    */
  def compile(rules: Seq[String]): Rules = {
    val n = new java.util.HashSet[String]()
    val w = new java.util.HashSet[String]()
    val e = new java.util.HashSet[String]()
    rules.iterator.map(r => if (r == null) "" else r.trim.toLowerCase)
      .filter(r => r.nonEmpty && !r.startsWith("//"))
      .foreach { r =>
        if (r.startsWith("!")) e.add(r.substring(1))
        else if (r.startsWith("*.")) w.add(r.substring(2))
        else n.add(r)
      }
    new Rules(n, w, e)
  }

  /** Index of the label where the public suffix starts (0-based into
    * the host's labels), or -1 for a null/empty host. Exceptions
    * prevail over any (even longer) normal/wildcard match; ties to
    * the publicsuffix.org algorithm doc. Clamped to the last label
    * so a degenerate single-label exception rule stays total.
    */
  private def psLabel(host: String, offs: Array[Int], rules: Rules): Int = {
    val n = offs.length
    var excI = -1
    var matchI = -1
    var i = 0
    while (i < n && excI < 0) {
      val suf = host.substring(offs(i))
      if (rules.exception.contains(suf)) excI = i
      else if (matchI < 0 &&
          (rules.normal.contains(suf) ||
            (i + 1 < n && rules.wildcard.contains(host.substring(offs(i + 1))))))
        matchI = i
      i += 1
    }
    val ps = if (excI >= 0) excI + 1 else if (matchI >= 0) matchI else n - 1
    math.min(ps, n - 1)
  }

  private def labelOffsets(host: String): Array[Int] = {
    var cnt = 1
    var i = 0
    while (i < host.length) { if (host.charAt(i) == '.') cnt += 1; i += 1 }
    val offs = new Array[Int](cnt)
    offs(0) = 0
    var o = 1
    i = 0
    while (i < host.length) {
      if (host.charAt(i) == '.') { offs(o) = i + 1; o += 1 }
      i += 1
    }
    offs
  }

  /** Executor path (codegen calls these). Hosts are lowercased
    * defensively (urlNormalize output already is).
    */
  def publicSuffix(host: UTF8String, rules: Rules): UTF8String = {
    val h = host.toString.toLowerCase
    if (h.isEmpty) return null
    val offs = labelOffsets(h)
    UTF8String.fromString(h.substring(offs(psLabel(h, offs, rules))))
  }

  def regDomain(host: UTF8String, rules: Rules): UTF8String = {
    val h = host.toString.toLowerCase
    if (h.isEmpty) return null
    val offs = labelOffsets(h)
    val ps = psLabel(h, offs, rules)
    if (ps < 1) null
    else UTF8String.fromString(h.substring(offs(ps - 1)))
  }

  def publicSuffixCol(host: Column, rules: Seq[String]): Column =
    ColumnBridge.column(PslExpr(ColumnBridge.expression(host), rules,
      wantSuffix = true))

  def regDomainCol(host: Column, rules: Seq[String]): Column =
    ColumnBridge.column(PslExpr(ColumnBridge.expression(host), rules,
      wantSuffix = false))
}

/** `public_suffix(host)` / `reg_domain(host)` under a fixed compiled
  * rule table (see [[PslKernel]]). One expression per output — both
  * ride whole-stage codegen; the compiled sets are shared per
  * expression instance via `addReferenceObj`.
  */
case class PslExpr(child: Expression, rules: Seq[String],
                   wantSuffix: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string host, got ${child.dataType}")

  @transient private lazy val compiled: PslKernel.Rules =
    PslKernel.compile(rules)

  override def nullSafeEval(h: Any): Any =
    if (wantSuffix) PslKernel.publicSuffix(h.asInstanceOf[UTF8String], compiled)
    else PslKernel.regDomain(h.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslRules", compiled,
      classOf[PslKernel.Rules].getName)
    val fn = if (wantSuffix) "publicSuffix" else "regDomain"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PslKernel.$fn($c, $ref);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
