package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{UrlFunctions, UrlKernels}
import graft.operators.Curation

/** Pins UrlKernels.percentDecodeUnreserved bit-equal to the portable
  * ~90-step replace chain it replaces (r13 VERDICT directive #2). The
  * chain is rebuilt here verbatim from the same unreservedEncodings
  * list the oracle interpolates, so the spec holds the kernel to the
  * exact function BOTH engines previously computed — including the
  * cascade cases where a naive single-sweep decode diverges.
  */
class UrlKernelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** The pre-kernel formulation, verbatim (ex-Curation.urlNormalize
    * step 2): ordered fold of replace() over unreservedEncodings.
    */
  private def chainDecode(c: Column): Column =
    Curation.unreservedEncodings.foldLeft(c) { case (acc, (e, d)) =>
      call_function("replace", acc, lit(e), lit(d))
    }

  private def assertAllEqual(inputs: Seq[String]): Unit = {
    val rows = inputs.toDF("s")
      .select($"s", chainDecode($"s").as("chain"),
        UrlFunctions.percentDecodeUnreserved($"s").as("kernel"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"diverged on '${r.getString(0)}': " +
          s"chain='${r.getString(1)}' kernel='${r.getString(2)}'")
    }
  }

  test("adversarial corpus: cascades, truncations, case mix, UTF-8") {
    assertAllEqual(Seq(
      "", "%", "%%", "%4", "%41", "%41%42", "a%41b",
      // cascade: %41→A completes %4A→J (chain gives "J2")
      "%4%412", "%4%4%4122", "%6%611", "%7%7e5",
      // same-rank re-creation is NOT replayed within a pass
      "%3%344", "%%41", "%%%414141",
      // lowercase hex, mixed case, digits (single-cased patterns)
      "%6f%6F%4a%4A", "%30%39%2d%2D%2e%5f%7e",
      // reserved octets must STAY encoded
      "%2F%3A%3f%26%3D%23%25", "http://a.com/%2Fpath%20x",
      // hex-lookalikes and invalid pairs
      "%G1%1G%zz%4g%g4", "%411%4111",
      // multi-byte UTF-8 around escapes
      "é%41é", "%C3%A9", "日本%7E語", "é%4%412水",
      // long no-percent fast path
      "a" * 500,
      // percent-dense
      "%" * 99, ("%41" * 50) + ("%4" * 3)))
  }

  test("randomized fuzz over a percent-dense alphabet") {
    val alphabet = "%%%0123456789ABCDEFabcdefGg~-._/?:#".toCharArray
    val rnd = new scala.util.Random(20260815L)
    val cases = (1 to 400).map { _ =>
      val n = rnd.nextInt(24)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertAllEqual(cases)
  }

  test("the q223 URL corpus itself decodes identically") {
    val docs = Tables(spark, sf, "documents")
    val url = concat(lit("HTTP://WWW.EXAMPLE-"), $"source",
      lit(".COM:80/D%6fC/"), $"doc_id".cast("string"),
      when($"doc_id" % 4 === 0,
          lit("?utm_source=feed&b=2&a=1&gclid=x#frag"))
        .when($"doc_id" % 4 === 1, lit("?z=%7E1&A=2#x"))
        .when($"doc_id" % 4 === 2, lit(""))
        .otherwise(lit("?utm_campaign=c&utm_medium=m")))
    val diff = docs.select(url.as("u"))
      .filter(chainDecode($"u") =!=
        UrlFunctions.percentDecodeUnreserved($"u"))
      .count()
    assert(diff == 0, s"$diff corpus URLs diverged")
  }

  test("no-percent input returns the very same instance (fast path)") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(
      "https://example.com/path?a=1")
    assert(UrlKernels.percentDecodeUnreserved(s) eq s)
  }

  test("SQL registration: graft_url_pctdecode") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_url_pctdecode('%4%412') AS d").head()
    assert(r.getString(0) == "J2")
  }

  test("null propagates") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(UrlFunctions.percentDecodeUnreserved($"s")).head()
    assert(r.isNullAt(0))
  }

  // ---- PslKernel: publicsuffix.org rule semantics (q290) ----

  private val pslRules = Seq(
    "// comment line", "com", "co.uk", "uk", "blogspot.com",
    "*.ck", "!www.ck", "  ", "COM") // dup after case-fold is harmless

  private def psl(hosts: Seq[String]): Seq[(String, String)] = {
    import graft.functions.PslKernel
    hosts.toDF("h").select(
        PslKernel.publicSuffixCol($"h", pslRules),
        PslKernel.regDomainCol($"h", pslRules))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
  }

  test("psl: every publicsuffix.org rule class") {
    assert(psl(Seq(
      "x.example.com",      // plain TLD rule
      "a.b.blogspot.com",   // private-domain rule beats com
      "site.co.uk",         // multi-label suffix beats uk
      "foo.z.ck",           // wildcard: ps = z.ck
      "a.www.ck",           // exception prevails over *.ck
      "www.ck",             // the exception host itself registers
      "plain.zz",           // no rule: implicit * = last label
      "com",                // host IS a public suffix -> null rd
      "single"              // one label, no rule -> ps = itself
    )) == Seq(
      ("com", "example.com"),
      ("blogspot.com", "b.blogspot.com"),
      ("co.uk", "site.co.uk"),
      ("z.ck", "foo.z.ck"),
      ("ck", "www.ck"),
      ("ck", "www.ck"),
      ("zz", "plain.zz"),
      ("com", null),
      ("single", null)))
  }

  test("psl: case-folds host, null propagates") {
    assert(psl(Seq("A.B.BlogSpot.COM")) ==
      Seq(("blogspot.com", "b.blogspot.com")))
    val r = Seq(Option.empty[String]).toDF("h")
      .select(graft.functions.PslKernel.regDomainCol($"h", pslRules)).head()
    assert(r.isNullAt(0))
  }

  test("psl: interpreted eval matches codegen") {
    import graft.functions.{PslExpr, PslKernel}
    import org.apache.spark.unsafe.types.UTF8String
    val compiled = PslKernel.compile(pslRules)
    for (h <- Seq("x.example.com", "a.www.ck", "foo.z.ck", "plain.zz",
        "com", "a.b.blogspot.com")) {
      val ps = PslKernel.publicSuffix(UTF8String.fromString(h), compiled)
      val viaDf = psl(Seq(h)).head
      assert(Option(ps).map(_.toString).orNull == viaDf._1, h)
    }
    val _ = PslExpr // touched: the expression type is the public surface
  }
}
