package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** The SQL surface must reach the same codegen'd kernels as the Column
  * API — checked by running the functions from spark.sql text.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  GraftExtensions.register(spark)

  test("graft_cosine / graft_dot from SQL") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("graft_word_ngrams / graft_hashed_shingles / graft_jaccard_sorted from SQL") {
    val r = spark.sql(
      """SELECT graft_word_ngrams('a b c d', 2) AS g,
        |  graft_jaccard_sorted(graft_hashed_shingles('a b c d', 3),
        |                       graft_hashed_shingles('a b c d', 3)) AS j""".stripMargin)
      .head()
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getDouble(1) == 1.0)
  }

  test("graft_char_entropy and graft_containment_sorted from SQL") {
    val r = spark.sql(
      """SELECT graft_char_entropy('aaaa') AS z,
        |  round(graft_char_entropy('ab'), 4) AS h,
        |  graft_containment_sorted(graft_md5_shingles('a b c', 3),
        |                           graft_md5_shingles('a b c d e', 3)) AS c""".stripMargin)
      .head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 0.6931) // ln 2 quantized
    assert(r.getDouble(2) == 1.0)    // 'a b c' shingles inside the longer doc
  }

  test("graft_winnow and graft_token_set_count from SQL") {
    val r = spark.sql(
      """SELECT size(graft_winnow('the quick brown fox jumps over it', 8, 4)) AS n,
        |  graft_token_set_count('the cat and the hat', array('the', 'and')) AS c""".stripMargin)
      .head()
    assert(r.getInt(0) > 0)
    assert(r.getInt(1) == 3)
  }

  test("graft_simhash from SQL matches the Column API") {
    val viaSql = spark.sql(
      "SELECT graft_simhash('the quick brown fox') AS fp").head().getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.TextExpr.simhash64(
        org.apache.spark.sql.functions.lit("the quick brown fox")))
      .head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("graft_minhash from SQL: numPerm slots, identical for identical text") {
    val r = spark.sql(
      """SELECT graft_minhash('a b c d e f', 3, 16) AS s1,
        |       graft_minhash('a b c d e f', 3, 16) AS s2,
        |       graft_minhash('totally different words here now', 3, 16) AS s3
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 16)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0) != r.getSeq[Long](2))
  }

  test("portable md5 family from SQL matches the Column API and md5()") {
    // graft_simhash_md5 / graft_minhash_md5 / graft_md5_shingles /
    // graft_winnow_md5 expose the oracle-replayable kernels in SQL.
    val r = spark.sql(
      """SELECT graft_simhash_md5('the quick brown fox') AS fp,
        |  graft_minhash_md5('a b c d e f', 3, 16) AS sig,
        |  graft_md5_shingles('a b c', 3) AS sh,
        |  size(graft_winnow_md5('the quick brown fox jumps over everything', 8, 4)) AS nw,
        |  CAST(conv(substr(md5('a b c'), 1, 15), 16, 10) AS BIGINT) AS ref
        |""".stripMargin).head()
    val viaCol = spark.range(1)
      .select(graft.functions.PortableExpr.simhashMd5(
        org.apache.spark.sql.functions.lit("the quick brown fox")))
      .head().getLong(0)
    assert(r.getLong(0) == viaCol)
    assert(r.getSeq[Long](1).length == 16)
    // single 3-gram "a b c": its kernel hash equals the builtin
    // md5-prefix formulation evaluated by Spark SQL itself
    assert(r.getSeq[Long](2) == Seq(r.getLong(4)))
    assert(r.getInt(3) > 0)
    // int8 quantize-dequantize kernel from SQL
    val qd = spark.sql(
      "SELECT graft_quantize_dequantize(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))) AS d")
      .head().getSeq[Double](0)
    assert(qd.head == 1.0 && math.abs(qd(1) + 0.5) < 1.0 / 127)
  }

  test("graft_normalize from SQL (composed-builtins builder)") {
    val r = spark.sql(
      "SELECT graft_normalize('  Hello,   WORLD!! 42  ') AS n").head()
    assert(r.getString(0) == "hello world 42")
  }

  test("graft_zorder from SQL matches the Column API and the bit spec") {
    val r = spark.sql(
      "SELECT graft_zorder(3L, 2L) AS z, graft_zorder(65539L, 2L) AS zm")
      .head()
    // interleave(x=0b11, y=0b10) = y1 x1 y0 x0 = 1 1 0 1 = 13
    assert(r.getLong(0) == 13L)
    assert(r.getLong(1) == 13L) // masks see only the low 16 bits
    import spark.implicits._
    val api = Seq((3L, 2L)).toDF("x", "y")
      .select(graft.operators.Ops.zorder2($"x", $"y")).head.getLong(0)
    assert(api == 13L)
  }

  test("graft_jaro_winkler and graft_nfc from SQL") {
    val r = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS j, " +
        "length(graft_nfc(concat('cafe', '\u0301'))) AS n").head()
    assert(r.getDouble(0) == 0.9611111111111111)
    assert(r.getInt(1) == 4) // combining mark composed into é
  }

  test("SQL results match the Column API on the corpus") {
    import spark.implicits._
    Tables(spark, sf, "documents").createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT sum(size(graft_hashed_shingles(text, 3))) FROM docs_ext")
      .head().getLong(0)
    val viaApi = Tables(spark, sf, "documents")
      .select(graft.operators.Dedup.hashedShingles($"text", 3).as("h"))
      .selectExpr("sum(size(h))").head().getLong(0)
    assert(viaSql == viaApi)
  }

  test("non-literal n is rejected with a clear error") {
    val e = intercept[Exception](spark.sql(
      "SELECT graft_word_ngrams('a b', cast(rand() * 3 AS INT))").head())
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("extensions install into a fresh session via withExtensions") {
    // `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext at first-session creation, so a late second session
    // can't pick it up from conf; the public withExtensions builder is
    // the same injection path, testable over the existing context.
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = s2.sql("SELECT graft_dot(array(2.0D, 0.0D), array(3.0D, 1.0D))")
        .head().getDouble(0)
      assert(v == 6.0)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }
}
