package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the canonical text rendering of scale-0 wide decimals that the
  * driver-facing queries (q198/q202/q214) now emit instead of raw
  * DECIMAL(38,0) columns: Spark's decimal→string cast must produce the
  * plain digit string — no sign for non-negatives, no exponent, no
  * decimal point, no leading zeros — because the DuckDB oracle's
  * `CAST(x AS VARCHAR)` renders the same way and the driver hashes the
  * strings byte-for-byte. Raw wide-decimal outputs hash-diverged in the
  * driver environment three rounds straight while the values agreed
  * (r13 VERDICT directive #1); canonical digit strings make the output
  * representation-independent.
  */
class DecimalCanonSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val digits = "^(0|[1-9][0-9]*)$".r

  test("decimal(38,0) → string is the plain digit string across the range") {
    val cases = Seq(
      "0", "1", "42", "1000000000000000000", // 10^18 boundary
      "18446744073709551616", // 2^64 — past any BIGINT
      "99999999999999999999999999999999999999") // max decimal(38,0)
    val rendered = cases.toDF("s")
      .select($"s", $"s".cast("decimal(38,0)").cast("string").as("r"))
      .collect()
    rendered.foreach { row =>
      assert(row.getString(1) == row.getString(0),
        s"round-trip broke: ${row.getString(0)} -> ${row.getString(1)}")
      assert(digits.matches(row.getString(1)),
        s"not a plain digit string: ${row.getString(1)}")
    }
  }

  test("sum-of-decimal output renders identically pre- and post-cast") {
    // The exact shape q214 ships: a decimal(38,0) SUM cast to string.
    val df = spark.range(1, 1001)
      .select((col("id") * col("id")).cast("decimal(38,0)").as("d"))
      .agg(sum($"d").cast("decimal(38,0)").as("fp"))
      .select($"fp".cast("string").as("s"), $"fp")
    val row = df.head()
    assert(row.getString(0) == row.getDecimal(1).toBigInteger.toString)
    assert(digits.matches(row.getString(0)))
  }

  test("the trio's output schemas carry no wide decimal") {
    val dir = TestSpark.sf
    val trio = Seq("q198_auc_exact", "q202_ks_drift", "q214_shard_manifest")
    trio.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val wide = df.schema.fields.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
      assert(wide.isEmpty,
        s"$q still emits decimal columns: ${wide.map(_.name).mkString(",")}")
    }
  }
}
