package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query runs and has a deterministic schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every query has matching oracle coverage or is declared rows-only") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q1_agg groups to exactly returnflag x linestatus combos") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 9)
    val counts = rows.map(_.getAs[Long]("count_order"))
    assert(counts.forall(_ > 0))
  }

  test("q7_topk_per_group returns at most 3 rows per customer") {
    val df = SparkEntry.queries("q7_topk_per_group")(spark, sf)
    val over = df.groupBy("o_custkey").count().filter("count > 3").count()
    assert(over == 0)
  }

  test("q9_setops union/intersect/except composition = all F-order custkeys") {
    import org.apache.spark.sql.functions._
    val orders = Tables(spark, sf, "orders")
    val expect = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct().count()
    val got = SparkEntry.queries("q9_setops")(spark, sf).count()
    assert(got == expect)
  }
}
