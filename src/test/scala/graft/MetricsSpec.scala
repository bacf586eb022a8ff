package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.logging.Metrics

class MetricsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("observed counters collect during the consuming action") {
    val reg = Metrics.registry()
    val li = reg.observed(
      Tables(spark, sf, "lineitem").filter($"l_quantity" > 25.0),
      "filtered_lineitem", countCols = Seq("l_returnflag"))
    val n = li.count() // the action that populates the observation
    val m = reg.collect(spark)
    val rows = m.filter($"stage" === "filtered_lineitem" && $"metric" === "rows")
      .select("value").head().getDouble(0)
    assert(rows == n.toDouble)
    val nonnull = m.filter($"metric" === "nonnull_l_returnflag")
      .select("value").head().getDouble(0)
    assert(nonnull == n.toDouble)
  }
}
