package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Gates on the bench harness itself (VERDICT r5 #1/#2): a crashing
  * query must surface a visible per-query error and a non-zero rc —
  * never a near-zero "passing" time — and the round-robin protocol
  * must report both per-query min and median.
  */
class BenchSpec extends AnyFunSuite {
  import TestSpark._

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  private val bad: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).selectExpr("assert_true(id > 0, 'boom') as a")

  test("queries and oracleSql are in exact 1:1 sync (contract drift gate)") {
    val (noOracle, noQuery) = SparkEntry.contractDrift
    assert(noOracle.isEmpty,
      s"queries without an oracleSql entry: ${noOracle.toSeq.sorted}")
    assert(noQuery.isEmpty,
      s"oracleSql entries without a query: ${noQuery.toSeq.sorted}")
  }

  test("broken query records an error and rc=1, never a near-zero time") {
    val res = Bench.run(spark, "unused",
      Map("z_ok" -> good, "a_broken" -> bad), passes = 2)
    val broken = res.results.toMap.apply("a_broken")
    assert(broken.samples.isEmpty, "failed sample must not be timed")
    assert(broken.errors.size == 2 && broken.errors.head.contains("boom"))
    assert(res.rc == 1)
    assert(res.json.contains(""""errors":{"a_broken":"""))
    assert(res.json.contains(""""rc":1"""))
  }

  test("watchdog: an over-budget sample becomes an error row and skips remaining passes") {
    // r15 regression class: one pathological query (q245) ran ~40
    // min/sample and timed out the ENTIRE driver artifact (rc=124,
    // zero data). With the per-sample budget the slow query must cost
    // exactly one error row while the healthy query still gets all
    // its samples and the artifact stays complete.
    val slow: (SparkSession, String) => DataFrame = (s, _) => {
      val f = org.apache.spark.sql.functions.udf { (id: Long) =>
        Thread.sleep(30000); id
      }
      s.range(4).select(f(org.apache.spark.sql.functions.col("id")).as("v"))
    }
    val res = Bench.run(spark, "unused",
      Map("a_slow" -> slow, "z_ok" -> good), passes = 3, budgetSecs = 2.0)
    val sl = res.results.toMap.apply("a_slow")
    assert(sl.samples.isEmpty, "an over-budget sample must not be timed")
    assert(sl.errors.size == 1, s"remaining passes must be skipped: ${sl.errors}")
    assert(sl.errors.head.startsWith("over budget"))
    val ok = res.results.toMap.apply("z_ok")
    assert(ok.samples.size == 3, "healthy query must keep all samples")
    assert(res.rc == 1 && res.json.contains(""""a_slow":"over budget"""))
  }

  test("watchdog degrades, doesn't zero: a burst after completed samples keeps rc=0") {
    // VERDICT r17 #4: the r17 driver artifact went rc=1 because ONE
    // ambient steal burst pushed one sample of q224 over budget after
    // that row already had completed samples — zeroing a row that has
    // a measured floor fails the whole round for weather. A row with
    // completed samples must keep their min, be tagged over_budget,
    // and leave rc=0; rc=1 stays reserved for rows with NO completed
    // sample (the watchdog test above).
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      val n = calls.incrementAndGet()
      val f = org.apache.spark.sql.functions.udf { (id: Long) =>
        if (n > 1) Thread.sleep(30000); id
      }
      s.range(4).select(f(org.apache.spark.sql.functions.col("id")).as("v"))
    }
    val res = Bench.run(spark, "unused",
      Map("a_flaky" -> flaky, "z_ok" -> good), passes = 3, budgetSecs = 2.0)
    val fl = res.results.toMap.apply("a_flaky")
    assert(fl.samples.size == 1, s"first completed sample must be kept: $fl")
    assert(fl.errors.size == 1 && fl.errors.head.startsWith("over budget"))
    assert(res.rc == 0, "a degraded row with a measured floor must not fail the run")
    assert(res.overBudgetRows == Vector("a_flaky"))
    assert(res.json.contains(""""over_budget":["a_flaky"]"""))
    assert(res.json.contains(""""rc":0"""))
    // the kept min still contributes to minsum
    assert(res.minSum >= fl.min.get)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(res.compactJson)
    assert(node.get("rc").asInt() == 0 && node.get("errors").asInt() == 1)
  }

  test("all-green run has rc=0, min<=median per query, no errors field") {
    val res = Bench.run(spark, "unused", Map("q_a" -> good, "q_b" -> good), passes = 3)
    assert(res.rc == 0 && !res.json.contains("\"errors\""))
    res.results.foreach { case (_, r) =>
      assert(r.samples.size == 3)
      assert(r.min.get <= r.median.get)
    }
    assert(res.json.contains("\"mins\":{") && res.json.contains("\"queries\":{"))
    assert(res.json.contains("\"minsum\":"))
  }

  test("compactJson (the final stdout line) stays parseable and bounded") {
    // The driver reads only a ~2 kB stdout tail; the full per-query
    // line outgrew it at 146 queries (BENCH_r07/r08 "parsed": null).
    // The LAST printed line is compactJson — it must stay small and
    // valid JSON no matter how many queries SparkEntry registers.
    // Synthesize a result twice today's query count: the bound must
    // hold as the suite keeps growing, not just at the current size.
    val n = SparkEntry.queries.size * 2
    val results = (1 to n).map { i =>
      s"q${i}_some_long_query_name_$i" ->
        Bench.QueryResult(Vector(1.234567, 2.345678, 0.987654), Vector.empty)
    }.toVector
    val res = Bench.BenchResult(results, "/some/sf/dir")
    val line = res.compactJson
    assert(line.length < 500, s"compact line grew to ${line.length} chars")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber && node.get("minsum").isNumber)
    assert(node.get("n").asInt() == n)
    assert(node.get("rc").asInt() == 0 && node.get("errors").asInt() == 0)
    assert(node.get("sf").asText() == "/some/sf/dir")
  }

  test("compactJson reflects errors without growing with error detail") {
    val res = Bench.run(spark, "unused",
      Map("z_ok" -> good, "a_broken" -> bad), passes = 2)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(res.compactJson)
    assert(node.get("rc").asInt() == 1 && node.get("errors").asInt() == 1)
    assert(res.compactJson.length < 500)
  }

  test("io-tagged queries are reported but excluded from total/minsum") {
    val res = Bench.run(spark, "unused",
      Map("q_a" -> good, "q21_roundtrip_ndjson" -> good), passes = 1)
    val only = res.results.toMap.apply("q_a")
    assert(math.abs(res.total - only.median.get) < 1e-12)
    assert(math.abs(res.minSum - only.min.get) < 1e-12)
    assert(res.json.contains("\"q21_roundtrip_ndjson\":"))
    assert(res.json.contains(""""io_tagged":["q21_roundtrip_ndjson"]"""))
  }
}
