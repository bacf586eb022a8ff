package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: prints the formatted physical plan for the
  * named queries (or a summary line for all) — the "is this the plan
  * you'd want at 100 TB" review loop.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (args.nonEmpty) {
        println(s"===== $n =====")
        df.explain("formatted")
      } else {
        val plan = df.queryExecution.executedPlan.toString()
        val shuffles = "Exchange".r.findAllIn(plan).length
        val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
        val scans = "Scan parquet".r.findAllIn(plan).length
        val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        println(f"$n%-26s shuffles=${shuffles - broadcasts}%2d broadcast=$broadcasts%2d scans=$scans%2d codegenSpans=$codegen%2d")
      }
    }
    spark.stop()
  }
}
