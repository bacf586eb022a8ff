package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan-inspection harness: prints the formatted physical plan for the
  * named queries (or a summary line for all) — the "is this the plan
  * you'd want at 100 TB" review loop.
  */
object Explain {

  /** The AQE-final physical plan. `finalPhysicalPlan` materializes the
    * adaptive plan (executing intermediate stages) so `*(n)` codegen
    * spans and runtime join conversions become visible — the
    * pre-execution `executedPlan` is an AdaptiveSparkPlan wrapper whose
    * string carries NO codegen markers, which made the old summary
    * print codegenSpans=0 for every query (VERDICT r5 #3).
    */
  def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
    case p => p
  }

  /** Operators genuinely inside whole-stage-codegen spans: the subtree
    * under each WholeStageCodegenExec, stopping at InputAdapter (whose
    * children run OUTSIDE the span — a plain subtree `collect` would
    * count them as fused when they are not).
    */
  def codegenNodes(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case w: WholeStageCodegenExec => insideSpan(w.child)
    // AQE query stages are LEAVES (children = Nil): the materialized
    // subtree hangs off .plan, so a plain tree walk would never see the
    // codegen spans below a shuffle/broadcast stage boundary.
    case q: QueryStageExec => codegenNodes(q.plan)
    case a: AdaptiveSparkPlanExec => codegenNodes(a.finalPhysicalPlan)
    case other => other.children.flatMap(codegenNodes)
  }

  private def insideSpan(p: SparkPlan): Seq[SparkPlan] = p match {
    case i: InputAdapter => codegenNodes(i.child)
    case q: QueryStageExec => codegenNodes(q.plan)
    case other => other +: other.children.flatMap(insideSpan)
  }

  /** All nodes, descending through AQE stage boundaries. */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val below = plan match {
      case q: QueryStageExec => allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => allNodes(a.finalPhysicalPlan)
      case other => other.children.flatMap(allNodes)
    }
    plan +: below
  }

  def codegenSpans(plan: SparkPlan): Int =
    allNodes(plan).count(_.isInstanceOf[WholeStageCodegenExec])

  /** True iff some operator INSIDE a codegen span mentions `marker`
    * (case-insensitive) — i.e. the expression compiled into generated
    * code rather than falling back to interpreted eval.
    */
  def inCodegen(plan: SparkPlan, marker: String): Boolean = {
    val m = marker.toLowerCase
    codegenNodes(plan).exists(_.simpleString(Int.MaxValue).toLowerCase.contains(m))
  }

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
        val fp = finalPlan(df)
        val plan = fp.toString()
        val shuffles = "Exchange".r.findAllIn(plan).length
        val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
        val scans = "Scan parquet".r.findAllIn(plan).length
        val codegen = codegenSpans(fp)
        println(f"$n%-26s shuffles=${shuffles - broadcasts}%2d broadcast=$broadcasts%2d scans=$scans%2d codegenSpans=$codegen%2d")
      }
    }
    spark.stop()
  }
}
