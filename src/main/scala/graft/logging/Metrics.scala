package graft.logging

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Run telemetry as data — the Spark-native version of the reference's
  * per-module stats (`dbitoolstat`, /root/reference/scripts/
  * dbitool.pl:595-623: rows/kB per module printed at close).
  *
  * `observed` attaches an `Observation` to a DataFrame: row/byte-ish
  * counters are collected DURING the action that consumes the frame —
  * zero extra passes (unlike `df.count()`, which re-runs the plan).
  * After the action, `collect()` exposes all counters as a DataFrame,
  * queryable like any other table (the reference's log-as-data idea,
  * §3.3).
  */
object Metrics {

  final class Registry {
    private val obs = mutable.LinkedHashMap[String, Observation]()

    /** Wrap a frame with named row/null-count observation. */
    def observed(df: DataFrame, name: String,
                 countCols: Seq[String] = Nil): DataFrame = {
      val o = Observation(name)
      obs(name) = o
      val aggs = count(lit(1)).as("rows") +:
        countCols.map(c => count(col(c)).as(s"nonnull_$c"))
      df.observe(o, aggs.head, aggs.tail: _*)
    }

    /** Counters gathered so far (an action must have consumed each
      * observed frame), as rows (stage, metric, value).
      */
    def collect(spark: SparkSession): DataFrame = {
      import spark.implicits._
      obs.toSeq.flatMap { case (name, o) =>
        o.getAsJava.asInstanceOf[java.util.Map[String, Any]]
          .entrySet().toArray.map { e0 =>
            val e = e0.asInstanceOf[java.util.Map.Entry[String, Any]]
            (name, e.getKey, e.getValue.toString.toDouble)
          }.toSeq
      }.toDF("stage", "metric", "value")
    }
  }

  def registry(): Registry = new Registry
}
