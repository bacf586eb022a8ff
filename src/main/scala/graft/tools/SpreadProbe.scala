package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 scratch: isolate the cost of the kernel-spread exchange at
  * several widths on the q236 score-pass shape. Not part of the suite.
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")

    def pass(src: org.apache.spark.sql.DataFrame) = {
      val withP = src.select(col("doc_id"),
        graft.functions.NgramCountExpr.bigramCounts(col("text"), "char")
          .as("__p"))
      withP.select(col("doc_id"), explode(col("__p")).as("__e"))
        .select(col("doc_id"), col("__e.w1").as("__w1"),
          col("__e.w2").as("__w2"), col("__e.c").as("__c"))
        .groupBy(col("doc_id")).agg(sum(col("__c")).as("n"))
    }
    def time(tag: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      // warm
      f.write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-12s min=${ts.min}%.3f  samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("width=scan", pass(docs))
    for (w <- Seq(2, 4, 8, 16, 32))
      time(s"width=$w", pass(docs.repartition(w)))
    spark.stop()
  }
}
