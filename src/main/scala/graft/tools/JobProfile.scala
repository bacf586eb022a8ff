package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Empirical per-job / per-stage decomposition of one bench query
  * (spark_optimization_guide §1: find where the time actually goes
  * before touching anything). No Spark UI in this sandbox, so a
  * listener plays the Stages tab: per stage — wall duration, task
  * count, executor run/CPU time, shuffle read/write bytes, spill.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.JobProfile q170_prefix_jaccard_join ..."
  *
  * Each query runs twice: pass 1 warms codegen/file listing (its
  * total is printed but its stages are discarded), pass 2 is the
  * profiled run — mirroring Bench's min-of-3 discipline.
  */
object JobProfile {
  private final case class StageRow(
      jobId: Int, stageId: Int, name: String, tasks: Int,
      wallMs: Long, runMs: Long, cpuMs: Long,
      shufReadMB: Double, shufWriteMB: Double, spillMB: Double,
      outRows: Long, scopes: String)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val stageToJob = mutable.Map.empty[Int, Int]
    val jobWall = mutable.Map.empty[Int, Long]
    val jobStart = mutable.Map.empty[Int, Long]
    var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        jobStart(js.jobId) = js.time
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobWall(je.jobId) = je.time - jobStart.getOrElse(je.jobId, je.time)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (recording) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages += StageRow(
            stageToJob.getOrElse(si.stageId, -1), si.stageId,
            si.name.takeWhile(_ != '\n').take(90), si.numTasks,
            (for {c <- si.completionTime; s <- si.submissionTime} yield c - s)
              .getOrElse(-1L),
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            m.diskBytesSpilled / 1048576.0,
            m.outputMetrics.recordsWritten max
              m.shuffleWriteMetrics.recordsWritten,
            si.rddInfos.flatMap(_.scope).map(_.name).distinct
              .mkString(">").take(120))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // PLAN_DIR/PLAN_TAG: also dump explain("formatted") for each query
    // (the plans/r19/<query>_<tag>.txt deliverable) at bench conditions.
    val planDir = sys.env.get("PLAN_DIR")
    val planTag = sys.env.getOrElse("PLAN_TAG", "before")

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      planDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/${name}_$planTag.txt"), txt)
      }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val warm = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      stages.clear(); stageToJob.clear(); jobWall.clear(); jobStart.clear()
      recording = true
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val cold = (System.nanoTime() - t1) / 1e9
      // let the listener bus drain before reading the buffers
      Thread.sleep(500)
      recording = false
      println(f"%n===== $name: warm=$warm%.2f s profiled=$cold%.2f s " +
        f"jobs=${jobWall.size} stages=${stages.size} =====")
      val byJob = stages.groupBy(_.jobId).toSeq.sortBy(_._1)
      for ((jid, ss) <- byJob) {
        println(f"  job $jid%3d wall=${jobWall.getOrElse(jid, -1L)}%6d ms")
        for (s <- ss.sortBy(_.stageId))
          println(f"    stage ${s.stageId}%4d tasks=${s.tasks}%3d " +
            f"wall=${s.wallMs}%6d run=${s.runMs}%6d cpu=${s.cpuMs}%6d ms " +
            f"sr=${s.shufReadMB}%7.1f sw=${s.shufWriteMB}%7.1f " +
            f"spill=${s.spillMB}%5.0f MB rows=${s.outRows}%9d  " +
            s"[${s.scopes}] ${s.name}")
      }
      val totWall = jobWall.values.sum
      println(f"  sum(job wall)=$totWall ms; gaps (driver/planning)=" +
        f"${(cold * 1000).toLong - totWall} ms")
    }
    spark.stop()
  }
}
