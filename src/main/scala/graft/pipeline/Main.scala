package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI twin of the reference's `dbitool` entry point:
  *
  *   runMain graft.pipeline.Main fileread:in=a.csv csvread \
  *     filter:expr=x>1 csvwrite filewrite:out=b.csv
  *
  * `--listmodules` prints the registry table
  * (reference dbitool.pl:158-171); `-v` prints the run log and
  * per-stream row stats (loglevel ≥2, dbitool.pl:815-818).
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.contains("--listmodules")) {
      println(f"${"module"}%-16s ${"in"}%-5s ${"out"}%-5s args")
      Pipeline.listModules.foreach { case (n, i, o, h) =>
        println(f"$n%-16s $i%-5s $o%-5s $h")
      }
      return
    }
    val verbose = args.contains("-v")
    // Reference global options (dbitool.pl:38-57): --errorsize is the
    // error budget; --streamsize/--memorylimit tune its cooperative
    // scheduler and have no Spark equivalent — accepted for CLI compat.
    def optVal(name: String): Option[String] =
      args.collectFirst { case a if a.startsWith(s"--$name=") =>
        a.drop(name.length + 3) }
    val errorSize = optVal("errorsize").map(_.toInt).getOrElse(3)
    require(errorSize >= 1 && errorSize <= 256,
      s"--errorsize must be 1..256, got $errorSize") // dbitool.pl:56
    val words = args.filterNot(_.startsWith("-")).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val result = Pipeline.run(spark, words, stats = verbose,
      errorSize = errorSize)
    if (verbose) {
      result.log.collect().foreach(r => System.err.println(s"log: $r"))
      result.streamStats.foreach { case (s, n) =>
        System.err.println(f"stream $s%-12s $n%8d rows")
      }
      System.err.println(f"dbitool stop in ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
