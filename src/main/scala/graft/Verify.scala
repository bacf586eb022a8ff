package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** HEAD commit of the repo at `cwd` (or the nearest .git upward),
    * resolved by reading .git/HEAD -> refs -> packed-refs directly.
    * "unknown" when not in a git checkout — never throws.
    */
  def gitSha(): String = try {
    var dir = Paths.get("").toAbsolutePath
    while (dir != null && !Files.isDirectory(dir.resolve(".git")))
      dir = dir.getParent
    if (dir == null) "unknown"
    else {
      val git = dir.resolve(".git")
      val head = Files.readString(git.resolve("HEAD")).trim
      if (!head.startsWith("ref: ")) head
      else {
        val ref = head.stripPrefix("ref: ").trim
        val loose = git.resolve(ref)
        if (Files.exists(loose)) Files.readString(loose).trim
        else {
          val packed = git.resolve("packed-refs")
          if (!Files.exists(packed)) "unknown"
          else Files.readString(packed).linesIterator
            .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
            .map(_.split(" ")(0)).getOrElse("unknown")
        }
      }
    }
  } catch { case _: Throwable => "unknown" }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // absolute: managed tables (q165 bucketed layout) must land
      // inside the repo regardless of the launcher's cwd
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=q51,q52 restricts the dump to matching
    // query names (prefix match). Unset = full run (the driver's mode).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // set-but-empty means unset: full run
    def selected(name: String) = only.forall(_.exists(name.startsWith))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Several queries persist() intermediates that must live through
      // the write above; without this, 160 queries' worth of cached
      // plans accumulate in one session (Bench does the same between
      // samples — ADVICE r9).
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Stamp the dump with the git SHA it was produced from: a driver
    // CORRECTNESS artifact cut mid-round is then attributable to its
    // exact commit (VERDICT r11 #8 — the r11 217/220 cost a judge
    // re-run to adjudicate). Plain file reads, no process exec.
    Files.writeString(Paths.get(s"$outDir/git_sha.txt"), gitSha() + "\n")
    spark.stop()
  }
}
