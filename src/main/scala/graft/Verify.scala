package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** HEAD commit of THIS repo, resolved by reading .git/HEAD -> refs ->
    * packed-refs directly — "unknown" when no checkout is found, never
    * throws. Root resolution order (ADVICE r12 — a cwd-first walk
    * mis-attributes the SHA when the launcher's cwd sits in a DIFFERENT
    * enclosing repo): 1) $SPARK_GRAFT_REPO if set; 2) walk up from
    * `anchor` (Verify passes its outDir — inside the checkout by
    * construction); 3) walk up from the process cwd. `.git` may be a
    * worktree/submodule gitdir-POINTER FILE (`gitdir: <path>`), which
    * is followed (relative paths resolve against the pointer's dir).
    */
  def gitSha(anchor: Option[String] = None): String = try {
    def gitDirAt(p: java.nio.file.Path): Option[java.nio.file.Path] = {
      val g = p.resolve(".git")
      if (Files.isDirectory(g)) Some(g)
      else if (Files.isRegularFile(g)) {
        // worktree/submodule: ".git" is a one-line pointer file
        val line = Files.readString(g).trim
        if (!line.startsWith("gitdir:")) None
        else {
          val tgt = Paths.get(line.stripPrefix("gitdir:").trim)
          val abs = if (tgt.isAbsolute) tgt else p.resolve(tgt).normalize
          if (Files.isDirectory(abs)) Some(abs) else None
        }
      } else None
    }
    def walkUp(from: java.nio.file.Path): Option[java.nio.file.Path] = {
      var dir = from.toAbsolutePath.normalize
      var found: Option[java.nio.file.Path] = None
      while (dir != null && found.isEmpty) {
        found = gitDirAt(dir); if (found.isEmpty) dir = dir.getParent
      }
      found
    }
    val roots: Seq[Option[java.nio.file.Path]] =
      Seq(sys.env.get("SPARK_GRAFT_REPO").flatMap(r => walkUp(Paths.get(r))),
        anchor.flatMap(a => walkUp(Paths.get(a))),
        walkUp(Paths.get("")))
    roots.flatten.headOption match {
      case None => "unknown"
      case Some(git) =>
        // worktree gitdirs keep HEAD locally but refs in commondir
        val common = {
          val cd = git.resolve("commondir")
          if (!Files.isRegularFile(cd)) git
          else {
            val c = Paths.get(Files.readString(cd).trim)
            (if (c.isAbsolute) c else git.resolve(c)).normalize
          }
        }
        val head = Files.readString(git.resolve("HEAD")).trim
        if (!head.startsWith("ref: ")) head
        else {
          val ref = head.stripPrefix("ref: ").trim
          val loose = Seq(git.resolve(ref), common.resolve(ref))
            .find(Files.exists(_))
          loose.map(p => Files.readString(p).trim).getOrElse {
            val packed = common.resolve("packed-refs")
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
    SparkEntry.assertContract("verify")
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
    Files.writeString(Paths.get(s"$outDir/git_sha.txt"),
      gitSha(anchor = Some(outDir)) + "\n")
    spark.stop()
  }
}
