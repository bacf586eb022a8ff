package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline
import graft.sources.Sources
import graft.sinks.Sinks

/** End-to-end proof of the JDBC read/write path that
  * mysqlselect/sqliteselect/sqliteinsert are wired over, using the
  * embedded Derby engine that ships on the Spark classpath (no MySQL/
  * SQLite driver jar exists in this zero-egress image; the Sources.jdbc
  * / Sinks.jdbc plumbing is identical — only the URL differs).
  */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._

  private val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private def url(db: String) = s"jdbc:derby:$dbDir/$db;create=true"

  private def withConn[A](db: String)(f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url(db))
    try f(c) finally c.close()
  }

  test("Sources.jdbc reads a query and a table") {
    withConn("read") { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE people (id INT, name VARCHAR(32))")
      st.execute("INSERT INTO people VALUES (1,'ada'), (2,'bob'), (3,'eve')")
    }
    val byQuery = Sources.jdbc(spark, url("read"),
      "SELECT id, name FROM people WHERE id <= 2")
    assert(byQuery.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    val byTable = Sources.jdbc(spark, url("read"), "people")
    assert(byTable.count() == 3)
  }

  test("Sinks.jdbc writes a DataFrame; reads back identically") {
    import spark.implicits._
    val df = Seq((10, "x"), (20, "y")).toDF("k", "v")
    Sinks.jdbc(df, url("write"), "kv")
    val back = Sources.jdbc(spark, url("write"), "kv")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      == Seq((10, "x"), (20, "y")))
  }

  test("pipeline jdbcselect/jdbcinsert modules run end-to-end") {
    withConn("pipe") { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE src (id INT, amt DOUBLE)")
      st.execute("INSERT INTO src VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    }
    val r = Pipeline.run(spark, Seq(
      s"jdbcselect:table=src:out=s:url=${url("pipe")}",
      "filter:in=s:expr=amt > 2:out=f",
      s"jdbcinsert:in=f:table=dst:url=${url("pipe")}"))
    assert(r.rowsWritten.values.sum == 2)
    val back = Sources.jdbc(spark, url("pipe"), "dst")
    assert(back.count() == 2)
  }

  test("pipeline jdbcselect assembles SQL from an in=STREAM") {
    withConn("instream") { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE t3 (id INT)")
      st.execute("INSERT INTO t3 VALUES (7), (8)")
    }
    val d = java.nio.file.Files.createTempDirectory("graft_sqlin").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/q.sql"), "SELECT id\nFROM t3\nWHERE id = 7")
    Pipeline.run(spark, Seq(
      s"fileread:in=$d/q.sql:out=q",
      s"jdbcselect:in=q:out=s:url=${url("instream")}",
      "ndjsonwrite:in=s", s"filewrite:out=$d/out"))
    val lines = new java.io.File(s"$d/out").listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines == Seq("""{"ID":7}"""))
  }
}
