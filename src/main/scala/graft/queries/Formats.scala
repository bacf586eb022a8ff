package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Sources
import graft.sinks.Sinks

/** Format round-trip queries — the reference's format-conversion surface
  * (SURVEY.md §2.1-2.3: csvread/csvwrite, ndjsonread/ndjsonwrite,
  * jsonread/jsonwrite, xmlread/xmlwrite, fixedwidthread/fixedwidthwrite,
  * gzip/gunzip) made oracle-checkable: parquet table → write format X →
  * read format X back → must equal the original rows (DuckDB reads the
  * original parquet). A hash match proves the writer+reader pair is
  * lossless, types included.
  */
object Formats {

  /** One tmp root per JVM, one subdir per round-trip tag, deleted on
    * exit. Every writer here uses Overwrite, so re-invocations (e.g.
    * the bench's 3 samples) reuse the same directory instead of
    * leaking a fresh copy of the data per run — a bench run used to
    * strand hundreds of MB under /tmp, and that disk pressure fed the
    * very I/O noise the bench suffers from (VERDICT r3).
    */
  private lazy val tmpRoot: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_roundtrip")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(): Unit
      }
      rm(d.toFile)
    }
    d
  }

  private def tmpDir(tag: String): String = {
    val p = tmpRoot.resolve(tag)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Shared tail of the spreadsheet round-trips: header-row grid of
    * strings back to the nation schema. */
  private def spreadsheetGridToDf(s: SparkSession,
                                  back: Seq[Seq[String]]): DataFrame = {
    val names = back.head.map(c => Option(c).getOrElse("").trim)
    import s.implicits._
    back.tail
      .map(r => names.indices.map(i =>
        if (i < r.length) r(i) else null).toList)
      .toDF("cells")
      .select(names.zipWithIndex.map { case (n, i) =>
        col("cells").getItem(i).as(n) }: _*)
      .select(
        col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // csvwrite → csvread (header, quoting, timestamps, doubles).
    "q20_roundtrip_csv" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val out = tmpDir("csv")
      Sinks.csv(orders, out)
      Sources.csv(s, out, schema = Some(orders.schema))
        .orderBy(col("o_orderkey"))
    }),

    // ndjsonwrite → ndjsonread (streaming JSON lines — the scalable path).
    "q21_roundtrip_ndjson" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val out = tmpDir("ndjson")
      Sinks.ndjson(li, out)
      Sources.ndjson(s, out, schema = Some(li.schema))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ndjson round trip on the mid-size table: q21's plan-quality twin.
    // q21 (whole lineitem) is the right losslessness test at verify
    // scale but at bench scale it mostly measures single-machine disk
    // (17-38% of the round-3 totals) — the bench now reports q21 as an
    // I/O-tagged row excluded from the headline total (Bench.IoTagged)
    // while THIS query carries the code path in the total (VERDICT r5 #8).
    "q28_roundtrip_ndjson_orders" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val out = tmpDir("ndjson_orders")
      Sinks.ndjson(orders, out)
      Sources.ndjson(s, out, schema = Some(orders.schema))
        .orderBy(col("o_orderkey"))
    }),

    // avrowrite → avroread (Avro object containers on the Generic API:
    // long/string/double + timestamp-micros logical type round-trip).
    "q81_roundtrip_avro" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val out = tmpDir("avro")
      graft.formats.Avro.write(orders, out)
      graft.formats.Avro.read(s, out, schema = Some(orders.schema))
        .orderBy(col("o_orderkey"))
    }),

    // fixedwidthwrite → fixedwidthread (pad/truncate/trim + typed cast).
    "q22_roundtrip_fixedwidth" -> ((s, dir) => {
      val nat = Tables(s, dir, "nation")
      val out = tmpDir("fw")
      val widths = Seq(6, 24, 6)
      Sinks.fixedWidth(nat, out, widths)
      Sources.fixedWidth(s, out, widths, names = nat.columns.toSeq)
        .select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }),

    // xmlwrite → xmlread (Spark 4 built-in XML, escaping included).
    "q23_roundtrip_xml" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val out = tmpDir("xml")
      Sinks.xml(sup, out)
      Sources.xml(s, out, schema = Some(sup.schema))
        .orderBy(col("s_suppkey"))
    }),

    // jsonwrite → jsonread (single JSON array document, in-memory by
    // design — same caveat the reference documents, README.md:31-41).
    "q24_roundtrip_jsonarray" -> ((s, dir) => {
      val reg = Tables(s, dir, "region")
      val out = tmpDir("ja") + "/data.json"
      Sinks.jsonArray(reg, out)
      Sources.jsonArray(s, out, schema = Some(reg.schema))
        .orderBy(col("r_regionkey"))
    }),

    // bsonwrite → bsonread (single BSON document, in-memory by design —
    // the reference buffers the whole input too, dbitool.pl:2504-2559).
    "q26_roundtrip_bson" -> ((s, dir) => {
      val nat = Tables(s, dir, "nation")
      val out = tmpDir("bson") + "/data.bson"
      graft.formats.Bson.write(nat, out)
      graft.formats.Bson.read(s, out)
        .orderBy(col("n_nationkey"))
    }),

    // orcwrite → orcread (columnar round trip; DuckDB reads the
    // ORIGINAL parquet, so a hash match proves ORC loses nothing).
    "q27_roundtrip_orc" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val out = tmpDir("orc")
      sup.write.mode("overwrite").orc(out)
      s.read.orc(out).orderBy(col("s_suppkey"))
    }),

    // spreadsheetwrite → spreadsheetread over the pure-JDK OOXML codec
    // (dbitool.pl:2696-2784 spreadsheet surface): header row + typed
    // numeric cells through the xlsx zip, strings through shared-string
    // XML escaping, then cast back to the parquet schema. Driver-memory
    // by design — same caveat the reference documents for spreadsheets.
    // This gives the spreadsheet family a driver-visible ORACLE row
    // (previously spec-only).
    "q204_roundtrip_xlsx" -> ((s, dir) => {
      val nat = Tables(s, dir, "nation")
      val d = tmpDir("xlsx")
      val f = s"$d/nation.xlsx"
      val grid: Seq[Seq[Any]] =
        nat.columns.toSeq +:
          nat.orderBy(col("n_nationkey")).collect().toSeq.map(_.toSeq)
      graft.formats.Xlsx.write(f, grid)
      spreadsheetGridToDf(s, graft.formats.Xlsx.read(f))
    }),

    // jdbcinsert → jdbcselect round-trip on the embedded Derby engine
    // (the same Sources.jdbc/Sinks.jdbc plumbing mysqlselect/
    // sqliteselect/sqliteinsert ride — only the URL differs; no MySQL/
    // SQLite driver exists in this zero-egress image). Gives the JDBC
    // family a driver-visible ORACLE row (previously spec-only).
    "q205_roundtrip_jdbc" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val db = tmpDir("derby") + "/rt"
      Sinks.jdbc(sup, s"jdbc:derby:$db;create=true", "supplier_rt",
        mode = org.apache.spark.sql.SaveMode.Overwrite)
      Sources.jdbc(s, s"jdbc:derby:$db", "supplier_rt")
        .select(
          col("s_suppkey").cast("bigint").as("s_suppkey"),
          col("s_name"),
          col("s_nationkey").cast("int").as("s_nationkey"),
          col("s_acctbal").cast("double").as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    }),

    // spreadsheetwrite → spreadsheetread over the OpenDocument codec
    // (pure-JDK zip+XML, mimetype STORED-first per spec) — q204's ods
    // twin, so every spreadsheet codec has a driver-visible oracle row.
    "q206_roundtrip_ods" -> ((s, dir) => {
      val nat = Tables(s, dir, "nation")
      val f = tmpDir("ods") + "/nation.ods"
      val grid: Seq[Seq[Any]] =
        nat.columns.toSeq +:
          nat.orderBy(col("n_nationkey")).collect().toSeq.map(_.toSeq)
      graft.formats.Ods.write(f, grid)
      val back = graft.formats.Ods.read(f)
      spreadsheetGridToDf(s, back)
    }),

    // ...and the legacy binary xls (BIFF) codec — same grid contract.
    "q207_roundtrip_xls" -> ((s, dir) => {
      val nat = Tables(s, dir, "nation")
      val f = tmpDir("xls") + "/nation.xls"
      val grid: Seq[Seq[Any]] =
        nat.columns.toSeq +:
          nat.orderBy(col("n_nationkey")).collect().toSeq.map(_.toSeq)
      graft.formats.Xls.write(f, grid)
      val back = graft.formats.Xls.read(f)
      spreadsheetGridToDf(s, back)
    }),

    // zipwrite → zipread file-level round trip (reference TODO:48-53):
    // the csv part files zip into one archive (pure-JDK java.util.zip,
    // same plumbing as the spreadsheet codecs), extract to a fresh
    // directory, and must read back hash-identical.
    "q208_roundtrip_zip" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val src = tmpDir("zipsrc")
      val dst = tmpDir("zipdst")
      Sinks.csv(sup, src)
      val zf = tmpDir("ziparc") + "/supplier.zip"
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zf))
      val parts = new java.io.File(src).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-")).sortBy(_.getName)
      for (p <- parts) {
        zos.putNextEntry(new java.util.zip.ZipEntry(p.getName))
        java.nio.file.Files.copy(p.toPath, zos)
        zos.closeEntry()
      }
      zos.close()
      val z = new java.util.zip.ZipFile(zf)
      try {
        import scala.jdk.CollectionConverters._
        // clear stale extracts from prior bench samples
        Option(new java.io.File(dst).listFiles()).foreach(_.foreach(_.delete()))
        for (e <- z.entries().asScala) {
          val out = java.nio.file.Paths.get(dst, e.getName)
          java.nio.file.Files.copy(z.getInputStream(e), out,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } finally z.close()
      Sources.csv(s, dst, schema = Some(sup.schema))
        .orderBy(col("s_suppkey"))
    }),

    // WARC container round-trip (VERDICT r16 #1): documents → a
    // 4-shard synthetic crawl in the exact Common Crawl layout
    // (.warc.gz, ONE GZIP MEMBER PER RECORD, warcinfo head record,
    // interleaved request records) → the distributed Warc.read scan
    // (one streaming pass per file) → response-filtered rows. The
    // response filter must drop warcinfo+request records, the HTTP
    // split must recover status/mime, and the payload must round-trip
    // BYTE-exactly through Content-Length framing + multi-member gzip
    // (multi-byte UTF-8 text makes byte-vs-char confusion fail loudly).
    // The oracle replays the record construction from documents.
    "q259_roundtrip_warc" -> ((s, dir) => {
      import java.nio.charset.StandardCharsets.UTF_8
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .orderBy(col("doc_id")).collect()
      val d = tmpDir("warc")
      for ((shard, rows) <- docs.groupBy(r => (r.getLong(0) % 4).toInt)) {
        val recs =
          Iterator(("warcinfo", null: String, "2026-01-01T00:00:00Z",
            "graft synthetic crawl".getBytes(UTF_8),
            null: java.lang.Integer, null: String)) ++
            rows.sortBy(_.getLong(0)).iterator.flatMap { r =>
              val id = r.getLong(0)
              val url = s"https://${r.getString(1)}.example/doc/$id"
              val ts = f"2026-01-${id % 28 + 1}%02dT00:00:00Z"
              val miss = id % 50 == 0
              val body = (if (miss) "" else r.getString(2)).getBytes(UTF_8)
              val req =
                if (id % 7 == 0)
                  Iterator(("request", url, ts,
                    s"GET /doc/$id HTTP/1.1\r\nHost: x\r\n\r\n"
                      .getBytes(UTF_8), null: java.lang.Integer,
                    null: String))
                else Iterator.empty
              req ++ Iterator(("response", url, ts, body,
                Int.box(if (miss) 404 else 200),
                "text/plain; charset=utf-8"))
            }
        graft.formats.Warc.write(s"$d/shard$shard.warc.gz", recs)
      }
      graft.formats.Warc.read(s, s"$d/*.warc.gz")
        .filter(col("warc_type") === "response")
        .select(
          substring_index(col("url"), "/", -1).cast("bigint").as("doc_id"),
          col("url"), col("ts"), col("status"), col("mime"),
          col("payload").cast("string").as("text"))
        .orderBy(col("doc_id"))
    }),

    // gzip codec at the edge (replaces the reference's gzip/gunzip
    // modules; its own docs recommend edge compression,
    // dbitool.pl:3304-3307).
    "q25_roundtrip_csv_gzip" -> ((s, dir) => {
      val part = Tables(s, dir, "part")
      val out = tmpDir("gz")
      Sinks.csv(part, out, compression = Some("gzip"))
      Sources.csv(s, out, schema = Some(part.schema))
        .orderBy(col("p_partkey"))
    })
  )

  private def selectAll(table: String, order: String): String =
    s"SELECT * FROM $table ORDER BY $order"

  val oracleSql: Map[String, String] = Map(
    "q204_roundtrip_xlsx" -> selectAll("nation", "n_nationkey"),
    "q205_roundtrip_jdbc" -> selectAll("supplier", "s_suppkey"),
    "q206_roundtrip_ods" -> selectAll("nation", "n_nationkey"),
    "q207_roundtrip_xls" -> selectAll("nation", "n_nationkey"),
    "q208_roundtrip_zip" -> selectAll("supplier", "s_suppkey"),
    "q20_roundtrip_csv" -> selectAll("orders", "o_orderkey"),
    "q21_roundtrip_ndjson" -> selectAll("lineitem", "l_orderkey, l_linenumber"),
    "q28_roundtrip_ndjson_orders" -> selectAll("orders", "o_orderkey"),
    "q81_roundtrip_avro" -> selectAll("orders", "o_orderkey"),
    "q22_roundtrip_fixedwidth" -> selectAll("nation", "n_nationkey"),
    "q23_roundtrip_xml" -> selectAll("supplier", "s_suppkey"),
    "q24_roundtrip_jsonarray" -> selectAll("region", "r_regionkey"),
    "q26_roundtrip_bson" -> selectAll("nation", "n_nationkey"),
    "q27_roundtrip_orc" -> selectAll("supplier", "s_suppkey"),
    "q25_roundtrip_csv_gzip" -> selectAll("part", "p_partkey"),

    // replay of the q259 record construction: url/ts/status/mime/body
    // derived from documents exactly as the fixture writer derives them
    "q259_roundtrip_warc" ->
      """SELECT doc_id,
        |  'https://' || source || '.example/doc/' || CAST(doc_id AS VARCHAR)
        |    AS url,
        |  '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    || 'T00:00:00Z' AS ts,
        |  CAST(CASE WHEN doc_id % 50 = 0 THEN 404 ELSE 200 END AS INT)
        |    AS status,
        |  'text/plain; charset=utf-8' AS mime,
        |  CASE WHEN doc_id % 50 = 0 THEN '' ELSE text END AS text
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
