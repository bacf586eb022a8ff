package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Writers — Spark-native equivalents of the reference's sink modules
  * (SURVEY.md §2.2). All distributed (one file per partition); pass
  * `singleFile=true` for the reference's one-output-file behavior
  * (small results only — it serializes the write).
  */
object Sinks {

  private def prep(df: DataFrame, singleFile: Boolean): DataFrame =
    if (singleFile) df.coalesce(1) else df

  /** filewrite (dbitool.pl:1078-1121) for raw text. */
  def text(df: DataFrame, path: String, singleFile: Boolean = false,
           compression: Option[String] = None): Unit = {
    val w = prep(df, singleFile).write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).text(path)
  }

  /** csvwrite (dbitool.pl:1824-1892): header + sep/quote/escape.
    * `compression=Some("gzip")` replaces the reference's in-tree gzip
    * module (dbitool.pl:1176-1242) — codec at the edge, exactly the
    * tuning its docs recommend (dbitool.pl:3304-3307).
    */
  def csv(df: DataFrame, path: String, header: Boolean = true,
          sep: String = ",", quote: String = "\"", escape: String = "\"",
          singleFile: Boolean = false,
          compression: Option[String] = None): Unit = {
    val w = prep(df, singleFile).write.mode(SaveMode.Overwrite)
      .option("header", header).option("sep", sep)
      .option("quote", quote).option("escape", escape)
      // univocity's writer trims whitespace and writes empty == null by
      // default — all three lose data on round-trip (found by
      // PropertySpec): keep whitespace, quote empty strings.
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .option("emptyValue", "\"\"")
      .option("nullValue", "\\N")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    compression.fold(w)(c => w.option("compression", c)).csv(path)
  }

  /** ndjsonwrite (dbitool.pl:2379-2436): one JSON object per line. */
  def ndjson(df: DataFrame, path: String, singleFile: Boolean = false,
             compression: Option[String] = None): Unit = {
    val w = prep(df, singleFile).write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** jsonwrite (dbitool.pl:2261-2313): ONE JSON array document.
    * The reference accumulates every row in memory and encodes at EOF
    * (dbitool.pl:2307-2311) — inherently single-node. We keep the
    * semantics (it's part of the format surface) but confine the
    * collect to the final text assembly; use `ndjson` at scale.
    */
  def jsonArray(df: DataFrame, path: String): Unit = {
    val rows = df.toJSON.collect()
    val out = rows.mkString("[\n", ",\n", "\n]")
    val p = new java.io.File(path)
    Option(p.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(p.toPath, out)
  }

  /** xmlwrite (dbitool.pl:2124-2186): rows → <root><row>…</row></root>.
    * Spark 4 built-in XML writer handles escaping (the reference
    * hand-escapes &, <, > at dbitool.pl:2178-2184).
    */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
          rootTag: String = "root", singleFile: Boolean = false): Unit =
    prep(df, singleFile).write.mode(SaveMode.Overwrite)
      .option("rowTag", rowTag).option("rootTag", rootTag)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .xml(path)

  /** fixedwidthwrite (dbitool.pl:1975-2041): pad/truncate each column
    * to its width (reference format() dbitool.pl:2032-2039), emit as
    * text lines. Codegen'd string ops, no UDF.
    */
  def fixedWidth(df: DataFrame, path: String, widths: Seq[Int],
                 header: Boolean = false, singleFile: Boolean = false): Unit = {
    require(widths.length == df.columns.length,
      s"widths(${widths.length}) != columns(${df.columns.length})")
    val line = concat(df.columns.zip(widths).map { case (c, w) =>
      rpad(coalesce(col(c).cast("string"), lit("")).substr(1, w), w, " ")
    }: _*).as("value")
    val body = df.select(line)
    val out =
      if (header) {
        val h = df.columns.zip(widths)
          .map { case (c, w) => c.take(w).padTo(w, ' ') }.mkString
        val spark = df.sparkSession
        import spark.implicits._
        // Prepend the header INSIDE one partition — a union'd header
        // row has no stable position under AQE. repartition(1), not
        // coalesce: coalesce can't raise an empty frame's 0 partitions
        // to 1, which would drop the header entirely.
        body.as[String].repartition(1)
          .mapPartitions(it => Iterator(h) ++ it).toDF("value")
      } else body
    prep(out, singleFile && !header).write.mode(SaveMode.Overwrite).text(path)
  }

  /** sqliteinsert / future mysqlinsert (dbitool.pl:1696-1755, TODO:40-46):
    * Spark batches inserts per partition — the reference's pipelined
    * statement-handle queue (dbitool.pl:1662-1677) is subsumed.
    */
  def jdbc(df: DataFrame, url: String, table: String,
           mode: SaveMode = SaveMode.Append,
           props: Map[String, String] = Map.empty): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.put(k, v) }
    df.write.mode(mode).jdbc(url, table, p)
  }

  /** Size-targeted parquet write — the small-files compaction pass.
    * At 100 TB the failure mode is thousands of KB-sized files per
    * partition (NameNode pressure, per-file open cost, tiny row
    * groups); the fix is sizing the write to ~targetBytes output
    * files. The byte estimate is Catalyst's plan statistic
    * (`optimizedPlan.stats.sizeInBytes` — for file sources, the sum of
    * compressed input sizes, i.e. the right order of magnitude for a
    * rewrite of the same data), so no extra pass over the data is
    * spent counting. Returns the partition count used.
    */
  def compactParquet(df: DataFrame, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be > 0")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = bytes
      ./(targetBytes).min(BigInt(100000)).max(BigInt(0)).toInt + 1
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(path)
    parts
  }

  /** Keyed parquet persistence for the ndb semantics (SURVEY §1.4):
    * last-write-wins dedup by key, then partition-bucketed storage so
    * later lookups co-locate.
    */
  def keyedParquet(df: DataFrame, path: String, key: String,
                   numBuckets: Int = 0): Unit = {
    val deduped = df.dropDuplicates(key)
    val w =
      (if (numBuckets > 0) deduped.repartition(numBuckets, col(key)) else deduped)
        .write.mode(SaveMode.Overwrite)
    w.parquet(path)
  }
}
