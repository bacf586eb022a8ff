package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Readers — the Spark-native equivalents of the reference's source
  * modules (SURVEY.md §2.1).
  *
  * Design: every reader returns a typed `DataFrame` and is a thin,
  * declarative wrapper over Spark's built-in sources, so Catalyst keeps
  * predicate pushdown / column pruning / partition parallelism. The
  * reference's dynamic first-row schema discovery
  * (/root/reference/scripts/dbitool.pl:3048-3058) maps to schema
  * inference or an explicit `StructType`.
  */
object Sources {

  /** fileread (dbitool.pl:892-954): file → one string column. The
    * reference names the single raw column `col1`; we keep that name so
    * pipeline specs translate 1:1. Splittable + distributed, unlike the
    * reference's sequential line loop.
    */
  def text(spark: SparkSession, path: String, col1: String = "col1"): DataFrame =
    spark.read.text(path).withColumnRenamed("value", col1)

  /** csvread (dbitool.pl:1757-1822): header row → schema; sep/quote/
    * escape options mirror the reference's defaults. `schema=None` +
    * `inferSchema=false` preserves the reference's all-strings
    * semantics (dbitool.pl:3077-3078); pass a schema or infer for
    * typed columns.
    */
  def csv(spark: SparkSession, path: String,
          header: Boolean = true, sep: String = ",",
          quote: String = "\"", escape: String = "\"",
          schema: Option[StructType] = None,
          inferSchema: Boolean = false): DataFrame = {
    val r = spark.read
      .option("header", header)
      .option("sep", sep)
      .option("quote", quote)
      .option("escape", escape)
      // \N sentinel for null (classic convention): with escape==quote
      // a quoted empty "" is indistinguishable from null to the parser,
      // so empty-vs-null fidelity needs an explicit null encoding
      // (found by PropertySpec; pairs with the writer's nullValue).
      .option("nullValue", "\\N")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    val r2 = schema.map(r.schema).getOrElse(r.option("inferSchema", inferSchema))
    r2.csv(path)
  }

  /** Parse an in-flight string column as CSV rows (the reference's
    * raw→row boundary, where csvread consumes a raw stream rather than
    * a file).
    */
  def csvFromLines(lines: Dataset[String], schema: StructType,
                   sep: String = ","): DataFrame =
    lines.sparkSession.read
      .option("sep", sep).schema(schema).csv(lines)

  /** ndjsonread (dbitool.pl:2315-2377): newline-delimited JSON —
    * Spark's native JSON mode, splittable and distributed.
    */
  def ndjson(spark: SparkSession, path: String,
             schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** jsonread (dbitool.pl:2188-2259): whole-file JSON array of objects.
    * Like the reference (which buffers the entire input in memory,
    * dbitool.pl:2228-2242), this is a single-task-per-file read —
    * document formats don't scale past one executor per file; prefer
    * NDJSON at scale.
    */
  def jsonArray(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", true)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** xmlread (dbitool.pl:2043-2122): Spark 4 built-in XML source;
    * `rowTag` plays the reference's `row=` option, `attributePrefix`
    * its `attrprefix=`.
    */
  def xml(spark: SparkSession, path: String, rowTag: String = "row",
          attrPrefix: String = "_", schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
      .option("attributePrefix", attrPrefix)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS[XXX]")
    schema.map(r.schema).getOrElse(r).xml(path)
  }

  /** fixedwidthread (dbitool.pl:1894-1973): fixed column widths over
    * text lines. Implemented as substring projections over the text
    * source — pure narrow transformations, fully codegen'd, splittable.
    * `header=true` consumes the first line as column names (matching
    * the reference's `header=1`); `trim` trims cell padding.
    */
  def fixedWidth(spark: SparkSession, path: String, widths: Seq[Int],
                 names: Seq[String] = Nil, header: Boolean = false,
                 trim: Boolean = true): DataFrame = {
    val raw = spark.read.text(path)
    val offsets = widths.scanLeft(1)(_ + _)
    val colNames: Seq[String] =
      if (names.nonEmpty) names
      else if (header) {
        // One tiny driver-side read of the first line only.
        val first = raw.limit(1).collect().head.getString(0)
        widths.indices.map { i =>
          first.slice(offsets(i) - 1, offsets(i) - 1 + widths(i)).trim
        }
      } else widths.indices.map(i => s"col${i + 1}")
    val body = if (header) dropFirstLinePerFile(raw) else raw
    val cols = widths.indices.map { i =>
      val c = substring(col("value"), offsets(i), widths(i))
      (if (trim) org.apache.spark.sql.functions.trim(c) else c).as(colNames(i))
    }
    body.select(cols: _*)
  }

  /** Drop the first line of EVERY file in a (possibly multi-file,
    * possibly split) text scan — the header-consumption primitive.
    *
    * `monotonically_increasing_id` is `partition << 33 | row`, and a
    * file's first split is its lowest-indexed partition, so the
    * per-file MINIMUM id is exactly the file's first line. The per-file
    * minima are one row per file — aggregated with map-side partials
    * and broadcast back, so no full-data shuffle (a `Window.partitionBy
    * (file)` would hash every row of a file to one partition — a skew
    * bomb at 100 TB). For non-file inputs `input_file_name()` is ""
    * for all rows → one group → drops the globally first line.
    */
  def dropFirstLinePerFile(df: DataFrame): DataFrame = {
    val tagged = df.withColumn("_fn", input_file_name())
      .withColumn("_id", monotonically_increasing_id())
    val firsts = tagged.groupBy(col("_fn")).agg(min(col("_id")).as("_minid"))
    tagged.join(broadcast(firsts), Seq("_fn"))
      .filter(col("_id") =!= col("_minid"))
      .drop("_fn", "_id", "_minid")
  }

  /** Binary/opaque files (multimodal payloads): path, mtime, length,
    * content. The scan supports `pathGlobFilter` pushdown.
    */
  def binary(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  /** mysqlselect / sqliteselect (dbitool.pl:1387-1599): delegated SQL
    * via JDBC, same pushdown model as the reference's DBI prepare/
    * execute. `partitionColumn` options enable parallel reads at scale.
    */
  def jdbc(spark: SparkSession, url: String, queryOrTable: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url)
    val withQ =
      if (queryOrTable.trim.toLowerCase.startsWith("select"))
        r.option("query", queryOrTable)
      else r.option("dbtable", queryOrTable)
    props.foldLeft(withQ) { case (rr, (k, v)) => rr.option(k, v) }.load()
  }
}
