package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.pipeline.Pipeline

/** End-to-end pipeline-DSL queries under the DuckDB oracle: a dbitool
  * CLI word chain runs (file in → parse → relational ops → format out),
  * and the files it writes are read back as the query result — so the
  * oracle checks the whole DSL round trip, not just the operators.
  */
object PipelineQueries {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pq_$tag").toString

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // parquet → csv file → [fileread csvread filter agg sort csvwrite
    // filewrite] → csv file → DataFrame.
    "q70_pipeline_e2e" -> ((s, dir) => {
      val work = tmpDir("e2e")
      // Stage the input as CSV (strings + doubles survive inference).
      // singleFile: a raw line stream carries ONE header (multi-part
      // staging would interleave per-file headers as data rows).
      graft.sinks.Sinks.csv(
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        s"$work/in", singleFile = true)
      Pipeline.run(s, Seq(
        s"fileread:in=$work/in",
        "csvread:infer=1",
        "filter:expr=o_totalprice >= 150000.0",
        "agg:by=o_orderstatus:exprs=count(*) as n;" +
          "cast(round(sum(cast(o_totalprice as decimal(30,4))), 2) as double) as total",
        "sort:by=o_orderstatus",
        "csvwrite",
        s"filewrite:out=$work/out"))
      val schema = StructType(Seq(
        StructField("o_orderstatus", StringType),
        StructField("n", LongType),
        StructField("total", DoubleType)))
      graft.sources.Sources.csv(s, s"$work/out", schema = Some(schema))
        .orderBy(col("o_orderstatus"))
    }),

    // Curation pipeline e2e through the NEW modules: ndjson-staged
    // documents → [fileread ndjsonread chunk sql csvwrite filewrite] →
    // csv → DataFrame. The sql module aggregates the chunk stream
    // in-engine; the oracle replays chunking + aggregation in DuckDB.
    "q87_pipeline_curate" -> ((s, dir) => {
      val work = tmpDir("curate")
      graft.sinks.Sinks.ndjson(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        s"$work/in")
      Pipeline.run(s, Seq(
        s"fileread:in=$work/in",
        "ndjsonread",
        "chunk:key=doc_id:text=text:size=32:stride=24",
        "sql:query=SELECT doc_id, count(*) AS n_chunks, " +
          "cast(sum(n_tok) as bigint) AS toks FROM __in GROUP BY doc_id",
        "sort:by=doc_id",
        "csvwrite",
        s"filewrite:out=$work/out"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("n_chunks", LongType),
        StructField("toks", LongType)))
      graft.sources.Sources.csv(s, s"$work/out", schema = Some(schema))
        .orderBy(col("doc_id"))
    }),

    // Streaming-DSL batch twins under the oracle (r6): the exact words
    // that run unbounded (streamdedup → eventwindow → streamwrite) run
    // here on bounded input. The input is unioned with itself so the
    // dedup leg is LOAD-BEARING — drop it and every count doubles; the
    // idempotent sink's batch_0 landing dir is read back as the result.
    "q92_pipeline_stream_twin" -> ((s, dir) => {
      val work = tmpDir("streamtwin")
      Tables(s, dir, "events").write.mode("overwrite").parquet(s"$work/in")
      Pipeline.run(s, Seq(
        s"parquetread:in=$work/in:out=a",
        s"parquetread:in=$work/in:out=b",
        "union:in=a:with=b:out=u",
        "streamdedup:in=u:key=event_id:out=d",
        "eventwindow:in=d:width=1 hour:out=w",
        s"streamwrite:in=w:path=$work/out"))
      s.read.parquet(s"$work/out/batch_0")
        .orderBy(col("ws"), col("event_type"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q87_pipeline_curate" ->
      """SELECT doc_id, count(*) AS n_chunks, CAST(sum(n_tok) AS BIGINT) AS toks
        |FROM (
        |  SELECT doc_id, len(list_slice(ws, start + 1, start + 32)) AS n_tok
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws), 24)) AS start
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |              FROM documents)))
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q70_pipeline_e2e" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_totalprice >= 150000.0
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // q92: the self-union dedups back to the plain events table, so the
    // oracle is q61's tumbling-window aggregate over events directly.
    "q92_pipeline_stream_twin" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,4))), 2) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
  )
}
