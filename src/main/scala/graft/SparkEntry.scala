package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Formats.queries ++
      graft.queries.Operators.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupSim.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.LinkageQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Formats.oracleSql ++
      graft.queries.Operators.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupSim.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.LinkageQueries.oracleSql
}
