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

  /** Keys on only one side of the queries↔oracleSql contract:
    * (queries missing an oracle, oracles missing a query). Every query
    * in this suite is oracle-checked by convention, so BOTH sets must
    * be empty — Verify and Bench fail loudly otherwise (VERDICT r15
    * #8: four queries once landed visible to Bench but absent from the
    * committed HEAD record, and nothing tripped).
    */
  def contractDrift: (Set[String], Set[String]) =
    (queries.keySet -- oracleSql.keySet, oracleSql.keySet -- queries.keySet)

  /** Exit 2 with a named diff if the contract drifted; print the
    * counts otherwise (makes every Verify/Bench log self-auditing).
    */
  def assertContract(tool: String): Unit = {
    val (noOracle, noQuery) = contractDrift
    if (noOracle.nonEmpty || noQuery.nonEmpty) {
      System.err.println(s"[$tool] CONTRACT DRIFT — " +
        s"queries without oracleSql: ${noOracle.toSeq.sorted.mkString(",")}; " +
        s"oracleSql without query: ${noQuery.toSeq.sorted.mkString(",")}")
      sys.exit(2)
    }
    println(s"[$tool] contract: ${queries.size} queries == ${oracleSql.size} oracles")
  }
}
