package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.{AlgoQueries, ExprQueries, GraphQueries, LdbcQueries, MatchQueries, PipelineQueries, RelationalQueries, SurfaceQueries, WorkloadQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the verification surface: one entry per implemented
  * operator from SURVEY.md §2 (+ the LLM-pipeline pack), each with a
  * DuckDB oracle twin in `oracleSql`. Registrations live in
  * graft.queries.* by domain. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A real multi-operator pipeline: 2-hop traversal from all
    * customers, vertex props appended, aggregated per origin. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val g = graph.GraphModel(spark, dir)
    val reach = traverse.Traverse.go(
      g.customers.select("vid").limit(50), g.edges, 1, 2)
    reach.groupBy("origin", "step").agg(count(lit(1)).as("n_reached"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExprQueries.queries ++
      GraphQueries.queries ++ PipelineQueries.queries ++
      SurfaceQueries.queries ++ MatchQueries.queries ++ WorkloadQueries.queries ++ AlgoQueries.queries ++ LdbcQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ ExprQueries.oracleSql ++
      GraphQueries.oracleSql ++ PipelineQueries.oracleSql ++
      SurfaceQueries.oracleSql ++ MatchQueries.oracleSql ++ WorkloadQueries.oracleSql ++ AlgoQueries.oracleSql ++ LdbcQueries.oracleSql
}
