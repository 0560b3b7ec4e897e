package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (q_join_interval — the stream-stream-join batch twin)
    * on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_interval")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ SortsSets.queries ++ Scalars.queries ++
      LlmOps.queries ++ DedupOps.queries ++ TextOps.queries ++
      PipelineOps.queries ++ CorpusOps.queries ++ MaintenanceOps.queries ++
      AnalyticsOps.queries ++ RetrievalOps.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Joins.oracle ++ Aggregates.oracle ++
      Windows.oracle ++ SortsSets.oracle ++ Scalars.oracle ++
      LlmOps.oracle ++ DedupOps.oracle ++ TextOps.oracle ++
      PipelineOps.oracle ++ CorpusOps.oracle ++ MaintenanceOps.oracle ++
      AnalyticsOps.oracle ++ RetrievalOps.oracle
}
