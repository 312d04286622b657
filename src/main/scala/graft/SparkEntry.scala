package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CatalogQueries, EngineQueries, GeoQueries, IudQueries, LifecycleQueries, PipelineQueries, RelationalQueries, TextQueries}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs TPC-H Q1 through the ENGINE: carbonish table (sorted segment
    * load) → DSv2 scan with pushdown. */
  def entry(spark: SparkSession): DataFrame =
    EngineQueries.queries("q1_agg_carbonish")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      EngineQueries.queries ++ PipelineQueries.queries ++ IudQueries.queries ++
      CatalogQueries.queries ++ GeoQueries.queries ++ LifecycleQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++
      EngineQueries.oracle ++ PipelineQueries.oracle ++ IudQueries.oracle ++
      CatalogQueries.oracle ++ GeoQueries.oracle ++ LifecycleQueries.oracle
}
