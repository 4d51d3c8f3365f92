package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator pack; keys are stable IDs the
  * driver uses for the DuckDB-oracle correctness gate. Each key either
  * has a matching `oracleSql` entry (hash-compared against DuckDB) or
  * is a rows-only check (non-SQL-expressible ops: ML training, LSH,
  * streaming).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q04_join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ MlQueries.queries ++
      FeatureQueries.queries ++ MultimodalQueries.queries ++
      StreamQueries.queries ++ CurationQueries.queries ++
      TemporalQueries.queries ++ SplitQueries.queries ++
      RetrievalQueries.queries ++ BpeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TextQueries.oracleSql ++
      DedupQueries.oracleSql ++ MlQueries.oracleSql ++
      FeatureQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      StreamQueries.oracleSql ++ CurationQueries.oracleSql ++
      TemporalQueries.oracleSql ++ SplitQueries.oracleSql ++
      RetrievalQueries.oracleSql ++ BpeQueries.oracleSql
}
