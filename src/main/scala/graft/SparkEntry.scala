package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are generated from the [[GateQueries]] registry;
  * each operator module contributes `GateQuery` entries (Spark pipeline +
  * matching DuckDB SQL with identical output column names).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full channel-analytics assembly (SURVEY §3.1): recency
    * windows → type-partitioned engagement → format classifier →
    * channel_type decision, one row per channel. */
  def entry(spark: SparkSession): DataFrame =
    queries("ca6_final_metrics")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GateQueries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    GateQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
