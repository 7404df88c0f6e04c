package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 ids in the key
  * names); `oracleSql` carries the DuckDB-equivalent for every query
  * whose semantics are exactly replicable in ANSI SQL.
  */
object SparkEntry {

  /** All registered query groups (each op from SURVEY §2 + extensions). */
  private lazy val all: Map[String, Q] =
    RelationalQueries.queries ++ EventQueries.queries ++
      graft.models.MtaQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++
      MultimodalQueries.queries ++ ExtendedQueries.queries ++
      SessionQueries.queries ++ StreamingQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The per-user argmin rollup — the engine's fact_trips analog. */
  def entry(spark: SparkSession): DataFrame =
    all("a5_argmin_rollup").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql), _)) => k -> sql.trim }
}
