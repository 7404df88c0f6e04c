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

  /** The component registries, named for the duplicate-key report. */
  private lazy val groups: Seq[(String, Map[String, Q])] = Seq(
    "RelationalQueries" -> RelationalQueries.queries,
    "EventQueries" -> EventQueries.queries,
    "MtaQueries" -> graft.models.MtaQueries.queries,
    "TextQueries" -> TextQueries.queries,
    "VectorQueries" -> VectorQueries.queries,
    "MultimodalQueries" -> MultimodalQueries.queries,
    "ExtendedQueries" -> ExtendedQueries.queries,
    "SessionQueries" -> SessionQueries.queries,
    "WebQueries" -> WebQueries.queries,
    "StreamingQueries" -> StreamingQueries.queries)

  /** All registered query groups (each op from SURVEY §2 + extensions).
    * Map `++` silently keeps the LAST binding for a duplicated key —
    * a new query accidentally reusing an existing name would REPLACE
    * the old one while every count stays plausible (it happened: a
    * round-13 DiD draft shadowed the registered `e_did`; only a plan
    * pin caught it). Fail construction loudly instead. */
  private lazy val all: Map[String, Q] = {
    val dups = groups.flatMap { case (g, m) => m.keys.map(_ -> g) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, gs) => s"$k (${gs.map(_._2).mkString(", ")})" }
    require(dups.isEmpty,
      s"duplicate query keys across registries: ${dups.mkString("; ")}")
    groups.map(_._2).reduce(_ ++ _)
  }

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
