package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the `dbt test` analog.
  *
  * The reference's lifecycle includes `dbt test` (SURVEY §3 E3), but
  * its schema yml declares zero tests, so the framework itself is the
  * missing capability: dbt's four built-in schema tests (unique,
  * not_null, accepted_values, relationships — dbt-core
  * `core/dbt/include/global_project/macros/generic_test_sql`) compile
  * to violation-counting SQL over one column each. Each check here is
  * one column-pruned aggregate returning a single (tbl, col_name,
  * test, n_violations) row; [[expectations]] unions them into the
  * report frame a CI gate asserts on. Failing tests REPORT (pass =
  * false), they don't throw — the caller decides severity, as dbt's
  * warn/error config does.
  *
  * Scale shape: every check reads only its column(s) (pruned scan),
  * aggregates map-side, and emits one row; relationships is a
  * left-anti join on the key — the only shuffle-bearing check, and
  * it rides the FK's natural hash partitioning.
  */
object Dq {

  /** dbt `unique`: number of key values (single or composite) that
    * occur more than once. */
  def unique(tbl: String, df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(tbl).as("tbl"), lit(cols.mkString("+")).as("col_name"),
        lit("unique").as("test"), col("n_violations"))

  /** dbt `not_null`: number of NULL rows in the column. */
  def notNull(tbl: String, df: DataFrame, c: String): DataFrame =
    df.agg((count(lit(1)) - count(col(c))).as("n_violations"))
      .select(lit(tbl).as("tbl"), lit(c).as("col_name"),
        lit("not_null").as("test"), col("n_violations"))

  /** dbt `accepted_values`: number of rows whose NON-NULL value is
    * outside the declared domain (NULLs pass here — not_null is its
    * own test, as in dbt). */
  def acceptedValues(tbl: String, df: DataFrame, c: String,
                     values: Seq[String]): DataFrame =
    df.agg(coalesce(sum(
        when(col(c).isNull || col(c).isin(values: _*), 0L).otherwise(1L)),
        lit(0L)).as("n_violations"))
      .select(lit(tbl).as("tbl"), lit(c).as("col_name"),
        lit("accepted_values").as("test"), col("n_violations"))

  /** dbt `relationships`: number of child rows whose non-NULL foreign
    * key has no parent. */
  def relationship(tbl: String, df: DataFrame, fk: String,
                   parent: DataFrame, pk: String): DataFrame =
    df.select(col(fk)).filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(tbl).as("tbl"), lit(fk).as("col_name"),
        lit("relationships").as("test"), col("n_violations"))

  /** Union the per-check rows into the report frame: (tbl, col_name,
    * test, n_violations, pass), totally ordered. */
  def expectations(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("tbl"), col("col_name"), col("test"))
}
