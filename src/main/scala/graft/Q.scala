package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle that
  * the driver runs on the same Parquet. `oracle = None` downgrades to a
  * rows-only check (reserved for ops DuckDB cannot replicate exactly).
  *
  * Determinism rules for oracle-checked queries (SURVEY §5):
  *  - double sums go through integral cents (BqCompat.sumMoney);
  *  - no any_value / approx sketches;
  *  - events.ts never emitted raw (ns vs us precision) — always
  *    formatted or floored to epoch seconds;
  *  - every result carries an ORDER BY over a unique key set.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    desc: String)
