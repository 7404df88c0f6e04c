package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Morton (Z-order) interleaving of
  * two integer dimensions, the clustered-write primitive built on it,
  * and the SQL-text twin the DuckDB oracle runs.
  *
  * Why this is an engine operator and not an app concern: at 100 TB
  * the dominant cost of a selective query is the files it CANNOT
  * skip. Sorting by one column gives perfect min/max pruning on that
  * column and none on any other; interleaving the bits of two
  * columns gives near-sqrt pruning on BOTH (a bucket of 1/k of the
  * z-range spans ~1/sqrt(k) of each dimension's range), which is the
  * layout every lakehouse engine (Delta OPTIMIZE ZORDER, Iceberg
  * sort orders) converges on. The reference's BigQuery tables get
  * this implicitly from clustering keys (dbt_project.yml cluster_by);
  * here it is explicit and auditable from parquet footer stats.
  *
  * The interleave is pure bit arithmetic (`shiftright & 1` →
  * `shiftleft`), so it stays inside whole-stage codegen and — unlike
  * a hash — is ORDER-PRESERVING per dimension at every bit prefix,
  * which is what makes min/max file stats useful after clustering.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of `x` (even
    * positions) and `y` (odd positions). Inputs must be non-negative
    * and < 2^bits (caller contract; `bits` ≤ 31 keeps the result in
    * a positive long). */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The same interleave as DuckDB SQL text (oracle twin of
    * [[mortonKey]] — keep expression-for-expression in sync). */
  def mortonSqlDuck(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Min-max scale a dimension onto the full `bits`-wide range.
    * Raw interleave is useless when one dimension's value range is
    * much narrower than the other's (its high bits are constant 0,
    * so the wide dimension alone decides the curve order and only it
    * prunes — the exact failure LayoutSpec first caught at sf0.001
    * where suppkey spans 0..10 against partkey's 0..200). Every real
    * Z-order implementation (Delta OPTIMIZE ZORDER, Iceberg) runs a
    * stats pass and normalizes each column to equal bit width first;
    * this is that normalization: (v−lo)·(2^bits−1) div (hi−lo).
    * Double division + truncating cast IS integer division here:
    * (v−lo)·m < 2^47 is exact in a double, and a non-integral true
    * quotient sits ≥ 1/(hi−lo) from the next integer — far beyond
    * one ulp — so the rounded double never crosses the boundary.
    * The DuckDB twin uses `//` on the same non-negative operands. */
  def scaleDim(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val m = (1L << bits) - 1
    ((v - lo) * m / greatest(hi - lo, lit(1L))).cast("long")
  }

  /** [[scaleDim]] as DuckDB SQL text. */
  def scaleDimSqlDuck(v: String, lo: String, hi: String, bits: Int): String =
    s"((($v) - ($lo)) * ${(1L << bits) - 1} // greatest(($hi) - ($lo), 1))"

  /** Add a normalized Morton key column: one stats aggregate (4
    * numbers, broadcast back onto the rows), scale both dimensions to
    * `bits` width, interleave. This is the whole "analyze + cluster"
    * front half of OPTIMIZE ZORDER as a single declarative frame. */
  def withMortonKey(df: DataFrame, x: Column, y: Column, bits: Int,
                    keyCol: String = "_zkey"): DataFrame = {
    val ext = df.agg(
      min(x).as("_x_lo"), max(x).as("_x_hi"),
      min(y).as("_y_lo"), max(y).as("_y_hi"))
    df.crossJoin(broadcast(ext))
      .withColumn(keyCol, mortonKey(
        scaleDim(x, col("_x_lo"), col("_x_hi"), bits),
        scaleDim(y, col("_y_lo"), col("_y_hi"), bits), bits))
      .drop("_x_lo", "_x_hi", "_y_lo", "_y_hi")
  }

  /** Z-order clustered write: range-partition on the normalized
    * Morton key (the cluster analog of the local ntile the registered
    * query uses for its bounded oracle), sort within each partition,
    * write one file per range. RangePartitioner samples boundaries —
    * a full sort is never materialized, so this scales to arbitrary
    * input: the only global structure is the sampled boundary array
    * on the driver (plus the 4-number stats row). Per-file parquet
    * min/max stats of BOTH dimensions then prune selective scans
    * (LayoutSpec reads them back and asserts the skip rate). */
  def zorderWrite(df: DataFrame, x: Column, y: Column, bits: Int,
                  numFiles: Int, path: String): Unit =
    withMortonKey(df, x, y, bits)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
}
