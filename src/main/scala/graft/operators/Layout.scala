package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
                  numFiles: Int, path: String): Unit = {
    withMortonKey(df, x, y, bits)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
    // table-level metadata: the scale bounds the keys were minted
    // with. Compaction MUST reuse them — rescaling against a delta's
    // different min/max would mint incomparable keys (underscore
    // prefix: invisible to Spark's file index, like _SUCCESS).
    val ext = df.agg(min(x), max(x), min(y), max(y)).head()
    writeMeta(df.sparkSession, path, ZorderMeta(
      ext.getLong(0), ext.getLong(1), ext.getLong(2), ext.getLong(3), bits))
  }

  /** The frozen scale bounds of a z-ordered dataset (its clustering
    * metadata, as a lakehouse table format would carry). */
  case class ZorderMeta(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
                        bits: Int)

  private def metaPath(path: String) = new org.apache.hadoop.fs.Path(
    path, "_zorder_meta.json")

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, path: String,
                        m: ZorderMeta): Unit = {
    val out = fs(spark, path).create(metaPath(path), true)
    out.write(
      s"""{"xLo":${m.xLo},"xHi":${m.xHi},"yLo":${m.yLo},"yHi":${m.yHi},"bits":${m.bits}}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Read the clustering metadata [[zorderWrite]] persisted. */
  def readMeta(spark: SparkSession, path: String): ZorderMeta = {
    val in = fs(spark, path).open(metaPath(path))
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    def f(k: String) = s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"zorder meta missing $k in $txt"))
      .group(1).toLong
    ZorderMeta(f("xLo"), f("xHi"), f("yLo"), f("yHi"), f("bits").toInt)
  }

  /** Morton key under FROZEN bounds (values outside them clamp to the
    * edge cells — late data beyond the original range still lands on
    * the curve, merely less selectively). */
  def frozenKey(m: ZorderMeta, x: Column, y: Column): Column = {
    def clamp(v: Column, lo: Long, hi: Long) =
      greatest(least(v, lit(hi)), lit(lo))
    mortonKey(
      scaleDim(clamp(x, m.xLo, m.xHi), lit(m.xLo), lit(m.xHi), m.bits),
      scaleDim(clamp(y, m.yLo, m.yHi), lit(m.yLo), lit(m.yHi), m.bits),
      m.bits)
  }

  /** Incremental z-order compaction — the incremental OPTIMIZE shape:
    * merge `delta` into an existing z-ordered dataset REWRITING ONLY
    * the files whose curve range overlaps the delta's key range;
    * every other file is left byte-identical. This is what makes
    * z-order maintainable at 100 TB: a day's append touches a narrow
    * curve region, so compaction cost tracks the DELTA size, not the
    * table size (a full zorderWrite re-sorts everything).
    *
    * Mechanics: per-file [lo, hi] key ranges are re-derived from the
    * existing data under the FROZEN table bounds ([[readMeta]] — keys
    * minted under different bounds would be incomparable); a file
    * needs rewriting iff AT LEAST ONE delta key lands inside its
    * range (an exact broadcast range-probe of the tiny file-range
    * frame — a hull test would drag in every file between two distant
    * delta clusters); the rewrite region (overlapped files ∪ delta)
    * is re-range-partitioned and swapped in with temp-dir + rename
    * (the commit dance a real table format does transactionally).
    * Like LSM/level compaction, rewritten files may RANGE-OVERLAP
    * untouched neighbors (pruning stays correct, merely less tight
    * until the next wider compaction); what is preserved exactly is
    * the data itself and the untouched files' bytes. Driver state is
    * file METADATA only (one (path, lo, hi) row per file).
    *
    * Returns (filesRewritten, filesUntouched). */
  def zorderCompact(spark: SparkSession, path: String, delta: DataFrame,
                    x: Column, y: Column): (Int, Int) = {
    val m = readMeta(spark, path)
    val hadoopFs = fs(spark, path)

    val deltaKeyed = delta.withColumn("_zkey", frozenKey(m, x, y))
    if (deltaKeyed.isEmpty) return (0, countDataFiles(hadoopFs, path))

    val ranges = spark.read.parquet(path)
      .withColumn("_f", input_file_name())
      .withColumn("_zkey", frozenKey(m, x, y))
      .groupBy(col("_f"))
      .agg(min(col("_zkey")).as("lo"), max(col("_zkey")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rangesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ranges.toSeq.map {
        case (f, lo, hi) => org.apache.spark.sql.Row(f, lo, hi)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_f",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lo",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("hi",
          org.apache.spark.sql.types.LongType))))
    val hitFiles = deltaKeyed.select(col("_zkey"))
      .join(broadcast(rangesDf),
        col("_zkey") >= col("lo") && col("_zkey") <= col("hi"))
      .select(col("_f")).distinct().collect().map(_.getString(0)).toSet
    val (overlap, untouched) = ranges.partition {
      case (f, _, _) => hitFiles.contains(f)
    }

    val rewriteInput = {
      val d = deltaKeyed
      if (overlap.isEmpty) d
      else spark.read.parquet(overlap.map(_._1): _*)
        .withColumn("_zkey", frozenKey(m, x, y))
        .unionByName(d)
    }
    val nOut = math.max(1, overlap.length + 1)
    val tmp = new org.apache.hadoop.fs.Path(path, s".compact_tmp")
    rewriteInput
      .repartitionByRange(nOut, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: remove superseded files, move the rewritten ones in under
    // fresh names (a real table format would commit this atomically
    // in its log; directory rename is the single-FS stand-in)
    overlap.foreach { case (f, _, _) =>
      hadoopFs.delete(new org.apache.hadoop.fs.Path(
        new java.net.URI(f).getPath), false)
    }
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val moved = hadoopFs.listStatus(tmp)
      .filter(s => s.getPath.getName.startsWith("part-"))
    moved.zipWithIndex.foreach { case (s, i) =>
      hadoopFs.rename(s.getPath, new org.apache.hadoop.fs.Path(
        path, s"part-compact-$stamp-$i.parquet"))
    }
    hadoopFs.delete(tmp, true)
    (overlap.length, untouched.length)
  }

  private def countDataFiles(hadoopFs: org.apache.hadoop.fs.FileSystem,
                             path: String): Int =
    hadoopFs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(s => s.getPath.getName.startsWith("part-"))
}
