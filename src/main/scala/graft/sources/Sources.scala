package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source registry — the engine's equivalent of the reference's dbt
  * `source()` resolution (`/root/reference/models/mta_sources.yml:3-6`).
  *
  * A source is a named Parquet table under a scale-factor directory.
  * Reads are plain `spark.read.parquet` so Catalyst keeps predicate
  * pushdown / column pruning / partition pruning on the scan.
  *
  * Scale posture: at 100 TB each table is a partitioned Parquet (or
  * Iceberg/Delta) root; nothing here assumes single-file layout —
  * `dir/name.parquet` may be a directory of part-files.
  */
object Sources {

  /** Driver testdata tables (TPC-H-ish + events/documents/embeddings). */
  val testTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Declared schema contracts for every test source — the engine's
    * analog of the reference pinning a name + type for each column of
    * all its sources (`/root/reference/models/mta_sources.yml:7-178`).
    * `events.ts` is declared POST-normalization (TimestampType): the
    * contract describes what downstream operators consume, and the
    * NANOS→micros normalization happens inside `table` before the
    * check. [[registerAll]] enforces these on every registration, so
    * upstream drift fails at ingest with the column named. */
  val contracts: Map[String, org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types.StructType
    Map(
      "region" -> StructType.fromDDL("r_regionkey INT, r_name STRING"),
      "nation" -> StructType.fromDDL(
        "n_nationkey INT, n_name STRING, n_regionkey INT"),
      "customer" -> StructType.fromDDL(
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
          "c_acctbal DOUBLE, c_mktsegment STRING"),
      "supplier" -> StructType.fromDDL(
        "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"),
      "part" -> StructType.fromDDL(
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, " +
          "p_size INT, p_retailprice DOUBLE"),
      "orders" -> StructType.fromDDL(
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
          "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, " +
          "o_orderpriority STRING"),
      "lineitem" -> StructType.fromDDL(
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, " +
          "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, " +
          "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, " +
          "l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"),
      "events" -> StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING"),
      "documents" -> StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
          "n_chars BIGINT"),
      "embeddings" -> StructType.fromDDL(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"))
  }

  /** Confs a session hosting this library should set at build time
    * (`SparkSession.builder.config(...)`). `table` falls back to
    * setting nanosAsLong at read time for sessions that didn't. */
  val recommendedConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Read a source table, optionally asserting a schema CONTRACT —
    * the engine's analog of the reference's declared source schemas
    * (`/root/reference/models/mta_sources.yml:7-178` pins a name +
    * type for every column of all its sources; dbt's contract
    * enforcement). Parquet footers are self-describing, so reads work
    * without it — but at 100 TB ingest an upstream producer silently
    * widening a column or renaming a field should fail HERE, at the
    * scan, with the column named, not 40 stages later as a resolution
    * error or a silent null cascade. `expect` lists the columns the
    * caller depends on: each must exist with exactly the declared
    * type (extra columns are fine — contracts are need-to-know, like
    * the reference's, which declares only consumed fields).
    * Nullability is NOT checked (parquet writers disagree on it and
    * Spark treats it as advisory). */
  def table(spark: SparkSession, dir: String, name: String,
            expect: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    // events.ts arrives as parquet TIMESTAMP(NANOS), which Spark has no
    // native type for (PARQUET_TYPE_ILLEGAL without the legacy flag).
    // Fallback only — a properly built session (recommendedConf) is
    // never mutated; an unconfigured one gets the flag set once, and
    // that side effect is part of this method's documented contract.
    if (name == "events" && !spark.conf
        .getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val out = name match {
      // Normalize ns-long → TimestampType (micros) once at the source
      // boundary so every downstream operator sees TimestampType.
      case "events" => normalizeEventTs(df)
      case _        => df
    }
    expect.foreach(assertContract(name, out.schema, _))
    out
  }

  /** Fail fast (IllegalArgumentException naming source + column) when
    * `actual` drifts from the declared `expected` contract. */
  def assertContract(name: String,
                     actual: org.apache.spark.sql.types.StructType,
                     expected: org.apache.spark.sql.types.StructType): Unit =
    expected.fields.foreach { f =>
      actual.fields.find(_.name == f.name) match {
        case None => throw new IllegalArgumentException(
          s"source '$name' violates its schema contract: column " +
            s"'${f.name}' (${f.dataType.sql}) is missing " +
            s"(actual columns: ${actual.fieldNames.mkString(", ")})")
        // .sql comparison ignores nullability at EVERY nesting level
        // (ARRAY<FLOAT> matches regardless of containsNull) — parquet
        // writers disagree on it and the scaladoc promises it is not
        // part of the contract
        case Some(a) if a.dataType.sql != f.dataType.sql =>
          throw new IllegalArgumentException(
            s"source '$name' violates its schema contract: column " +
              s"'${f.name}' is ${a.dataType.sql}, contract declares " +
              f.dataType.sql)
        case _ => ()
      }
    }

  /** events.ts: parquet TIMESTAMP(NANOS) → TimestampType (micros).
    * If the runtime already mapped it to TimestampType, pass through;
    * if it surfaced as a long (nanosAsLong), divide to micros.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        // integer division — Column./ is double division, which loses
        // precision at 1e18-scale nanos (double ulp there is 256 ns)
        // and can flip a microsecond (worst case: a second) boundary.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — the
        // other shape the generator emits. The wall-clock value IS
        // the UTC instant (every session in the contract runs UTC),
        // so the cast is a type-level relabel of the same micros.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every testdata table as a temp view (the dbt-`source()`
    * namespace for `spark.sql` / metric queries), enforcing each
    * table's declared [[contracts]] entry at registration. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    testTables.foreach { t =>
      table(spark, dir, t, expect = contracts.get(t))
        .createOrReplaceTempView(t)
    }

  /** dbt-seeds analog (the reference ships the placeholder
    * `seeds/.gitkeep`): register every `*.csv` file under `csvDir` as
    * a temp view named after the file, with a caller-PINNED schema —
    * dbt's `column_types` posture, enforced like every other source
    * contract. CSV is schemaless, so a seed with no declared schema
    * fails fast (type inference silently drifting an id column to
    * DOUBLE is exactly the bug contracts exist to stop). The
    * `calendar` table the MTA metrics consume is the canonical seed
    * shape. Returns the registered seed names, sorted. */
  def seed(spark: SparkSession, csvDir: String,
           schemas: Map[String, org.apache.spark.sql.types.StructType])
      : Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(csvDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(root))
      throw new IllegalArgumentException(s"seed: no such directory $csvDir")
    val files = hfs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".csv"))
      .map(_.getPath).sortBy(_.getName)
    files.map { f =>
      val name = f.getName.stripSuffix(".csv")
      val schema = schemas.getOrElse(name,
        throw new IllegalArgumentException(
          s"seed: '$name' has no declared schema — seeds are " +
            "contract-pinned (dbt column_types); declare every column"))
      val df = tableAs(spark, f.toString, "csv", Some(schema))
      assertContract(name, df.schema, schema)
      df.createOrReplaceTempView(name)
      name
    }.toSeq
  }

  /** Format-agnostic read: the registry's seam for non-Parquet
    * sources (json / csv / orc). Schema is required for the schemaless
    * text formats so types match the Parquet-defined contract. */
  def tableAs(spark: SparkSession, path: String, format: String,
              schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r0 = spark.read.format(format)
    val r1 = schema.fold(r0)(r0.schema)
    val r2 = if (format == "csv") r1.option("header", "true") else r1
    r2.load(path)
  }

  /** Format-agnostic write — [[tableAs]]'s sink twin (json / csv /
    * orc / parquet), with optional partition columns so non-Parquet
    * exports keep partition pruning on re-read. CSV gets a header to
    * round-trip through [[tableAs]]'s header option. */
  def writeAs(df: DataFrame, path: String, format: String,
              partitionBy: Seq[String] = Nil): Unit = {
    val w0 = df.write.mode("overwrite").format(format)
    val w1 = if (format == "csv") w0.option("header", "true") else w0
    val w2 = if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1
    w2.save(path)
  }
}
