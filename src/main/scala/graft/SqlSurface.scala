package graft

import graft.sources.Sources
import org.apache.spark.sql.SparkSession

/** SQL-first entry point: registers the source tables, the MTA model
  * DAG, and any subset of the extension-query catalog as temp views,
  * so a user whose whole workflow is `spark.sql` strings (the
  * reference's users write SQL — docs/metrics_guide.md queries)
  * reaches every operator without touching the Scala API.
  *
  * Query views are LAZY plans, not data — registration moves nothing
  * for pure-DataFrame operators. The exception is operators that pin
  * a hot intermediate through [[Engine.materialize]] (minhash
  * signatures, k-means codebooks, BPE fits): building their frame
  * runs the eager materialize step at registration time. That is why
  * [[register]] takes an explicit name list and [[registerAll]] is a
  * separate, documented-as-expensive call, rather than sources
  * defaulting to the full catalog.
  */
object SqlSurface {

  /** Register sources + model DAG + the named extension queries as
    * temp views (view name = query name, e.g. `dedup_minhash`).
    * Unknown names fail fast with the catalog's valid keys. */
  def register(spark: SparkSession, dir: String,
               queries: Seq[String]): Unit = {
    Sources.registerAll(spark, dir)
    Engine.registerMta(spark, dir)
    queries.foreach { n =>
      val q = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(
          s"SqlSurface: unknown query '$n' (valid: " +
            s"${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
      q(spark, dir).createOrReplaceTempView(n)
    }
  }

  /** Register the ENTIRE catalog (eager-materialize operators run
    * their builds now — minutes at large SF; prefer [[register]] with
    * the views a session actually needs). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, SparkEntry.queries.keys.toSeq.sorted)

  /** PARAMETERIZED metric entry points for the SQL-only user: the
    * reference's metric queries take `DECLARE` variables
    * (docs/metrics_guide.md:24-25, 57-61, 171-173 — window bounds,
    * screenline stop, service day), which fixed-parameter views can
    * only expose at their defaults. Spark 4's SQL table functions
    * close that gap: each metric registers as a temporary
    * `CREATE FUNCTION … RETURNS TABLE` whose body is the metric's
    * plan over the model DAG views, so
    * `SELECT * FROM mta_headways_at_stop('S3', DATE'2024-01-12',
    * 'America/New_York')` runs the metric at ANY parameters with no
    * Scala in the query path (SqlSurfaceSpec pins result ≡ the Scala
    * call at non-default parameters). The bodies are the same
    * expression shapes as the MtaMetrics DataFrame code — Catalyst
    * inlines the function body at call site, so plans and pushdown
    * match the Scala path. */
  def registerMetricFunctions(spark: SparkSession, dir: String): Unit = {
    Sources.registerAll(spark, dir)
    Engine.registerMta(spark, dir)
    // M1/M2 twin — trips observed per minute in a caller-chosen UTC
    // window (metrics_guide.md:24-25)
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION mta_trips_per_minute(
          start_ts TIMESTAMP, end_ts TIMESTAMP)
      RETURNS TABLE
      RETURN
      SELECT route_id, direction_id,
             date_trunc('MINUTE', feed_ts_utc) AS ts_minute,
             count(DISTINCT trip_uid) AS trips_observed
      FROM fact_trips_stops
      WHERE feed_ts_utc BETWEEN start_ts AND end_ts
      GROUP BY route_id, direction_id, date_trunc('MINUTE', feed_ts_utc)
    """)
    // M2 twin — trips per aligned 5-minute bucket in a caller-chosen
    // UTC window (metrics_guide.md:39-51)
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION mta_trips_per_5min(
          start_ts TIMESTAMP, end_ts TIMESTAMP)
      RETURNS TABLE
      RETURN
      SELECT route_id, direction_id,
             timestamp_seconds((unix_timestamp(feed_ts_utc) div 300) * 300)
               AS ts_5min,
             count(DISTINCT trip_uid) AS trips_observed
      FROM fact_trips_stops
      WHERE feed_ts_utc BETWEEN start_ts AND end_ts
      GROUP BY route_id, direction_id,
               timestamp_seconds((unix_timestamp(feed_ts_utc) div 300) * 300)
    """)
    // M7 — run time between two caller-chosen stops on the same trip
    // (metrics_guide.md:217-237): same plan as MtaMetrics.runTimeAB
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION mta_runtime_ab(
          stop_a STRING, stop_b STRING)
      RETURNS TABLE
      RETURN
      WITH sa AS (
        SELECT trip_uid, coalesce(departure_ts_utc, arrival_ts_utc) AS ts_a,
               stu_id AS stu_a
        FROM fact_trips_stops WHERE stop_id = stop_a),
      sb AS (
        SELECT trip_uid, coalesce(arrival_ts_utc, departure_ts_utc) AS ts_b,
               stu_id AS stu_b
        FROM fact_trips_stops WHERE stop_id = stop_b)
      SELECT sa.trip_uid, sa.stu_a, sb.stu_b,
             unix_timestamp(sb.ts_b) - unix_timestamp(sa.ts_a) AS runtime_s
      FROM sa JOIN sb ON sb.trip_uid = sa.trip_uid
      WHERE sb.ts_b >= sa.ts_a
    """)
    // M5 — headways at a screenline stop on a service day
    // (metrics_guide.md:171-173): same plan as
    // MtaMetrics.headwaysAtStop, trip_uid tie-breaks both orderings
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION mta_headways_at_stop(
          stop STRING, service_day DATE, tz STRING)
      RETURNS TABLE
      RETURN
      WITH seen AS (
        SELECT date_trunc('SECOND', event_ts_utc) AS pass_ts,
               route_id, direction_id, trip_uid, stu_id
        FROM fact_trips_stops
        WHERE stop_id = stop
          AND to_date(from_utc_timestamp(event_ts_utc, tz)) = service_day),
      fp AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY trip_uid
            ORDER BY pass_ts, stu_id) AS rn1 FROM seen)
        WHERE rn1 = 1),
      ord AS (
        SELECT *, row_number() OVER (ORDER BY pass_ts, trip_uid) AS rn
        FROM fp),
      hw AS (
        SELECT route_id, direction_id, pass_ts, trip_uid, rn,
               unix_timestamp(pass_ts) - unix_timestamp(
                 lag(pass_ts) OVER (PARTITION BY route_id, direction_id
                   ORDER BY pass_ts, trip_uid)) AS headway_s
        FROM ord)
      SELECT route_id, direction_id, pass_ts, trip_uid, headway_s
      FROM hw WHERE rn > 1
    """)
  }
}
