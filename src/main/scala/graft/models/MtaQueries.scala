package graft.models

import graft.Q
import graft.models.MtaOracleSql.{withPrelude, withSched}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType}

/** Driver-checkable queries for the MTA model layer: the four fact
  * views and the 12 metric queries, run over the deterministic
  * synthetic MTA tables (MtaSynthetic) derived from testdata, each
  * with a DuckDB oracle replaying the identical pipeline
  * (MtaOracleSql). Timestamps are emitted as epoch seconds (or
  * formatted strings) so both engines hash identically.
  */
object MtaQueries {

  // ── Spark-side model builders ─────────────────────────────────────
  // fact_trips_stops is shared by all 16 MTA queries; materialize it
  // once per (session, sfDir) — the engine-side equivalent of the
  // reference's "materialize for production dashboards" guidance
  // (docs/metrics_guide.md:385). Engine.materialize keeps results
  // byte-identical to the lazy view (localCheckpoint locally, bucketed
  // table on a cluster).
  /** Memoize + materialize a shared intermediate per (session, dir)
    * through [[graft.Engine.materializeShared]] — the ONE registry of
    * live shared frames, so `Engine.unpersistStale` sweeps never
    * release blocks these queries still read, and Bench's
    * snapshot/rollback charges the build to the query that builds it
    * in both samples (a private memo here would let min-of-two discard
    * the fts build cost). Tokens embed the application id, so entries
    * from stopped sessions are never returned. */
  private def memoized(s: SparkSession, dir: String, name: String,
                       key: String)(build: => DataFrame): DataFrame =
    graft.Engine.materializeShared(s,
      token = s"mta:${s.sparkContext.applicationId}:$dir:$name",
      build, key = key, name = name)

  private def fts(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "fts", "trip_uid") {
      val e = MtaSynthetic.ev(s, dir)
      MtaModels.factTripsStops(
        MtaSynthetic.tripUpdates(e), MtaSynthetic.stopTimeUpdates(e),
        MtaSynthetic.stops(s), MtaSynthetic.trips(e))
    }

  /** The synthetic GTFS schedule tables scan the full events table on
    * every derivation (and scheduledWindow reads stop_times twice) —
    * memoize them like fts; they are schedule-sized once computed. */
  private def sTrips(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "mta_trips", "trip_id") {
      MtaSynthetic.trips(MtaSynthetic.ev(s, dir))
    }
  private def sStopTimes(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "mta_stop_times", "trip_id") {
      MtaSynthetic.stopTimes(MtaSynthetic.ev(s, dir))
    }
  private def ft(s: SparkSession, dir: String): DataFrame =
    MtaModels.factTrips(fts(s, dir), MtaSynthetic.stops(s))
  private def fa(s: SparkSession, dir: String): DataFrame = {
    val e = MtaSynthetic.ev(s, dir)
    MtaModels.factAlerts(
      MtaSynthetic.alerts(e), MtaSynthetic.headerTx(e), MtaSynthetic.descTx(e),
      MtaSynthetic.activePeriod(e), MtaSynthetic.informedEntity(e),
      MtaSynthetic.routes(s), MtaSynthetic.stops(s))
  }

  private def u(c: String): Column = unix_timestamp(col(c))

  // shared metric parameters (fixed: synthetic window is Jan 2024 EST)
  private val Day = "2024-01-15"
  private val Tz = "America/New_York"
  private val T0 = "2024-01-01 00:00:00"
  private val T1 = "2024-02-01 00:00:00"

  /** First-event CTEs shared by the m3/m4 oracles (the reference's
    * `first_event` subquery — metrics_guide.md:107-126). */
  private def feCtes(nonNullOnly: Boolean): String = {
    val filter = if (nonNullOnly) "WHERE evt IS NOT NULL" else ""
    s"""fe_base AS (
  SELECT route_id, direction_id, trip_uid, stop_sequence_int, event_ts_utc,
         stu_id, coalesce(departure_ts_utc, arrival_ts_utc) AS evt
  FROM m_fts),
fe_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY route_id, direction_id, trip_uid
    ORDER BY stop_sequence_int ASC NULLS FIRST, event_ts_utc ASC NULLS FIRST,
             stu_id ASC) AS rn
  FROM fe_base $filter),
fe AS (SELECT route_id, direction_id, trip_uid, evt FROM fe_ranked WHERE rn = 1)"""
  }

  val queries: Map[String, Q] = Map(

    // ── the four model views (SURVEY §1–§2 core capability) ─────────
    "mta_fact_trips_stops" -> Q(
      fn = (s, dir) => fts(s, dir).select(
        col("tu_id"), col("stu_id"), col("feed"), col("rt_trip_id"),
        col("route_id"), col("direction_id"), col("service_date"),
        col("trip_schedule_relationship"), col("trip_headsign"),
        col("stop_id"), col("stop_sequence_int"), col("stop_name"),
        col("parent_station"), col("stop_lat"), col("stop_lon"),
        u("feed_ts_utc").as("feed_s"),
        u("arrival_ts_utc").as("arr_s"),
        u("departure_ts_utc").as("dep_s"),
        col("arrival__delay"), col("departure__delay"),
        col("arrival__uncertainty"), col("departure__uncertainty"),
        col("route_headsign_key"), col("rt_origin_code_hundredths"),
        col("trip_uid_text"), col("trip_uid"),
        col("has_arrival_ts"), col("has_departure_ts"),
        u("event_ts_utc").as("event_s"), col("event_kind_primary"),
        date_format(col("event_dt_local"), "yyyy-MM-dd HH:mm:ss")
          .as("event_local_str"),
        col("service_day_local").cast(StringType).as("service_day_str"))
        .orderBy(col("stu_id")),
      oracle = Some(withPrelude("""
        final AS (SELECT
          tu_id, stu_id, feed, rt_trip_id, route_id, direction_id,
          service_date, trip_schedule_relationship, trip_headsign,
          stop_id, stop_sequence_int, stop_name, parent_station,
          stop_lat, stop_lon,
          epoch_us(feed_ts_utc)//1000000 AS feed_s,
          epoch_us(arrival_ts_utc)//1000000 AS arr_s,
          epoch_us(departure_ts_utc)//1000000 AS dep_s,
          arrival__delay, departure__delay,
          arrival__uncertainty, departure__uncertainty,
          route_headsign_key, rt_origin_code_hundredths,
          trip_uid_text, trip_uid, has_arrival_ts, has_departure_ts,
          epoch_us(event_ts_utc)//1000000 AS event_s, event_kind_primary,
          strftime(event_dt_local, '%Y-%m-%d %H:%M:%S') AS event_local_str,
          CAST(service_day_local AS VARCHAR) AS service_day_str
        FROM m_fts)
        SELECT * FROM final ORDER BY stu_id""")),
      desc = "fact_trips_stops: stop-level fact view (reference core model)"),

    // ── S4 under the hash gate: the write-partitioned-then-read-back
    // round trip the reference's production guidance prescribes
    // (docs/metrics_guide.md:385 — materialize the stop fact
    // partitioned by local service day). The fn WRITES the normalized
    // fact through Engine.materializeByServiceDay, reads it back from
    // disk, and returns ONE day's partition — so what's hashed is the
    // full sink lifecycle: partition layout, column round-trip
    // through parquet + partition-directory encoding (DATE partition
    // values re-infer as DATE), and pruning correctness. The oracle
    // is the equivalent filtered view — if the sink dropped, doubled,
    // or re-typed anything, the hash breaks. EngineSpec holds the
    // plan-level assertions (PartitionFilters, per-day dirs);
    // pre-normalized event_s keeps the epoch-seconds determinism rule
    // inside the written table.
    "s4_partition_roundtrip" -> Q(
      fn = (s, dir) => {
        val sel = fts(s, dir).select(
          col("stu_id"), col("route_id"), col("stop_id"),
          col("stop_sequence_int"),
          col("arrival__delay"), col("departure__delay"),
          u("event_ts_utc").as("event_s"),
          col("service_day_local"))
        // planToken-keyed sink dir (r13 verdict ask #6): a fixed
        // /tmp path collides across concurrent harness runs; the
        // sharedDir registry gives per-(app, plan, data) isolation
        // plus eviction/shutdown cleanup for free. The write IS the
        // operator, so it happens inside the build closure and the
        // second bench sample re-pays it after rollback.
        val outDir = graft.Engine.sharedDir(s,
          graft.Engine.planToken(sel, extra = "s4_fts_by_day")) { d =>
          graft.Engine.materializeByServiceDay(sel, d)
        }
        s.read.parquet(outDir)
          .filter(col("service_day_local") === lit(Day).cast(DateType))
          .select(col("stu_id"), col("route_id"), col("stop_id"),
            col("stop_sequence_int"),
            col("arrival__delay"), col("departure__delay"), col("event_s"),
            col("service_day_local").cast(StringType).as("service_day_str"))
          .orderBy(col("stu_id"))
      },
      oracle = Some(withPrelude(s"""
        final AS (SELECT
          stu_id, route_id, stop_id, stop_sequence_int,
          arrival__delay, departure__delay,
          epoch_us(event_ts_utc)//1000000 AS event_s,
          CAST(service_day_local AS VARCHAR) AS service_day_str
        FROM m_fts
        WHERE service_day_local = DATE '$Day')
        SELECT * FROM final ORDER BY stu_id""")),
      desc = "S4 table sink: write day-partitioned, read one partition back (round-trip gated)"),

    "mta_fact_trips" -> Q(
      fn = (s, dir) => ft(s, dir).select(
        col("trip_uid"), col("trip_uid_text"), col("rt_trip_id"),
        col("route_id"), col("direction_id"), col("trip_headsign"),
        col("service_date"), col("rt_origin_code_hundredths"),
        u("first_feed_ts_utc").as("first_feed_s"),
        u("last_feed_ts_utc").as("last_feed_s"),
        col("first_ingest_ts"), col("last_ingest_ts"),
        col("first_stop_id"), col("last_stop_id"),
        col("first_stop_sequence"), col("last_stop_sequence"),
        u("first_event_ts_utc").as("first_event_s"),
        u("last_event_ts_utc").as("last_event_s"),
        col("trip_duration_s"), col("schedule_relationship"),
        col("first_stop_name"), col("first_parent_station"),
        col("first_stop_lat"), col("first_stop_lon"),
        col("last_stop_name"), col("last_parent_station"),
        col("last_stop_lat"), col("last_stop_lon"))
        .orderBy(col("trip_uid")),
      oracle = Some(withPrelude("""
        final AS (SELECT
          trip_uid, trip_uid_text, rt_trip_id, route_id, direction_id,
          trip_headsign, service_date, rt_origin_code_hundredths,
          epoch_us(first_feed_ts_utc)//1000000 AS first_feed_s,
          epoch_us(last_feed_ts_utc)//1000000 AS last_feed_s,
          first_ingest_ts, last_ingest_ts,
          first_stop_id, last_stop_id,
          first_stop_sequence, last_stop_sequence,
          epoch_us(first_event_ts_utc)//1000000 AS first_event_s,
          epoch_us(last_event_ts_utc)//1000000 AS last_event_s,
          trip_duration_s, schedule_relationship,
          first_stop_name, first_parent_station, first_stop_lat, first_stop_lon,
          last_stop_name, last_parent_station, last_stop_lat, last_stop_lon
        FROM m_ft)
        SELECT * FROM final ORDER BY trip_uid""")),
      desc = "fact_trips: per-trip argmin/argmax rollup (A5) + dim re-join"),

    // ── dbt `materialized='incremental'` maintenance law, gated ─────
    // The last dbt-lifecycle analog (dbt_project.yml:39-43) without a
    // hash gate: a BATCH model maintained incrementally must equal
    // its from-scratch rebuild. The fn replays the lifecycle on
    // fact_trips — the hardest model to maintain incrementally
    // because its grain is an argmin/argmax AGGREGATE of the source
    // (a new stop event can change a trip's first/last columns, so
    // naive append is wrong by construction):
    //   1. full refresh over the HISTORY half of feed time → table;
    //   2. "tonight's batch" arrives (the newer half);
    //   3. incremental refresh: recompute ONLY the trips the batch
    //      touches, over their FULL history (dbt's is_incremental()
    //      + unique_key merge shape: affected keys re-aggregated,
    //      untouched rows carried), merge-upsert into the table;
    //   4. read the maintained table back.
    // The oracle is mta_fact_trips' from-scratch oracle VERBATIM —
    // any key missed by the touch set, doubled by the merge, or
    // re-typed by the parquet round trip breaks the hash. At 100 TB
    // this is THE nightly shape: the recompute is O(batch trips'
    // history), never O(corpus).
    "mta_fact_trips_inc" -> Q(
      fn = (s, dir) => {
        val stops = MtaSynthetic.stops(s)
        val base = fts(s, dir)
        def sel(f: DataFrame): DataFrame = f.select(
          col("trip_uid"), col("trip_uid_text"), col("rt_trip_id"),
          col("route_id"), col("direction_id"), col("trip_headsign"),
          col("service_date"), col("rt_origin_code_hundredths"),
          u("first_feed_ts_utc").as("first_feed_s"),
          u("last_feed_ts_utc").as("last_feed_s"),
          col("first_ingest_ts"), col("last_ingest_ts"),
          col("first_stop_id"), col("last_stop_id"),
          col("first_stop_sequence"), col("last_stop_sequence"),
          u("first_event_ts_utc").as("first_event_s"),
          u("last_event_ts_utc").as("last_event_s"),
          col("trip_duration_s"), col("schedule_relationship"),
          col("first_stop_name"), col("first_parent_station"),
          col("first_stop_lat"), col("first_stop_lon"),
          col("last_stop_name"), col("last_parent_station"),
          col("last_stop_lat"), col("last_stop_lon"))
        val root = graft.Engine.sharedDir(s,
          graft.Engine.planToken(base, extra = "ft_incremental")) { d =>
          val st = base.agg(min(u("feed_ts_utc")).as("lo"),
            max(u("feed_ts_utc")).as("hi")).head
          val mid = (st.getLong(0) + st.getLong(1)) / 2
          // 1. full refresh over history
          sel(MtaModels.factTrips(
              base.filter(u("feed_ts_utc") <= mid), stops))
            .write.mode("overwrite").parquet(d + "/tbl")
          // 2-3. batch arrives; recompute touched trips' full history
          val touched = base.filter(u("feed_ts_utc") > mid)
            .select(col("trip_uid")).distinct()
          val recomputed = sel(MtaModels.factTrips(
            base.join(touched, Seq("trip_uid"), "left_semi"), stops))
          s.read.parquet(d + "/tbl")
            .join(touched, Seq("trip_uid"), "left_anti")
            .unionByName(recomputed)
            .write.mode("overwrite").parquet(d + "/tbl2")
        }
        s.read.parquet(root + "/tbl2").orderBy(col("trip_uid"))
      },
      oracle = Some(withPrelude("""
        final AS (SELECT
          trip_uid, trip_uid_text, rt_trip_id, route_id, direction_id,
          trip_headsign, service_date, rt_origin_code_hundredths,
          epoch_us(first_feed_ts_utc)//1000000 AS first_feed_s,
          epoch_us(last_feed_ts_utc)//1000000 AS last_feed_s,
          first_ingest_ts, last_ingest_ts,
          first_stop_id, last_stop_id,
          first_stop_sequence, last_stop_sequence,
          epoch_us(first_event_ts_utc)//1000000 AS first_event_s,
          epoch_us(last_event_ts_utc)//1000000 AS last_event_s,
          trip_duration_s, schedule_relationship,
          first_stop_name, first_parent_station, first_stop_lat, first_stop_lon,
          last_stop_name, last_parent_station, last_stop_lat, last_stop_lon
        FROM m_ft)
        SELECT * FROM final ORDER BY trip_uid""")),
      desc = "incremental model maintenance: touched-key re-aggregation + merge equals full rebuild"),

    "mta_fact_delays" -> Q(
      fn = (s, dir) => MtaModels.factDelays(fts(s, dir)).select(
        col("stu_id"), col("trip_uid"), col("feed"), col("route_id"),
        col("service_date"), col("stop_id"), col("stop_sequence_int"),
        u("event_ts_utc").as("event_s"), col("event_kind_primary"),
        col("arrival__delay"), col("departure__delay"),
        col("has_arrival_ts"), col("has_departure_ts"),
        col("service_day_local").cast(StringType).as("service_day_str"))
        .orderBy(col("stu_id")),
      oracle = Some(withPrelude("""
        final AS (SELECT
          stu_id, trip_uid, feed, route_id, service_date, stop_id,
          stop_sequence_int,
          epoch_us(event_ts_utc)//1000000 AS event_s, event_kind_primary,
          arrival__delay, departure__delay, has_arrival_ts, has_departure_ts,
          CAST(service_day_local AS VARCHAR) AS service_day_str
        FROM m_fd)
        SELECT * FROM final ORDER BY stu_id""")),
      desc = "fact_delays: filtered projection (P3/P4) of stop-level view"),

    "mta_fact_alerts" -> Q(
      fn = (s, dir) => fa(s, dir).select(
        col("alert_id"), col("feed"), col("entity_id"), col("as_of"),
        col("header_text"), col("description_text"),
        u("first_start_ts_utc").as("first_start_s"),
        u("last_end_ts_utc").as("last_end_s"),
        col("route_id"), col("route_short_name"), col("route_long_name"),
        col("route_type"), col("route_color"), col("route_text_color"),
        col("route_desc"), col("agency_id"),
        col("stop_name"), col("parent_station"), col("stop_lat"), col("stop_lon"))
        .orderBy(col("alert_id")),
      oracle = Some(withPrelude("""
        final AS (SELECT
          alert_id, feed, entity_id, as_of, header_text, description_text,
          epoch_us(first_start_ts_utc)//1000000 AS first_start_s,
          epoch_us(last_end_ts_utc)//1000000 AS last_end_s,
          route_id, route_short_name, route_long_name, route_type,
          route_color, route_text_color, route_desc, agency_id,
          stop_name, parent_station, stop_lat, stop_lon
        FROM m_fa)
        SELECT * FROM final ORDER BY alert_id""")),
      desc = "fact_alerts: pre-aggregated 1:1 child chain (J4/A4)"),

    // ── the 12 metric queries (metrics_guide.md) ────────────────────
    "mta_m1_trips_per_minute" -> Q(
      fn = (s, dir) => MtaMetrics.tripsPerMinute(fts(s, dir), T0, T1)
        .select(col("route_id"), col("direction_id"),
          u("ts_minute").as("minute_s"), col("trips_observed"))
        .orderBy(col("minute_s"), col("route_id"), col("direction_id")),
      oracle = Some(withPrelude(s"""
        final AS (SELECT route_id, direction_id,
          epoch_us(date_trunc('minute', feed_ts_utc))//1000000 AS minute_s,
          count(DISTINCT trip_uid) AS trips_observed
        FROM m_fts
        WHERE feed_ts_utc BETWEEN TIMESTAMP '$T0' AND TIMESTAMP '$T1'
        GROUP BY 1, 2, 3)
        SELECT * FROM final
        ORDER BY minute_s, route_id NULLS FIRST, direction_id""")),
      desc = "M1 trips observed per minute (A8 count-distinct per bucket)"),

    "mta_m2_trips_per_5min" -> Q(
      fn = (s, dir) => MtaMetrics.tripsPer5Min(fts(s, dir), T0, T1)
        .select(col("route_id"), col("direction_id"),
          u("ts_5min").as("bucket_s"), col("trips_observed"))
        .orderBy(col("bucket_s"), col("route_id"), col("direction_id")),
      oracle = Some(withPrelude(s"""
        final AS (SELECT route_id, direction_id,
          (epoch_us(feed_ts_utc)//1000000)//300*300 AS bucket_s,
          count(DISTINCT trip_uid) AS trips_observed
        FROM m_fts
        WHERE feed_ts_utc BETWEEN TIMESTAMP '$T0' AND TIMESTAMP '$T1'
        GROUP BY 1, 2, 3)
        SELECT * FROM final
        ORDER BY bucket_s, route_id NULLS FIRST, direction_id""")),
      desc = "M2 trips observed per aligned 5-min bucket (F10)"),

    "mta_m3_service_delivered" -> Q(
      fn = (s, dir) => MtaMetrics.serviceDelivered(
        fts(s, dir), MtaSynthetic.calendar(s),
        sTrips(s, dir), sStopTimes(s, dir),
        Day, Tz, "06:00:00", "23:00:00"),
      oracle = Some(withSched(s"""
        ${feCtes(nonNullOnly = true)},
        actual_in_window AS (
          SELECT route_id, direction_id, trip_uid FROM fe
          WHERE strftime(evt - INTERVAL 5 HOUR, '%H:%M:%S')
                BETWEEN '06:00:00' AND '23:00:00')
        SELECT s.route_id, s.direction_id,
          count(DISTINCT s.trip_id) AS scheduled_trips,
          count(DISTINCT a.trip_uid) AS delivered_trips,
          CAST(count(DISTINCT a.trip_uid) AS DOUBLE)
            / count(DISTINCT s.trip_id) AS service_delivered
        FROM window_local s
        LEFT JOIN actual_in_window a USING (route_id, direction_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),
      desc = "M3 service delivered: calendar + GTFS-time schedule vs realtime"),

    "mta_m4_terminal_otp" -> Q(
      fn = (s, dir) => MtaMetrics.terminalOtp(
        fts(s, dir), MtaSynthetic.calendar(s),
        sTrips(s, dir), sStopTimes(s, dir),
        Day, Tz, "06:00:00", "23:00:00"),
      oracle = Some(withSched(s"""
        ${feCtes(nonNullOnly = false)}
        SELECT wl.route_id, wl.direction_id,
          100*avg(CASE WHEN CAST(trunc((epoch_us(fe.evt)//1000000
            - epoch_us(wl.sched_departure_ts)//1000000)/60.0) AS BIGINT)
            BETWEEN 0 AND 5 THEN 1 ELSE 0 END) AS otp_pct
        FROM window_local wl
        LEFT JOIN fe ON fe.route_id = wl.route_id
                    AND fe.direction_id = wl.direction_id
        GROUP BY 1, 2 ORDER BY 1, 2""")),
      desc = "M4 terminal on-time performance vs scheduled departure"),

    "mta_m5_headways" -> Q(
      fn = (s, dir) => MtaMetrics.headwaysAtStop(fts(s, dir), "S5", "2024-01-10", Tz)
        .select(col("route_id"), col("direction_id"),
          u("pass_ts").as("pass_s"), col("trip_uid"), col("headway_s"))
        .orderBy(col("pass_s"), col("trip_uid")),
      oracle = Some(withPrelude("""
        seen AS (
          SELECT date_trunc('second', event_ts_utc) AS pass_ts,
                 route_id, direction_id, trip_uid, stu_id
          FROM m_fts
          WHERE stop_id = 'S5'
            AND CAST(event_ts_utc - INTERVAL 5 HOUR AS DATE) = DATE '2024-01-10'),
        fp AS (
          SELECT * FROM (SELECT *, row_number() OVER
            (PARTITION BY trip_uid ORDER BY pass_ts, stu_id) AS rn1 FROM seen)
          WHERE rn1 = 1),
        ordr AS (
          SELECT *, row_number() OVER (ORDER BY pass_ts, trip_uid) AS rn FROM fp),
        hw AS (
          SELECT route_id, direction_id, pass_ts, trip_uid, rn,
            epoch_us(pass_ts)//1000000 - epoch_us(lag(pass_ts) OVER
              (PARTITION BY route_id, direction_id
               ORDER BY pass_ts, trip_uid))//1000000 AS headway_s
          FROM ordr)
        SELECT route_id, direction_id, epoch_us(pass_ts)//1000000 AS pass_s,
               trip_uid, headway_s
        FROM hw WHERE rn > 1 ORDER BY pass_s, trip_uid""")),
      desc = "M5 headways at a screenline stop (W1 dedup + W2 seq + W3 lag)"),

    "mta_m6_dwell" -> Q(
      fn = (s, dir) => MtaMetrics.dwellTimes(fts(s, dir))
        .orderBy(col("stu_id")),
      oracle = Some(withPrelude("""
        final AS (SELECT route_id, direction_id, stop_id, trip_uid, stu_id,
          date_diff('second', arrival_ts_utc, departure_ts_utc) AS dwell_s
        FROM m_fts
        WHERE arrival_ts_utc IS NOT NULL AND departure_ts_utc IS NOT NULL)
        SELECT * FROM final ORDER BY stu_id""")),
      desc = "M6 dwell time per stop (F6 timestamp diff)"),

    "mta_m7_runtime_ab" -> Q(
      fn = (s, dir) => MtaMetrics.runTimeAB(fts(s, dir), "S3", "S9")
        .orderBy(col("trip_uid"), col("stu_a"), col("stu_b")),
      oracle = Some(withPrelude("""
        a AS (SELECT trip_uid, stu_id AS stu_a,
                coalesce(departure_ts_utc, arrival_ts_utc) AS ts_a
              FROM m_fts WHERE stop_id = 'S3'),
        b AS (SELECT trip_uid, stu_id AS stu_b,
                coalesce(arrival_ts_utc, departure_ts_utc) AS ts_b
              FROM m_fts WHERE stop_id = 'S9')
        SELECT trip_uid, stu_a, stu_b,
               date_diff('second', ts_a, ts_b) AS runtime_s
        FROM a JOIN b USING (trip_uid)
        WHERE ts_b >= ts_a
        ORDER BY trip_uid, stu_a, stu_b""")),
      desc = "M7 A→B run time (J6 self-join + J7 theta residual)"),

    "mta_m8_excess_delay" -> Q(
      fn = (s, dir) => MtaMetrics.excessDelay(
        fts(s, dir), sTrips(s, dir), sStopTimes(s, dir), Day, "S5"),
      oracle = Some(withPrelude("""
        sched8 AS (
          SELECT t.route_id AS s_route_id, t.direction_id AS s_direction_id,
            make_timestamp((epoch_us(TIMESTAMP '2024-01-15 00:00:00')//1000000
              + TRY_CAST(string_split(st.departure_time, ':')[1] AS BIGINT)*3600
              + TRY_CAST(string_split(st.departure_time, ':')[2] AS BIGINT)*60
              + TRY_CAST(string_split(st.departure_time, ':')[3] AS BIGINT))
              *1000000) AS sched_departure_ts
          FROM m_stop_times st JOIN m_trips t ON t.trip_id = st.trip_id
          WHERE st.stop_id = 'S5'),
        actual8 AS (
          SELECT route_id, direction_id, stop_id,
                 coalesce(departure_ts_utc, arrival_ts_utc) AS actual_ts
          FROM m_fts WHERE stop_id = 'S5')
        SELECT a.route_id, a.direction_id, a.stop_id,
          quantile_cont(date_diff('second', s.sched_departure_ts, a.actual_ts),
                        0.5) AS p50_delay_s,
          quantile_cont(date_diff('second', s.sched_departure_ts, a.actual_ts),
                        0.9) AS p90_delay_s
        FROM actual8 a JOIN sched8 s
          ON s.s_route_id = a.route_id AND s.s_direction_id = a.direction_id
        GROUP BY 1, 2, 3 ORDER BY 1, 2""")),
      desc = "M8 excess delay p50/p90 vs schedule (A9 exact percentile)"),

    "mta_m9_completeness" -> Q(
      fn = (s, dir) => MtaMetrics.tripCompleteness(fts(s, dir)),
      oracle = Some(withPrelude("""
        agg AS (SELECT trip_uid,
          count(*) FILTER (coalesce(arrival_ts_utc, departure_ts_utc)
            IS NOT NULL) AS stops_seen
        FROM m_fts GROUP BY trip_uid)
        SELECT count(*) AS trips_total,
          count(*) FILTER (stops_seen >= 2) AS trips_with_start_and_end,
          CAST(count(*) FILTER (stops_seen >= 2) AS DOUBLE)/count(*)
            AS completeness_rate
        FROM agg""")),
      desc = "M9 trip completeness (A6 count_if + A11 safe divide)"),

    "mta_m10_added_canceled" -> Q(
      fn = (s, dir) => MtaMetrics.addedCanceledShare(ft(s, dir)),
      oracle = Some(withPrelude("""
        final AS (SELECT route_id, direction_id,
          100*avg(CASE WHEN schedule_relationship = 'ADDED' THEN 1 ELSE 0 END)
            AS added_pct,
          100*avg(CASE WHEN schedule_relationship = 'CANCELED' THEN 1 ELSE 0 END)
            AS canceled_pct
        FROM m_ft GROUP BY 1, 2)
        SELECT * FROM final ORDER BY route_id NULLS FIRST, direction_id""")),
      desc = "M10 added/canceled share (A7 conditional rates over rollup)"),

    "mta_m11_feed_latency" -> Q(
      fn = (s, dir) => MtaMetrics.feedLatency(ft(s, dir))
        .select(col("route_id"), col("direction_id"),
          u("ts_minute").as("minute_s"), col("avg_latency_s"))
        .orderBy(col("minute_s"), col("route_id"), col("direction_id")),
      oracle = Some(withPrelude("""
        final AS (SELECT route_id, direction_id,
          epoch_us(date_trunc('minute', first_feed_ts_utc))//1000000 AS minute_s,
          avg(TRY_CAST(first_ingest_ts AS BIGINT)
              - epoch_us(first_feed_ts_utc)//1000000) AS avg_latency_s
        FROM m_ft GROUP BY 1, 2, 3)
        SELECT * FROM final
        ORDER BY minute_s, route_id NULLS FIRST, direction_id""")),
      desc = "M11 feed latency: ingest vs feed timestamp (A10 avg)"),

    "mta_m12_wait_assessment" -> Q(
      fn = (s, dir) => MtaMetrics.waitAssessment(
        fts(s, dir), sTrips(s, dir), sStopTimes(s, dir), "S5", Day),
      oracle = Some(withPrelude("""
        obs12 AS (
          SELECT route_id, direction_id, stu_id,
                 date_trunc('second', event_ts_utc) AS pass_ts
          FROM m_fts WHERE stop_id = 'S5'),
        obshw AS (
          SELECT *, epoch_us(pass_ts)//1000000 - epoch_us(lag(pass_ts) OVER
            (PARTITION BY route_id, direction_id
             ORDER BY pass_ts ASC NULLS FIRST, stu_id ASC))//1000000 AS headway_s
          FROM obs12),
        sch12 AS (
          SELECT t.route_id AS s_route_id, t.direction_id AS s_direction_id,
            t.trip_id,
            make_timestamp((epoch_us(TIMESTAMP '2024-01-15 00:00:00')//1000000
              + TRY_CAST(string_split(st.departure_time, ':')[1] AS BIGINT)*3600
              + TRY_CAST(string_split(st.departure_time, ':')[2] AS BIGINT)*60
              + TRY_CAST(string_split(st.departure_time, ':')[3] AS BIGINT))
              *1000000) AS sched_ts
          FROM m_stop_times st JOIN m_trips t ON t.trip_id = st.trip_id
          WHERE st.stop_id = 'S5'),
        schhw AS (
          SELECT *, epoch_us(sched_ts)//1000000 - epoch_us(lag(sched_ts) OVER
            (PARTITION BY s_route_id, s_direction_id
             ORDER BY sched_ts, trip_id))//1000000 AS sched_headway_s
          FROM sch12)
        SELECT o.route_id, o.direction_id,
          100*avg(CASE WHEN o.headway_s <= 2*s.sched_headway_s
                  THEN 1 ELSE 0 END) AS wait_assessment_pct
        FROM obshw o JOIN schhw s
          ON s.s_route_id = o.route_id AND s.s_direction_id = o.direction_id
        WHERE o.headway_s IS NOT NULL AND s.sched_headway_s IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""")),
      desc = "M12 wait assessment: observed vs scheduled headway")
  )
}
