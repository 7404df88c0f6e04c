package graft.models

/** DuckDB twin of MtaSynthetic + MtaModels: one WITH-clause prelude
  * reused by every MTA model/metric oracle. Each CTE mirrors the Spark
  * expression tree exactly (same arithmetic, same null branches) so
  * the driver's hash compare is bit-exact.
  *
  * Dialect mapping (SURVEY §2.7): timestamp_seconds → make_timestamp(
  * s*1000000); from_utc_timestamp(ts,'America/New_York') → ts -
  * INTERVAL 5 HOUR (the synthetic window is Jan 2024, EST only — no
  * DST transition, so the fixed offset is exact); sha2(...,256) →
  * sha256; BigQuery-null regexp_extract → nullif(...,''); argmin
  * min_by/max_by → row_number windows with explicit NULLS FIRST/LAST
  * reproducing Spark struct ordering; doubles forced with e0 suffix
  * (DuckDB bare decimals are DECIMAL typed).
  */
object MtaOracleSql {

  val PRELUDE: String = """
ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts)//1000000 AS es
  FROM events),
m_tu AS (
  SELECT
    'tu' || CAST(event_id AS VARCHAR) AS tu_id,
    'load' || CAST(event_id % 4 AS VARCHAR) AS _dlt_load_id,
    CASE WHEN user_id % 5 = 0 THEN 'other' ELSE 'main' END AS feed,
    'e' || CAST(event_id AS VARCHAR) AS entity_id,
    CAST(es + 30 AS VARCHAR) AS as_of,
    CAST(es AS VARCHAR) AS tu_timestamp,
    CASE WHEN event_id % 3 = 0 THEN CAST(event_id * 100 AS VARCHAR) || '_X'
         WHEN event_id % 3 = 1 THEN 'T' || CAST(event_id AS VARCHAR)
         ELSE NULL END AS rt_trip_id,
    CASE WHEN user_id % 7 = 0 THEN NULL
         ELSE 'R' || CAST(user_id % 8 AS VARCHAR) END AS route_id,
    user_id % 2 AS direction_id,
    CASE WHEN event_id % 13 = 0 THEN NULL
         ELSE strftime(make_timestamp(es*1000000), '%Y%m%d') END AS service_date,
    CASE WHEN event_type = 'error' THEN 'CANCELED'
         WHEN event_type = 'signup' THEN 'ADDED'
         ELSE 'SCHEDULED' END AS trip_schedule_relationship
  FROM ev),
m_stu AS (
  SELECT
    'stu' || CAST(event_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS stu_id,
    'tu' || CAST(event_id AS VARCHAR) AS stu_tu_id,
    CASE WHEN (event_id + j) % 17 = 0 THEN 'SX'
         ELSE 'S' || CAST((user_id + j*3) % 20 AS VARCHAR) END AS stop_id,
    CASE WHEN (event_id + j) % 11 = 0 THEN NULL
         ELSE CAST(j + 1 AS VARCHAR) END AS stop_sequence,
    CASE WHEN (event_id + j) % 3 = 0 THEN NULL
         ELSE es + j*60 END AS arrival__time,
    CASE WHEN (event_id + j) % 4 = 0 THEN NULL
         ELSE es + j*60 + 45 END AS departure__time,
    CASE WHEN j % 2 = 0 THEN (event_id % 13) - 6 ELSE NULL END AS arrival__delay,
    CASE WHEN j % 3 = 0 THEN (event_id % 11) - 5 ELSE NULL END AS departure__delay,
    CASE WHEN j % 4 = 0 THEN 30 ELSE NULL END AS arrival__uncertainty,
    CASE WHEN j % 5 = 0 THEN 60 ELSE NULL END AS departure__uncertainty,
    'SCHEDULED' AS stu_schedule_relationship
  FROM (SELECT *, unnest(range(0, event_id % 3 + 1)) AS j FROM ev)),
m_stops AS (
  SELECT 'S' || CAST(i AS VARCHAR) AS stop_id,
         'Stop ' || CAST(i AS VARCHAR) AS stop_name,
         CASE WHEN i % 4 = 0 THEN NULL
              ELSE 'P' || CAST(i // 2 AS VARCHAR) END AS parent_station,
         40.0e0 + i * 0.01e0 AS stop_lat,
         -74.0e0 + i * 0.01e0 AS stop_lon
  FROM range(0, 20) t(i)),
m_routes AS (
  SELECT 'R' || CAST(i AS VARCHAR) AS route_id,
         'R' || CAST(i AS VARCHAR) AS route_short_name,
         'Route ' || CAST(i AS VARCHAR) AS route_long_name,
         'Desc ' || CAST(i AS VARCHAR) AS route_desc,
         CAST(1 AS BIGINT) AS route_type, 'FF0000' AS route_color, 'FFFFFF' AS route_text_color,
         'MTA' AS agency_id
  FROM range(0, 8) t(i)),
m_trips AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN CAST(event_id * 100 AS VARCHAR) || '_X'
              ELSE 'T' || CAST(event_id AS VARCHAR) END AS trip_id,
         'R' || CAST(user_id % 8 AS VARCHAR) AS route_id,
         'SVC' || CAST(user_id % 3 AS VARCHAR) AS service_id,
         'H' || CAST(user_id % 5 AS VARCHAR) AS trip_headsign,
         user_id % 2 AS direction_id
  FROM ev WHERE event_id % 3 <> 2 AND event_id % 19 <> 0),
m_stop_times AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN CAST(event_id * 100 AS VARCHAR) || '_X'
              ELSE 'T' || CAST(event_id AS VARCHAR) END AS trip_id,
         'S' || CAST((user_id + j*3) % 20 AS VARCHAR) AS stop_id,
         CAST(j + 1 AS VARCHAR) AS stop_sequence,
         printf('%02d:%02d:00', 20 + user_id % 8, (event_id % 12) * 5 + j*7) AS arrival_time,
         printf('%02d:%02d:30', 20 + user_id % 8, (event_id % 12) * 5 + j*7) AS departure_time
  FROM (SELECT *, unnest(range(0, 3)) AS j FROM ev
        WHERE event_id % 3 <> 2 AND event_id % 19 <> 0)),
m_calendar AS (
  SELECT 'SVC' || CAST(i AS VARCHAR) AS service_id,
         DATE '2023-12-01' AS start_date, DATE '2024-12-31' AS end_date,
         CASE WHEN i <> 2 THEN 1 ELSE 0 END AS monday,
         CASE WHEN i <> 2 THEN 1 ELSE 0 END AS tuesday,
         CASE WHEN i <> 2 THEN 1 ELSE 0 END AS wednesday,
         CASE WHEN i <> 2 THEN 1 ELSE 0 END AS thursday,
         CASE WHEN i <> 2 THEN 1 ELSE 0 END AS friday,
         CASE WHEN i <> 1 THEN 1 ELSE 0 END AS saturday,
         CASE WHEN i <> 1 THEN 1 ELSE 0 END AS sunday
  FROM range(0, 3) t(i)),
m_alerts AS (
  SELECT 'al' || CAST(event_id AS VARCHAR) AS alert_id,
         'load' || CAST(event_id % 4 AS VARCHAR) AS _dlt_load_id,
         CASE WHEN event_id % 5 = 0 THEN 'other' ELSE 'alerts' END AS feed,
         'ent' || CAST(event_id AS VARCHAR) AS entity_id,
         CAST(es + 60 AS VARCHAR) AS as_of
  FROM ev WHERE event_type = 'error'),
m_header AS (
  SELECT 'al' || CAST(event_id AS VARCHAR) AS alert_id,
         'hdr' || CAST(event_id AS VARCHAR) || '_' || CAST(j AS VARCHAR) AS text
  FROM (SELECT *, unnest(range(0, 2)) AS j FROM ev WHERE event_type = 'error')),
m_desc AS (
  SELECT 'al' || CAST(event_id AS VARCHAR) AS alert_id,
         'desc' || CAST(event_id AS VARCHAR) AS text
  FROM ev WHERE event_type = 'error' AND event_id % 2 = 0),
m_period AS (
  SELECT 'al' || CAST(event_id AS VARCHAR) AS alert_id,
         CASE WHEN (event_id + j) % 6 = 0 THEN NULL
              ELSE es - 3600 + j*100 END AS start,
         CASE WHEN (event_id + j) % 7 = 0 THEN NULL
              ELSE es + 3600 + j*100 END AS "end"
  FROM (SELECT *, unnest(range(0, event_id % 2 + 1)) AS j FROM ev
        WHERE event_type = 'error')),
m_informed AS (
  SELECT 'al' || CAST(event_id AS VARCHAR) AS alert_id,
         'MTA' AS agency_id,
         CASE WHEN (user_id + j) % 9 = 0 THEN NULL
              ELSE 'R' || CAST((user_id + j) % 8 AS VARCHAR) END AS route_id,
         'S' || CAST((user_id + j) % 20 AS VARCHAR) AS stop_id,
         'T' || CAST(event_id AS VARCHAR) AS trip__trip_id,
         CASE WHEN j % 2 = 0 THEN 'R' || CAST((user_id + j + 1) % 8 AS VARCHAR)
              ELSE NULL END AS trip__route_id,
         j % 2 AS trip__direction_id
  FROM (SELECT *, unnest(range(0, event_id % 3 + 1)) AS j FROM ev
        WHERE event_type = 'error')),
m_fts AS (
  SELECT
    tu.tu_id, stu.stu_id, tu.as_of, tu.feed,
    tu.rt_trip_id, tu.route_id, tu.direction_id, tu.service_date,
    tu.trip_schedule_relationship, st.trip_headsign,
    stu.stop_id, stu.stop_sequence,
    TRY_CAST(stu.stop_sequence AS BIGINT) AS stop_sequence_int,
    s.stop_name, s.parent_station, s.stop_lat, s.stop_lon,
    make_timestamp(TRY_CAST(tu.tu_timestamp AS BIGINT)*1000000) AS feed_ts_utc,
    CASE WHEN stu.arrival__time IS NOT NULL
         THEN make_timestamp(stu.arrival__time*1000000) END AS arrival_ts_utc,
    CASE WHEN stu.departure__time IS NOT NULL
         THEN make_timestamp(stu.departure__time*1000000) END AS departure_ts_utc,
    stu.arrival__delay, stu.departure__delay,
    stu.arrival__uncertainty, stu.departure__uncertainty,
    stu.stu_schedule_relationship,
    coalesce(tu.route_id, 'UNK') || '|' || coalesce(st.trip_headsign, 'UNK')
      AS route_headsign_key,
    nullif(regexp_extract(tu.rt_trip_id, '^-?\d{1,8}'), '')
      AS rt_origin_code_hundredths,
    coalesce(tu.service_date, 'UNK') || '|' || coalesce(tu.route_id, 'UNK')
      || '|' || coalesce(st.trip_headsign, 'UNK') || '|'
      || coalesce(nullif(regexp_extract(tu.rt_trip_id, '^-?\d{1,8}'), ''),
                  tu.rt_trip_id, 'UNK') AS trip_uid_text,
    sha256(trip_uid_text) AS trip_uid,
    (arrival_ts_utc IS NOT NULL) AS has_arrival_ts,
    (departure_ts_utc IS NOT NULL) AS has_departure_ts,
    coalesce(arrival_ts_utc, departure_ts_utc) AS event_ts_utc,
    CASE WHEN arrival_ts_utc IS NOT NULL THEN 'arrival'
         WHEN departure_ts_utc IS NOT NULL THEN 'departure' END
      AS event_kind_primary,
    event_ts_utc - INTERVAL 5 HOUR AS event_dt_local,
    CAST(event_ts_utc - INTERVAL 5 HOUR AS DATE) AS service_day_local
  FROM m_tu tu
  JOIN m_stu stu ON stu.stu_tu_id = tu.tu_id
  LEFT JOIN m_stops s ON s.stop_id = stu.stop_id
  LEFT JOIN m_trips st ON st.trip_id = tu.rt_trip_id),
ft_ranked AS (
  SELECT *,
    coalesce(arrival_ts_utc, departure_ts_utc) AS evt,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      (CASE WHEN stop_sequence_int IS NULL THEN 1 ELSE 0 END) ASC,
      stop_sequence_int ASC NULLS FIRST, event_ts_utc ASC NULLS FIRST,
      stu_id ASC) AS rn_first_stop,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      (CASE WHEN stop_sequence_int IS NULL THEN 0 ELSE 1 END) DESC,
      stop_sequence_int DESC NULLS LAST, event_ts_utc DESC NULLS LAST,
      stu_id DESC) AS rn_last_stop,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      stop_sequence_int ASC NULLS FIRST, stu_id ASC) AS rn_first_evt,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      stop_sequence_int DESC NULLS LAST, stu_id DESC) AS rn_last_evt
  FROM m_fts),
ft_agg AS (
  SELECT trip_uid,
    min(trip_uid_text) AS trip_uid_text,
    min(rt_trip_id) AS rt_trip_id,
    min(route_id) AS route_id,
    min(direction_id) AS direction_id,
    min(trip_headsign) AS trip_headsign,
    min(service_date) AS service_date,
    min(rt_origin_code_hundredths) AS rt_origin_code_hundredths,
    min(feed_ts_utc) AS first_feed_ts_utc,
    max(feed_ts_utc) AS last_feed_ts_utc,
    min(as_of) AS first_ingest_ts,
    max(as_of) AS last_ingest_ts,
    min(stop_sequence_int) AS first_stop_sequence,
    max(stop_sequence_int) AS last_stop_sequence,
    min(trip_schedule_relationship) AS schedule_relationship
  FROM ft_ranked GROUP BY trip_uid),
m_ft AS (
  SELECT a.*,
    f1.stop_id AS first_stop_id, f2.stop_id AS last_stop_id,
    f3.evt AS first_event_ts_utc, f4.evt AS last_event_ts_utc,
    date_diff('second', f3.evt, f4.evt) AS trip_duration_s,
    fs.stop_name AS first_stop_name, fs.parent_station AS first_parent_station,
    fs.stop_lat AS first_stop_lat, fs.stop_lon AS first_stop_lon,
    ls.stop_name AS last_stop_name, ls.parent_station AS last_parent_station,
    ls.stop_lat AS last_stop_lat, ls.stop_lon AS last_stop_lon
  FROM ft_agg a
  JOIN (SELECT trip_uid, stop_id FROM ft_ranked WHERE rn_first_stop = 1) f1 USING (trip_uid)
  JOIN (SELECT trip_uid, stop_id FROM ft_ranked WHERE rn_last_stop = 1) f2 USING (trip_uid)
  JOIN (SELECT trip_uid, evt FROM ft_ranked WHERE rn_first_evt = 1) f3 USING (trip_uid)
  JOIN (SELECT trip_uid, evt FROM ft_ranked WHERE rn_last_evt = 1) f4 USING (trip_uid)
  LEFT JOIN m_stops fs ON fs.stop_id = f1.stop_id
  LEFT JOIN m_stops ls ON ls.stop_id = f2.stop_id),
m_fd AS (
  SELECT * FROM m_fts
  WHERE feed = 'main'
    AND (arrival__delay IS NOT NULL OR departure__delay IS NOT NULL)),
m_fa AS (
  SELECT b.feed, b.entity_id, b.as_of, b.alert_id,
    h.header_text, d.description_text,
    ap.first_start_ts_utc, ap.last_end_ts_utc,
    i.route_id, r.route_short_name, r.route_long_name, r.route_type,
    r.route_color, r.route_text_color, r.route_desc,
    r.agency_id AS agency_id,
    s.stop_name, s.parent_station, s.stop_lat, s.stop_lon
  FROM (SELECT * FROM m_alerts WHERE feed = 'alerts') b
  LEFT JOIN (SELECT alert_id, min(text) AS header_text
             FROM m_header GROUP BY 1) h ON h.alert_id = b.alert_id
  LEFT JOIN (SELECT alert_id, min(text) AS description_text
             FROM m_desc GROUP BY 1) d ON d.alert_id = b.alert_id
  LEFT JOIN (SELECT alert_id,
               min(CASE WHEN start IS NOT NULL
                   THEN make_timestamp(start*1000000) END) AS first_start_ts_utc,
               max(CASE WHEN "end" IS NOT NULL
                   THEN make_timestamp("end"*1000000) END) AS last_end_ts_utc
             FROM m_period GROUP BY 1) ap ON ap.alert_id = b.alert_id
  LEFT JOIN (SELECT alert_id,
               min(coalesce(trip__route_id, route_id)) AS route_id,
               min(trip__trip_id) AS rt_trip_id,
               min(stop_id) AS stop_id,
               min(agency_id) AS agency_id
             FROM m_informed GROUP BY 1) i ON i.alert_id = b.alert_id
  LEFT JOIN m_stops s ON s.stop_id = i.stop_id
  LEFT JOIN m_routes r ON r.route_id = i.route_id)
""".trim

  /** Scheduled-terminal-departures chain for service day 2024-01-15
    * (a Monday), local window 06:00–23:00, EST offset. Appended after
    * PRELUDE by the metric oracles that need the schedule. */
  val SCHED_CTES: String = """
cal AS (
  SELECT service_id FROM m_calendar
  WHERE start_date <= DATE '2024-01-15' AND end_date >= DATE '2024-01-15'
    AND ((dayofweek(DATE '2024-01-15') + 1 = 1 AND sunday = 1) OR
         (dayofweek(DATE '2024-01-15') + 1 = 2 AND monday = 1) OR
         (dayofweek(DATE '2024-01-15') + 1 = 3 AND tuesday = 1) OR
         (dayofweek(DATE '2024-01-15') + 1 = 4 AND wednesday = 1) OR
         (dayofweek(DATE '2024-01-15') + 1 = 5 AND thursday = 1) OR
         (dayofweek(DATE '2024-01-15') + 1 = 6 AND friday = 1) OR
         (dayofweek(DATE '2024-01-15') + 1 = 7 AND saturday = 1))),
trips_active AS (
  SELECT t.trip_id, t.route_id, t.direction_id
  FROM m_trips t JOIN cal USING (service_id)),
first_stop AS (
  SELECT trip_id, min(TRY_CAST(stop_sequence AS BIGINT)) AS min_seq
  FROM m_stop_times GROUP BY trip_id),
sched AS (
  SELECT ta.route_id, ta.direction_id, ta.trip_id,
    make_timestamp((epoch_us(TIMESTAMP '2024-01-15 00:00:00')//1000000
      + TRY_CAST(string_split(st.departure_time, ':')[1] AS BIGINT)*3600
      + TRY_CAST(string_split(st.departure_time, ':')[2] AS BIGINT)*60
      + TRY_CAST(string_split(st.departure_time, ':')[3] AS BIGINT))*1000000)
      AS sched_departure_ts
  FROM trips_active ta
  JOIN first_stop fs ON fs.trip_id = ta.trip_id
  JOIN m_stop_times st
    ON st.trip_id = ta.trip_id AND st.stop_sequence = CAST(fs.min_seq AS VARCHAR)),
window_local AS (
  SELECT route_id, direction_id, trip_id, sched_departure_ts
  FROM sched
  WHERE strftime(sched_departure_ts - INTERVAL 5 HOUR, '%H:%M:%S')
        BETWEEN '06:00:00' AND '23:00:00')
""".trim

  def withPrelude(body: String): String =
    s"WITH\n$PRELUDE,\n$body"

  def withSched(body: String): String =
    s"WITH\n$PRELUDE,\n$SCHED_CTES,\n$body"
}
