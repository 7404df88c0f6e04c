package graft.models

import graft.functions.BqCompat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's four model views re-expressed as pure
  * DataFrame → DataFrame functions (the dbt ref/source DAG becomes
  * plain function composition + temp views; SURVEY §1.3, §3).
  *
  * Faithfulness notes:
  *  - `any_value` (nondeterministic in BigQuery) is realized as `min`,
  *    a legal deterministic refinement (SURVEY §2.4 A4) — required for
  *    oracle hash-matching.
  *  - BigQuery ARRAY_AGG(... ORDER BY ... LIMIT 1)[OFFSET(0)] argmins
  *    are realized as min_by/max_by over composite ordering structs:
  *    O(n) single pass with map-side partial aggregation instead of a
  *    per-group sort (SURVEY §2.4 A5). BigQuery default null ordering
  *    (NULLS FIRST for ASC, NULLS LAST for DESC) is exactly Spark's
  *    struct-field ordering, and the reference's explicit null-last
  *    CASE keys are reproduced verbatim. A trailing stu_id key is
  *    added as a determinism refinement of BigQuery's arbitrary
  *    tie-break.
  *  - REGEXP_EXTRACT no-match must yield NULL (BigQuery), not ''
  *    (Spark) — BqCompat.regexpExtractOrNull. Silently changes every
  *    trip_uid otherwise (SURVEY §7 hard-part #1).
  *
  * Scale posture (100 TB): tu⋈stu is a key-partitioned shuffle join on
  * the dlt parent id (high cardinality — no skew); stops/trips/routes
  * are bounded dims → broadcast; the fact_trips rollup is a single
  * hash aggregation on trip_uid with partial aggregation map-side.
  * Materialize with .write.partitionBy("service_day_local") (S4).
  */
object MtaModels {

  /** fact_trips_stops — stop-level fact view.
    * Reference: /root/reference/models/fact_trips_stops.sql (137 lines).
    */
  def factTripsStops(tripUpdates: DataFrame, stopTimeUpdates: DataFrame,
                     stops: DataFrame, trips: DataFrame): DataFrame = {
    val tu = tripUpdates.select(
      col("_dlt_id").as("tu_id"),
      col("as_of"), col("feed"),
      col("trip_update__timestamp"),
      col("trip_update__trip__trip_id").as("rt_trip_id"),
      col("trip_update__trip__route_id").as("route_id"),
      col("trip_update__trip__direction_id").as("direction_id"),
      col("trip_update__trip__start_date").as("service_date"),
      col("trip_update__trip__schedule_relationship").as("trip_schedule_relationship"))

    val stu = stopTimeUpdates.select(
      col("_dlt_id").as("stu_id"),
      col("_dlt_parent_id").as("stu_tu_id"),
      col("stop_id"), col("stop_sequence"),
      col("arrival__time"), col("departure__time"),
      col("arrival__delay"), col("departure__delay"),
      col("arrival__uncertainty"), col("departure__uncertainty"),
      col("schedule_relationship").as("stu_schedule_relationship"))

    val dimStops = stops.select(
      col("stop_id").as("dim_stop_id"), col("stop_name"),
      col("parent_station"), col("stop_lat"), col("stop_lon"))

    val staticTrips = trips.select(
      col("trip_id").as("static_trip_id"),
      col("route_id").as("static_route_id"),
      col("service_id"),
      col("trip_headsign"),
      col("direction_id").as("static_direction_id"))

    val originCode = regexpExtractOrNull(col("rt_trip_id"), "^-?\\d{1,8}")
    val tripUidText = concat(
      coalesce(col("service_date"), lit("UNK")), lit("|"),
      coalesce(col("route_id"), lit("UNK")), lit("|"),
      coalesce(col("trip_headsign"), lit("UNK")), lit("|"),
      coalesce(originCode, col("rt_trip_id"), lit("UNK")))

    val arrivalTs = when(col("arrival__time").isNotNull,
      timestamp_seconds(safeCastLong(col("arrival__time").cast(StringType))))
    val departureTs = when(col("departure__time").isNotNull,
      timestamp_seconds(safeCastLong(col("departure__time").cast(StringType))))
    val eventTs = coalesce(arrivalTs, departureTs)

    tu.join(stu, stu("stu_tu_id") === tu("tu_id"), "inner")
      // bounded dims → broadcast at any scale
      .join(broadcast(dimStops), col("dim_stop_id") === stu("stop_id"), "left")
      .join(broadcast(staticTrips), col("static_trip_id") === col("rt_trip_id"), "left")
      .select(
        // Provenance
        col("tu_id"), col("stu_id"), col("as_of"), col("feed"),
        // Trip identity and attributes
        col("rt_trip_id"), col("route_id"), col("direction_id"),
        col("service_date"), col("trip_schedule_relationship"),
        col("trip_headsign"),
        // Stop attributes
        col("stop_id"), col("stop_sequence"),
        safeCastLong(col("stop_sequence")).as("stop_sequence_int"),
        col("stop_name"), col("parent_station"), col("stop_lat"), col("stop_lon"),
        // Feed and event timestamps
        timestamp_seconds(safeCastLong(col("trip_update__timestamp")))
          .as("feed_ts_utc"),
        arrivalTs.as("arrival_ts_utc"),
        departureTs.as("departure_ts_utc"),
        // Delays as provided
        col("arrival__delay"), col("departure__delay"),
        col("arrival__uncertainty"), col("departure__uncertainty"),
        col("stu_schedule_relationship"),
        // Handy keys
        concat(coalesce(col("route_id"), lit("UNK")), lit("|"),
               coalesce(col("trip_headsign"), lit("UNK"))).as("route_headsign_key"),
        originCode.as("rt_origin_code_hundredths"),
        tripUidText.as("trip_uid_text"),
        sha256Hex(tripUidText).as("trip_uid"),
        // Derived flags / event columns
        arrivalTs.isNotNull.as("has_arrival_ts"),
        departureTs.isNotNull.as("has_departure_ts"),
        eventTs.as("event_ts_utc"),
        when(arrivalTs.isNotNull, "arrival")
          .when(departureTs.isNotNull, "departure").as("event_kind_primary"),
        from_utc_timestamp(eventTs, "America/New_York").as("event_dt_local"),
        to_date(from_utc_timestamp(eventTs, "America/New_York"))
          .as("service_day_local"))
  }

  /** fact_trips — one row per trip_uid rollup.
    * Reference: /root/reference/models/fact_trips.sql (90 lines). */
  def factTrips(factTripsStops: DataFrame, stops: DataFrame): DataFrame = {
    val nullLast: Column = when(col("stop_sequence_int").isNull, 1).otherwise(0)
    val notNullFlag: Column = when(col("stop_sequence_int").isNull, 0).otherwise(1)
    val evt = coalesce(col("arrival_ts_utc"), col("departure_ts_utc"))

    val agg = factTripsStops
      .groupBy(col("trip_uid"))
      .agg(
        min(col("trip_uid_text")).as("trip_uid_text"),
        min(col("rt_trip_id")).as("rt_trip_id"),
        min(col("route_id")).as("route_id"),
        min(col("direction_id")).as("direction_id"),
        min(col("trip_headsign")).as("trip_headsign"),
        min(col("service_date")).as("service_date"),
        min(col("rt_origin_code_hundredths")).as("rt_origin_code_hundredths"),
        // Feed window
        min(col("feed_ts_utc")).as("first_feed_ts_utc"),
        max(col("feed_ts_utc")).as("last_feed_ts_utc"),
        min(col("as_of")).as("first_ingest_ts"),
        max(col("as_of")).as("last_ingest_ts"),
        // Terminal stops: explicit null-last flag (reference CASE), then
        // seq/event_ts with BigQuery default null order, then stu_id
        // (determinism refinement of BigQuery's arbitrary tie-break).
        min_by(col("stop_id"), struct(nullLast, col("stop_sequence_int"),
          col("event_ts_utc"), col("stu_id"))).as("first_stop_id"),
        max_by(col("stop_id"), struct(notNullFlag, col("stop_sequence_int"),
          col("event_ts_utc"), col("stu_id"))).as("last_stop_id"),
        min(col("stop_sequence_int")).as("first_stop_sequence"),
        max(col("stop_sequence_int")).as("last_stop_sequence"),
        // First/last event timestamps by stop order (reference orders by
        // stop_sequence_int alone: ASC=nulls-first, DESC=nulls-last —
        // Spark struct ordering reproduces both).
        min_by(evt, struct(col("stop_sequence_int"), col("stu_id")))
          .as("first_event_ts_utc"),
        max_by(evt, struct(col("stop_sequence_int"), col("stu_id")))
          .as("last_event_ts_utc"),
        min(col("trip_schedule_relationship")).as("schedule_relationship"))
      .withColumn("trip_duration_s",
        timestampDiffSeconds(col("last_event_ts_utc"), col("first_event_ts_utc")))

    val fs = stops.select(col("stop_id").as("fs_stop_id"),
      col("stop_name").as("first_stop_name"),
      col("parent_station").as("first_parent_station"),
      col("stop_lat").as("first_stop_lat"),
      col("stop_lon").as("first_stop_lon"))
    val ls = stops.select(col("stop_id").as("ls_stop_id"),
      col("stop_name").as("last_stop_name"),
      col("parent_station").as("last_parent_station"),
      col("stop_lat").as("last_stop_lat"),
      col("stop_lon").as("last_stop_lon"))

    agg
      .join(broadcast(fs), col("fs_stop_id") === col("first_stop_id"), "left")
      .join(broadcast(ls), col("ls_stop_id") === col("last_stop_id"), "left")
      .drop("fs_stop_id", "ls_stop_id")
  }

  /** fact_delays — filtered projection of the stop-level view.
    * Reference: /root/reference/models/fact_delays.sql (54 lines). */
  def factDelays(factTripsStops: DataFrame): DataFrame =
    factTripsStops
      .filter(col("feed") === "main" &&
        (col("arrival__delay").isNotNull || col("departure__delay").isNotNull))
      .select(
        col("trip_uid"), col("trip_uid_text"), col("tu_id"), col("stu_id"),
        col("as_of"), col("feed"),
        col("rt_trip_id"), col("route_id"), col("direction_id"),
        col("service_date"), col("trip_schedule_relationship"), col("trip_headsign"),
        col("stop_id"), col("stop_name"), col("parent_station"),
        col("stop_lat"), col("stop_lon"), col("stop_sequence"), col("stop_sequence_int"),
        col("feed_ts_utc"), col("arrival_ts_utc"), col("departure_ts_utc"),
        col("event_ts_utc"), col("event_kind_primary"), col("event_dt_local"),
        col("service_day_local"),
        col("arrival__delay"), col("departure__delay"),
        col("arrival__uncertainty"), col("departure__uncertainty"),
        col("stu_schedule_relationship"),
        col("route_headsign_key"), col("rt_origin_code_hundredths"),
        col("has_arrival_ts"), col("has_departure_ts"))

  /** fact_alerts — alert fact with pre-aggregated 1:1 children.
    * Reference: /root/reference/models/fact_alerts.sql (95 lines). */
  def factAlerts(alerts: DataFrame, headerTx: DataFrame, descTx: DataFrame,
                 activePeriod: DataFrame, informedEntity: DataFrame,
                 routes: DataFrame, stops: DataFrame): DataFrame = {
    val base = alerts.filter(col("feed") === "alerts").select(
      col("feed"), col("entity_id"), col("as_of"),
      col("_dlt_id").as("alert_id"), col("_dlt_load_id"))

    val header = headerTx.groupBy(col("_dlt_parent_id").as("h_alert_id"))
      .agg(min(col("text")).as("header_text"))
    val desc = descTx.groupBy(col("_dlt_parent_id").as("d_alert_id"))
      .agg(min(col("text")).as("description_text"))
    val period = activePeriod.groupBy(col("_dlt_parent_id").as("ap_alert_id"))
      .agg(
        min(when(col("start").isNotNull,
          timestamp_seconds(safeCastLong(col("start").cast(StringType)))))
          .as("first_start_ts_utc"),
        max(when(col("end").isNotNull,
          timestamp_seconds(safeCastLong(col("end").cast(StringType)))))
          .as("last_end_ts_utc"))
    val informed = informedEntity.groupBy(col("_dlt_parent_id").as("i_alert_id"))
      .agg(
        min(coalesce(col("trip__route_id"), col("route_id"))).as("route_id"),
        min(col("trip__trip_id")).as("rt_trip_id"),
        min(col("stop_id")).as("stop_id"),
        min(col("agency_id")).as("agency_id"))

    val dimStops = stops.select(col("stop_id").as("s_stop_id"),
      col("stop_name"), col("parent_station"), col("stop_lat"), col("stop_lon"))
    val dimRoutes = routes.select(col("route_id").as("r_route_id"),
      col("route_short_name"), col("route_long_name"), col("route_type"),
      col("route_color"), col("route_text_color"), col("route_desc"),
      col("agency_id").as("route_agency_id"))

    base
      .join(header, col("h_alert_id") === col("alert_id"), "left")
      .join(desc, col("d_alert_id") === col("alert_id"), "left")
      .join(period, col("ap_alert_id") === col("alert_id"), "left")
      .join(informed, col("i_alert_id") === col("alert_id"), "left")
      .join(broadcast(dimStops), col("s_stop_id") === informed("stop_id"), "left")
      .join(broadcast(dimRoutes), col("r_route_id") === informed("route_id"), "left")
      .select(
        col("feed"), col("entity_id"), col("as_of"), col("alert_id"),
        col("header_text"), col("description_text"),
        col("first_start_ts_utc"), col("last_end_ts_utc"),
        col("route_id"), col("route_short_name"), col("route_long_name"),
        col("route_type"), col("route_color"), col("route_text_color"),
        col("route_desc"), col("route_agency_id").as("agency_id"),
        col("stop_name"), col("parent_station"), col("stop_lat"), col("stop_lon"))
  }
}
