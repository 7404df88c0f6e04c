package graft.models

import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic MTA-shaped tables derived from the driver testdata
  * `events` table (plus `range`s for static dims), so the reference's
  * model views (fact_trips_stops / fact_trips / fact_delays /
  * fact_alerts — /root/reference/models/) and the 12 metric
  * queries can run against driver-verifiable input: every expression
  * here has an exact DuckDB twin in MtaOracleSql.PRELUDE.
  *
  * Determinism rules: all time values flow as epoch-second longs
  * (`es`); dlt ids are printable strings; doubles only from
  * int-derived arithmetic (identical IEEE results in both engines).
  *
  * Edge cases deliberately covered (FIXTURES.md §A):
  *  - trip ids with leading digit codes, without, and NULL
  *    (regexp-NULL path of trip_uid, fact_trips_stops.sql:93-104);
  *  - NULL route_id / start_date ('UNK' coalesce branches);
  *  - NULL stop_sequence (null-last argmin, fact_trips.sql:44-47);
  *  - arrival-only / departure-only / both / neither stop events;
  *  - feed values 'main' vs 'other' (fact_delays.sql:54);
  *  - unknown stop ids (left-join miss);
  *  - GTFS times ≥ 24h in stop_times;
  *  - alert children with multiple translations / periods / entities.
  */
object MtaSynthetic {

  /** Base: events projected to (event_id, user_id, event_type, es). */
  def ev(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("es"))

  // ── realtime: trip_updates ────────────────────────────────────────
  def tripUpdates(ev: DataFrame): DataFrame = {
    val tripId = when(col("event_id") % 3 === 0,
        concat((col("event_id") * 100).cast(StringType), lit("_X")))
      .when(col("event_id") % 3 === 1,
        concat(lit("T"), col("event_id").cast(StringType)))
      .otherwise(lit(null).cast(StringType))
    ev.select(
      concat(lit("tu"), col("event_id").cast(StringType)).as("_dlt_id"),
      concat(lit("load"), (col("event_id") % 4).cast(StringType)).as("_dlt_load_id"),
      when(col("user_id") % 5 === 0, "other").otherwise("main").as("feed"),
      concat(lit("e"), col("event_id").cast(StringType)).as("entity_id"),
      (col("es") + 30).cast(StringType).as("as_of"),
      col("es").cast(StringType).as("trip_update__timestamp"),
      tripId.as("trip_update__trip__trip_id"),
      when(col("user_id") % 7 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("R"), (col("user_id") % 8).cast(StringType)))
        .as("trip_update__trip__route_id"),
      (col("user_id") % 2).as("trip_update__trip__direction_id"),
      when(col("event_id") % 13 === 0, lit(null).cast(StringType))
        .otherwise(date_format(timestamp_seconds(col("es")), "yyyyMMdd"))
        .as("trip_update__trip__start_date"),
      when(col("event_type") === "error", "CANCELED")
        .when(col("event_type") === "signup", "ADDED")
        .otherwise("SCHEDULED").as("trip_update__trip__schedule_relationship"))
  }

  // ── realtime: stop_time_update children (fan-out 1–3 per tu) ─────
  def stopTimeUpdates(ev: DataFrame): DataFrame = {
    val j = col("j")
    ev.withColumn("j", explode(sequence(lit(0L), col("event_id") % 3)))
      .select(
        concat(lit("stu"), col("event_id").cast(StringType), lit("_"),
               j.cast(StringType)).as("_dlt_id"),
        concat(lit("tu"), col("event_id").cast(StringType)).as("_dlt_parent_id"),
        when((col("event_id") + j) % 17 === 0, "SX")
          .otherwise(concat(lit("S"), ((col("user_id") + j * 3) % 20).cast(StringType)))
          .as("stop_id"),
        when((col("event_id") + j) % 11 === 0, lit(null).cast(StringType))
          .otherwise((j + 1).cast(StringType)).as("stop_sequence"),
        when((col("event_id") + j) % 3 === 0, lit(null).cast(LongType))
          .otherwise(col("es") + j * 60).as("arrival__time"),
        when((col("event_id") + j) % 4 === 0, lit(null).cast(LongType))
          .otherwise(col("es") + j * 60 + 45).as("departure__time"),
        when(j % 2 === 0, (col("event_id") % 13) - 6)
          .otherwise(lit(null).cast(LongType)).as("arrival__delay"),
        when(j % 3 === 0, (col("event_id") % 11) - 5)
          .otherwise(lit(null).cast(LongType)).as("departure__delay"),
        when(j % 4 === 0, lit(30L)).otherwise(lit(null).cast(LongType))
          .as("arrival__uncertainty"),
        when(j % 5 === 0, lit(60L)).otherwise(lit(null).cast(LongType))
          .as("departure__uncertainty"),
        lit("SCHEDULED").as("schedule_relationship"))
  }

  // ── static GTFS dims ──────────────────────────────────────────────
  def stops(spark: SparkSession): DataFrame =
    spark.range(0, 20).select(
      concat(lit("S"), col("id").cast(StringType)).as("stop_id"),
      concat(lit("Stop "), col("id").cast(StringType)).as("stop_name"),
      when(col("id") % 4 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("P"), (col("id") / 2).cast(LongType).cast(StringType)))
        .as("parent_station"),
      (lit(40.0) + col("id") * 0.01).as("stop_lat"),
      (lit(-74.0) + col("id") * 0.01).as("stop_lon"))

  def routes(spark: SparkSession): DataFrame =
    spark.range(0, 8).select(
      concat(lit("R"), col("id").cast(StringType)).as("route_id"),
      concat(lit("R"), col("id").cast(StringType)).as("route_short_name"),
      concat(lit("Route "), col("id").cast(StringType)).as("route_long_name"),
      concat(lit("Desc "), col("id").cast(StringType)).as("route_desc"),
      lit(1L).as("route_type"),
      lit("FF0000").as("route_color"),
      lit("FFFFFF").as("route_text_color"),
      lit("MTA").as("agency_id"))

  /** Static trips: one row per non-null synthetic rt trip id (so the
    * enrichment join hits whenever rt_trip_id is present, except the
    * %19 holdout exercising the join-miss path). */
  def trips(ev: DataFrame): DataFrame = {
    val tripId = when(col("event_id") % 3 === 0,
        concat((col("event_id") * 100).cast(StringType), lit("_X")))
      .when(col("event_id") % 3 === 1,
        concat(lit("T"), col("event_id").cast(StringType)))
      .otherwise(lit(null).cast(StringType))
    ev.filter(col("event_id") % 3 =!= 2 && col("event_id") % 19 =!= 0)
      .select(
        tripId.as("trip_id"),
        concat(lit("R"), (col("user_id") % 8).cast(StringType)).as("route_id"),
        concat(lit("SVC"), (col("user_id") % 3).cast(StringType)).as("service_id"),
        concat(lit("H"), (col("user_id") % 5).cast(StringType)).as("trip_headsign"),
        (col("user_id") % 2).as("direction_id"))
  }

  /** Schedule: 3 stop_times per static trip; HH may exceed 24. */
  def stopTimes(ev: DataFrame): DataFrame = {
    val j = col("j")
    val hour = lit(20) + (col("user_id") % 8) // 20..27 → covers ≥24h
    val minute = (col("event_id") % 12) * 5
    val depMin = minute + j * 7
    ev.filter(col("event_id") % 3 =!= 2 && col("event_id") % 19 =!= 0)
      .withColumn("j", explode(sequence(lit(0L), lit(2L))))
      .select(
        when(col("event_id") % 3 === 0,
            concat((col("event_id") * 100).cast(StringType), lit("_X")))
          .otherwise(concat(lit("T"), col("event_id").cast(StringType)))
          .as("trip_id"),
        concat(lit("S"), ((col("user_id") + j * 3) % 20).cast(StringType)).as("stop_id"),
        (j + 1).cast(StringType).as("stop_sequence"),
        format_string("%02d:%02d:00", hour, depMin).as("arrival_time"),
        format_string("%02d:%02d:30", hour, depMin).as("departure_time"))
  }

  def calendar(spark: SparkSession): DataFrame = {
    val i = col("id")
    def day(active: org.apache.spark.sql.Column) =
      when(active, 1L).otherwise(0L)
    spark.range(0, 3).select(
      concat(lit("SVC"), i.cast(StringType)).as("service_id"),
      lit("2023-12-01").cast(DateType).as("start_date"),
      lit("2024-12-31").cast(DateType).as("end_date"),
      day(i =!= 2).as("monday"), day(i =!= 2).as("tuesday"),
      day(i =!= 2).as("wednesday"), day(i =!= 2).as("thursday"),
      day(i =!= 2).as("friday"),
      day(i =!= 1).as("saturday"), day(i =!= 1).as("sunday"))
  }

  // ── realtime: alerts + children (from error events) ───────────────
  private def errs(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "error")

  def alerts(ev: DataFrame): DataFrame =
    errs(ev).select(
      concat(lit("al"), col("event_id").cast(StringType)).as("_dlt_id"),
      concat(lit("load"), (col("event_id") % 4).cast(StringType)).as("_dlt_load_id"),
      when(col("event_id") % 5 === 0, "other").otherwise("alerts").as("feed"),
      concat(lit("ent"), col("event_id").cast(StringType)).as("entity_id"),
      (col("es") + 60).cast(StringType).as("as_of"))

  def headerTx(ev: DataFrame): DataFrame =
    errs(ev).withColumn("j", explode(sequence(lit(0L), lit(1L))))
      .select(
        concat(lit("ht"), col("event_id").cast(StringType), lit("_"),
               col("j").cast(StringType)).as("_dlt_id"),
        concat(lit("al"), col("event_id").cast(StringType)).as("_dlt_parent_id"),
        concat(lit("hdr"), col("event_id").cast(StringType), lit("_"),
               col("j").cast(StringType)).as("text"),
        when(col("j") === 0, "en").otherwise("es").as("language"))

  def descTx(ev: DataFrame): DataFrame =
    errs(ev).filter(col("event_id") % 2 === 0)
      .select(
        concat(lit("dt"), col("event_id").cast(StringType)).as("_dlt_id"),
        concat(lit("al"), col("event_id").cast(StringType)).as("_dlt_parent_id"),
        concat(lit("desc"), col("event_id").cast(StringType)).as("text"),
        lit("en").as("language"))

  def activePeriod(ev: DataFrame): DataFrame = {
    val j = col("j")
    errs(ev).withColumn("j", explode(sequence(lit(0L), col("event_id") % 2)))
      .select(
        concat(lit("ap"), col("event_id").cast(StringType), lit("_"),
               j.cast(StringType)).as("_dlt_id"),
        concat(lit("al"), col("event_id").cast(StringType)).as("_dlt_parent_id"),
        when((col("event_id") + j) % 6 === 0, lit(null).cast(LongType))
          .otherwise(col("es") - 3600 + j * 100).as("start"),
        when((col("event_id") + j) % 7 === 0, lit(null).cast(LongType))
          .otherwise(col("es") + 3600 + j * 100).as("end"))
  }

  def informedEntity(ev: DataFrame): DataFrame = {
    val j = col("j")
    errs(ev).withColumn("j", explode(sequence(lit(0L), col("event_id") % 3)))
      .select(
        concat(lit("ie"), col("event_id").cast(StringType), lit("_"),
               j.cast(StringType)).as("_dlt_id"),
        concat(lit("al"), col("event_id").cast(StringType)).as("_dlt_parent_id"),
        lit("MTA").as("agency_id"),
        when((col("user_id") + j) % 9 === 0, lit(null).cast(StringType))
          .otherwise(concat(lit("R"), ((col("user_id") + j) % 8).cast(StringType)))
          .as("route_id"),
        concat(lit("S"), ((col("user_id") + j) % 20).cast(StringType)).as("stop_id"),
        concat(lit("T"), col("event_id").cast(StringType)).as("trip__trip_id"),
        when(j % 2 === 0, concat(lit("R"), ((col("user_id") + j + 1) % 8).cast(StringType)))
          .otherwise(lit(null).cast(StringType)).as("trip__route_id"),
        (j % 2).as("trip__direction_id"))
  }
}
