package graft.models

import graft.functions.BqCompat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 12 documented metric queries
  * (/root/reference/docs/metrics_guide.md) as parameterized
  * DataFrame functions over the model views. DECLARE'd script
  * variables become function parameters (SURVEY §2.7 F15).
  *
  * Determinism refinements vs the reference (documented per site):
  * nondeterministic tie-breaks get a trailing unique key; exact
  * `percentile` replaces APPROX_QUANTILES (SURVEY A9 — swap to
  * percentile_approx at 100 TB for the same API shape).
  */
object MtaMetrics {

  private def localTod(ts: Column, tz: String): Column =
    date_format(from_utc_timestamp(ts, tz), "HH:mm:ss")

  /** M1 — trips observed per minute (metrics_guide.md:24-35). */
  def tripsPerMinute(fts: DataFrame, startTs: String, endTs: String): DataFrame =
    fts.filter(col("feed_ts_utc").between(lit(startTs).cast(TimestampType),
                                          lit(endTs).cast(TimestampType)))
      .groupBy(col("route_id"), col("direction_id"),
               date_trunc("minute", col("feed_ts_utc")).as("ts_minute"))
      .agg(countDistinct(col("trip_uid")).as("trips_observed"))
      .orderBy(col("ts_minute"), col("route_id"), col("direction_id"))

  /** M2 — trips observed per aligned 5-minute bucket
    * (metrics_guide.md:39-51). */
  def tripsPer5Min(fts: DataFrame, startTs: String, endTs: String): DataFrame =
    fts.filter(col("feed_ts_utc").between(lit(startTs).cast(TimestampType),
                                          lit(endTs).cast(TimestampType)))
      .groupBy(col("route_id"), col("direction_id"),
        timestamp_seconds((unix_timestamp(col("feed_ts_utc")) / 300L)
          .cast(LongType) * 300L).as("ts_5min"))
      .agg(countDistinct(col("trip_uid")).as("trips_observed"))
      .orderBy(col("ts_5min"), col("route_id"), col("direction_id"))

  /** Scheduled terminal departures for a service day+window — the
    * `cal`→`trips_active`→`first_stop`→`sched`→`window_local` chain of
    * the Service-Delivered metric (metrics_guide.md:55-105). */
  def scheduledWindow(calendar: DataFrame, trips: DataFrame,
                      stopTimes: DataFrame, serviceDay: String, tz: String,
                      startLocal: String, endLocal: String): DataFrame = {
    val day = lit(serviceDay).cast(DateType)
    val dow = dayofweek(day) // 1=Sunday, both engines' convention via +1 shim
    val cal = calendar
      .filter(col("start_date") <= day && col("end_date") >= day)
      .filter(
        (dow === 1 && col("sunday") === 1) || (dow === 2 && col("monday") === 1) ||
        (dow === 3 && col("tuesday") === 1) || (dow === 4 && col("wednesday") === 1) ||
        (dow === 5 && col("thursday") === 1) || (dow === 6 && col("friday") === 1) ||
        (dow === 7 && col("saturday") === 1))
      .select(col("service_id"))
    val tripsActive = trips.join(cal, Seq("service_id"))
      .select(col("trip_id"), col("route_id"), col("direction_id"))
    val firstStop = stopTimes.groupBy(col("trip_id").as("fs_trip_id"))
      .agg(min(safeCastLong(col("stop_sequence"))).as("min_seq"))
    val sched = tripsActive
      .join(firstStop, col("fs_trip_id") === col("trip_id"))
      .join(stopTimes.select(col("trip_id").as("st_trip_id"),
              col("stop_sequence"), col("departure_time")),
        col("st_trip_id") === col("trip_id") &&
          col("stop_sequence") === col("min_seq").cast(StringType))
      .select(col("route_id"), col("direction_id"), col("trip_id"),
        gtfsTimeToTs(day.cast(TimestampType), col("departure_time"))
          .as("sched_departure_ts"))
    sched.filter(localTod(col("sched_departure_ts"), tz)
      .between(startLocal, endLocal))
  }

  /** First realtime event per (route, dir, trip) — argmin by stop
    * sequence (metrics_guide.md:107-126). evtExpr: departure-first for
    * terminal metrics. Tie-break refinement: (event_ts, stu_id). */
  private def firstEvent(fts: DataFrame, evtExpr: Column,
                         requireNonNull: Boolean): DataFrame = {
    val base0 = fts.withColumn("evt", evtExpr)
    val base = if (requireNonNull) base0.filter(col("evt").isNotNull) else base0
    base.groupBy(col("route_id"), col("direction_id"), col("trip_uid"))
      .agg(min_by(col("evt"), struct(col("stop_sequence_int"),
        col("event_ts_utc"), col("stu_id"))).as("first_evt"))
  }

  /** M3 — Service Delivered (metrics_guide.md:55-137).
    *
    * The reference joins scheduled×actual on (route, direction) alone —
    * a quadratic per-group fan-out whose only purpose is feeding two
    * COUNT DISTINCTs, which are fan-out-invariant. Each side is
    * pre-aggregated to its distinct count per group instead; the result
    * is identical and the join moves |groups| rows, not |wl|·|fe|.
    * (67 s → ~1 s at sf0.1; at 100 TB the fan-out form is unrunnable.) */
  def serviceDelivered(fts: DataFrame, calendar: DataFrame, trips: DataFrame,
                       stopTimes: DataFrame, serviceDay: String, tz: String,
                       startLocal: String, endLocal: String): DataFrame = {
    val windowLocal = scheduledWindow(calendar, trips, stopTimes,
      serviceDay, tz, startLocal, endLocal)
    val actual = firstEvent(fts,
        coalesce(col("departure_ts_utc"), col("arrival_ts_utc")),
        requireNonNull = true)
      .filter(localTod(col("first_evt"), tz).between(startLocal, endLocal))
      .select(col("route_id").as("a_route_id"),
              col("direction_id").as("a_direction_id"), col("trip_uid"))
    val wlAgg = windowLocal.groupBy(col("route_id"), col("direction_id"))
      .agg(countDistinct(col("trip_id")).as("scheduled_trips"))
    val aAgg = actual.groupBy(col("a_route_id"), col("a_direction_id"))
      .agg(countDistinct(col("trip_uid")).as("delivered_nn"))
    wlAgg
      .join(aAgg, col("a_route_id") === col("route_id") &&
        col("a_direction_id") === col("direction_id"), "left")
      .select(col("route_id"), col("direction_id"), col("scheduled_trips"),
        coalesce(col("delivered_nn"), lit(0L)).as("delivered_trips"),
        safeDivide(coalesce(col("delivered_nn"), lit(0L)),
          col("scheduled_trips")).as("service_delivered"))
      .orderBy(col("route_id"), col("direction_id"))
  }

  /** M4 — Terminal OTP vs scheduled departure (metrics_guide.md:141-165;
    * the reference's UNNEST([]) placeholder window is realized with the
    * real scheduledWindow chain). */
  def terminalOtp(fts: DataFrame, calendar: DataFrame, trips: DataFrame,
                  stopTimes: DataFrame, serviceDay: String, tz: String,
                  startLocal: String, endLocal: String): DataFrame = {
    // both sides feed two consumers below (count + banded join) —
    // materialize once instead of recomputing the rollup per branch
    val wl = graft.Engine.materialize(
      scheduledWindow(calendar, trips, stopTimes,
        serviceDay, tz, startLocal, endLocal),
      key = "route_id", name = "m4_wl")
    val fe = graft.Engine.materialize(
      firstEvent(fts,
          coalesce(col("departure_ts_utc"), col("arrival_ts_utc")),
          requireNonNull = false)
        .select(col("route_id").as("f_route_id"),
                col("direction_id").as("f_direction_id"),
                col("first_evt").as("actual_departure_ts")),
      key = "f_route_id", name = "m4_fe")
    // The reference's LEFT JOIN on (route, direction) alone makes
    // |wl|·|fe| pairs per group and averages an indicator over them.
    // Decompose: otp = 100 · matched_pairs / total_pairs, where
    // total_pairs = n_wl · n_fe (n_wl when the fe group is empty —
    // LEFT JOIN null row), and matched_pairs is counted with a banded
    // range join: the indicator is true iff evt−sched ∈ [−59, 359] s
    // (width 419 s), so bucketing sched on a 420 s grid and probing
    // evt's bucket ±1 finds every match with bounded candidates.
    // Identical arithmetic (100·(long/long) in doubles), linear plan.
    val wlAgg = wl.groupBy(col("route_id"), col("direction_id"))
      .agg(count(lit(1)).as("n_wl"))
    val feAgg = fe.groupBy(col("f_route_id"), col("f_direction_id"))
      .agg(count(lit(1)).as("n_fe"))
    val B = 420L
    val wlT = wl.filter(col("sched_departure_ts").isNotNull)
      .select(col("route_id").as("w_route_id"),
        col("direction_id").as("w_direction_id"),
        col("sched_departure_ts"),
        floor(unix_timestamp(col("sched_departure_ts")) / B).as("bkt"))
    val feT = fe.filter(col("actual_departure_ts").isNotNull)
      .withColumn("b0", floor(unix_timestamp(col("actual_departure_ts")) / B))
      .select(col("f_route_id"), col("f_direction_id"),
        col("actual_departure_ts"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bkt"))
    val matched = feT.join(wlT,
        col("w_route_id") === col("f_route_id") &&
          col("w_direction_id") === col("f_direction_id") &&
          wlT("bkt") === feT("bkt"))
      .filter(timestampDiffMinutes(col("actual_departure_ts"),
        col("sched_departure_ts")).between(0, 5))
      .groupBy(col("w_route_id").as("m_route_id"),
        col("w_direction_id").as("m_direction_id"))
      .agg(count(lit(1)).as("n_matched"))
    wlAgg
      .join(feAgg, col("f_route_id") === col("route_id") &&
        col("f_direction_id") === col("direction_id"), "left")
      .join(matched, col("m_route_id") === col("route_id") &&
        col("m_direction_id") === col("direction_id"), "left")
      .select(col("route_id"), col("direction_id"),
        (lit(100) * (coalesce(col("n_matched"), lit(0L)).cast(DoubleType) /
          (col("n_wl") * greatest(coalesce(col("n_fe"), lit(0L)), lit(1L)))
            .cast(DoubleType))).as("otp_pct"))
      .orderBy(col("route_id"), col("direction_id"))
  }

  /** M5 — headways at a screenline stop (metrics_guide.md:169-200).
    * Tie-break refinement: trip_uid appended to both orderings. */
  def headwaysAtStop(fts: DataFrame, stopId: String, serviceDay: String,
                     tz: String): DataFrame = {
    val seen = fts
      .filter(col("stop_id") === stopId &&
        to_date(from_utc_timestamp(col("event_ts_utc"), tz)) ===
          lit(serviceDay).cast(DateType))
      .select(date_trunc("second", col("event_ts_utc")).as("pass_ts"),
        col("route_id"), col("direction_id"), col("trip_uid"), col("stu_id"))
    val firstPass = seen
      .withColumn("rn1", row_number().over(
        Window.partitionBy(col("trip_uid"))
          .orderBy(col("pass_ts"), col("stu_id"))))
      .filter(col("rn1") === 1).drop("rn1", "stu_id")
    val ordered = firstPass.withColumn("rn", row_number().over(
      Window.orderBy(col("pass_ts"), col("trip_uid"))))
    ordered
      .withColumn("headway_s", unix_timestamp(col("pass_ts")) -
        unix_timestamp(lag(col("pass_ts"), 1).over(
          Window.partitionBy(col("route_id"), col("direction_id"))
            .orderBy(col("pass_ts"), col("trip_uid")))))
      .filter(col("rn") > 1)
      .select(col("route_id"), col("direction_id"), col("pass_ts"),
              col("trip_uid"), col("headway_s"))
      .orderBy(col("pass_ts"), col("trip_uid"))
  }

  /** M6 — dwell time per stop (metrics_guide.md:204-213). */
  def dwellTimes(fts: DataFrame): DataFrame =
    fts.filter(col("arrival_ts_utc").isNotNull && col("departure_ts_utc").isNotNull)
      .select(col("route_id"), col("direction_id"), col("stop_id"),
        col("trip_uid"), col("stu_id"),
        timestampDiffSeconds(col("departure_ts_utc"), col("arrival_ts_utc"))
          .as("dwell_s"))

  /** M7 — run time between stops A→B on the same trip
    * (metrics_guide.md:217-237). */
  def runTimeAB(fts: DataFrame, stopA: String, stopB: String): DataFrame = {
    val a = fts.filter(col("stop_id") === stopA)
      .select(col("trip_uid"),
        coalesce(col("departure_ts_utc"), col("arrival_ts_utc")).as("ts_a"),
        col("stu_id").as("stu_a"))
    val b = fts.filter(col("stop_id") === stopB)
      .select(col("trip_uid"),
        coalesce(col("arrival_ts_utc"), col("departure_ts_utc")).as("ts_b"),
        col("stu_id").as("stu_b"))
    a.join(b, Seq("trip_uid"))
      .filter(col("ts_b") >= col("ts_a"))
      .select(col("trip_uid"), col("stu_a"), col("stu_b"),
        timestampDiffSeconds(col("ts_b"), col("ts_a")).as("runtime_s"))
  }

  /** M8 — excess delay vs schedule at a stop, p50/p90
    * (metrics_guide.md:241-275). Exact percentile replaces
    * APPROX_QUANTILES (determinism; SURVEY A9). */
  def excessDelay(fts: DataFrame, trips: DataFrame, stopTimes: DataFrame,
                  serviceDay: String, stopRef: String): DataFrame = {
    val day = lit(serviceDay).cast(DateType)
    val sched = stopTimes.filter(col("stop_id") === stopRef)
      .join(trips.select(col("trip_id").as("t_trip_id"), col("route_id"),
        col("direction_id")), col("t_trip_id") === col("trip_id"))
      .select(col("route_id").as("s_route_id"),
        col("direction_id").as("s_direction_id"),
        gtfsTimeToTs(day.cast(TimestampType), col("departure_time"))
          .as("sched_departure_ts"))
    val actual = fts.filter(col("stop_id") === stopRef)
      .select(col("route_id"), col("direction_id"), col("stop_id"),
        coalesce(col("departure_ts_utc"), col("arrival_ts_utc")).as("actual_ts"))
    // The metric is an exact percentile over the actual×sched pair
    // deltas per (route, direction). Materializing the fan-out into
    // percentile's per-group buffer is the naive plan; instead both
    // sides deduplicate to (ts, count), the joined deltas fold into a
    // (delay, frequency) histogram with map-side combine, and the
    // exact weighted percentile runs over the tiny histogram —
    // identical multiset, so bit-identical interpolation.
    val aD = actual.groupBy(col("route_id"), col("direction_id"),
        col("stop_id"), col("actual_ts"))
      .agg(count(lit(1)).as("ca"))
    val sD = sched.groupBy(col("s_route_id"), col("s_direction_id"),
        col("sched_departure_ts"))
      .agg(count(lit(1)).as("cs"))
    aD.join(sD, col("s_route_id") === col("route_id") &&
        col("s_direction_id") === col("direction_id"))
      .withColumn("delay_s",
        timestampDiffSeconds(col("actual_ts"), col("sched_departure_ts")))
      .groupBy(col("route_id"), col("direction_id"), col("stop_id"),
        col("delay_s"))
      .agg(sum(col("ca") * col("cs")).as("freq"))
      .groupBy(col("route_id"), col("direction_id"), col("stop_id"))
      .agg(percentile(col("delay_s"), lit(0.5), col("freq")).as("p50_delay_s"),
           percentile(col("delay_s"), lit(0.9), col("freq")).as("p90_delay_s"))
      .orderBy(col("route_id"), col("direction_id"))
  }

  /** M9 — trip completeness (metrics_guide.md:279-293). */
  def tripCompleteness(fts: DataFrame): DataFrame = {
    val agg = fts.groupBy(col("trip_uid"))
      .agg(
        min(col("stop_sequence_int")).as("min_seq"),
        max(col("stop_sequence_int")).as("max_seq"),
        count_if(coalesce(col("arrival_ts_utc"), col("departure_ts_utc"))
          .isNotNull).as("stops_seen"))
    agg.agg(
      count(lit(1)).as("trips_total"),
      count_if(col("stops_seen") >= 2).as("trips_with_start_and_end"),
      safeDivide(count_if(col("stops_seen") >= 2), count(lit(1)))
        .as("completeness_rate"))
  }

  /** M10 — added / canceled trips share (metrics_guide.md:297-306). */
  def addedCanceledShare(factTrips: DataFrame): DataFrame =
    factTrips.groupBy(col("route_id"), col("direction_id"))
      .agg(
        (lit(100) * avg(when(col("schedule_relationship") === "ADDED", 1)
          .otherwise(0))).as("added_pct"),
        (lit(100) * avg(when(col("schedule_relationship") === "CANCELED", 1)
          .otherwise(0))).as("canceled_pct"))
      .orderBy(col("route_id"), col("direction_id"))

  /** M11 — feed latency: ingest vs feed timestamp
    * (metrics_guide.md:310-319). as_of is a dlt ingest marker string
    * (epoch seconds) → try_cast. */
  def feedLatency(factTrips: DataFrame): DataFrame =
    factTrips.groupBy(col("route_id"), col("direction_id"),
        date_trunc("minute", col("first_feed_ts_utc")).as("ts_minute"))
      .agg(avg(safeCastLong(col("first_ingest_ts")) -
        unix_timestamp(col("first_feed_ts_utc"))).as("avg_latency_s"))
      .orderBy(col("ts_minute"), col("route_id"), col("direction_id"))

  /** M12 — wait assessment at a stop: observed vs scheduled headway
    * (metrics_guide.md:323-376). */
  def waitAssessment(fts: DataFrame, trips: DataFrame, stopTimes: DataFrame,
                     stopRef: String, scheduleDay: String): DataFrame = {
    val obsW = Window.partitionBy(col("route_id"), col("direction_id"))
      .orderBy(col("pass_ts"), col("stu_id"))
    val obsHw = fts.filter(col("stop_id") === stopRef)
      .select(col("route_id"), col("direction_id"), col("stu_id"),
        date_trunc("second", col("event_ts_utc")).as("pass_ts"))
      .withColumn("headway_s", unix_timestamp(col("pass_ts")) -
        unix_timestamp(lag(col("pass_ts"), 1).over(obsW)))
    val schedW = Window.partitionBy(col("s_route_id"), col("s_direction_id"))
      .orderBy(col("sched_ts"), col("t_trip_id"))
    val schedHw = stopTimes.filter(col("stop_id") === stopRef)
      .join(trips.select(col("trip_id").as("t_trip_id"), col("route_id"),
        col("direction_id")), col("t_trip_id") === col("trip_id"))
      .select(col("route_id").as("s_route_id"),
        col("direction_id").as("s_direction_id"), col("t_trip_id"),
        gtfsTimeToTs(lit(scheduleDay).cast(TimestampType),
          col("departure_time")).as("sched_ts"))
      .withColumn("sched_headway_s", unix_timestamp(col("sched_ts")) -
        unix_timestamp(lag(col("sched_ts"), 1).over(schedW)))
    // avg(indicator) over the (obs × sched) pair fan-out decomposes to
    // matched / (n_obs · n_sched) per group. The schedule side is
    // schedule-sized, so it collapses to one sorted array per group;
    // each obs row counts its matches with a codegen'd array filter —
    // no pair shuffle, identical arithmetic.
    val obsF = obsHw.filter(col("headway_s").isNotNull)
    val schArr = schedHw.filter(col("sched_headway_s").isNotNull)
      .groupBy(col("s_route_id"), col("s_direction_id"))
      .agg(collect_list(col("sched_headway_s")).as("sh_arr"),
           count(lit(1)).as("n_s"))
    // schArr is one row per (route, direction) — planning-scale, but
    // the collect_list aggregate defeats the size estimate and the
    // planner picks a SortMergeJoin, shuffling + sorting the obs side
    // (r16 opt round: plan showed Exchange+Sort on obs). Broadcast
    // explicitly (guide §3.1: hint when the estimate is wrong).
    obsF
      .join(broadcast(schArr), col("s_route_id") === col("route_id") &&
        col("s_direction_id") === col("direction_id"))
      .withColumn("m", size(filter(col("sh_arr"),
        x => col("headway_s") <= lit(2) * x)))
      .groupBy(col("route_id"), col("direction_id"))
      .agg(sum(col("m")).as("matched"), count(lit(1)).as("n_o"),
           max(col("n_s")).as("n_s"))
      .select(col("route_id"), col("direction_id"),
        (lit(100) * (col("matched").cast(DoubleType) /
          (col("n_o") * col("n_s")).cast(DoubleType)))
          .as("wait_assessment_pct"))
      .orderBy(col("route_id"), col("direction_id"))
  }
}
