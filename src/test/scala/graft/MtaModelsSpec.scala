package graft

import graft.models.MtaModels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-authored fixtures per FIXTURES.md §A covering the reference's
  * edge cases: regexp-NULL trip ids, NULL route/start_date ('UNK'
  * branches), NULL stop_sequence (null-last argmin), arrival-only /
  * departure-only / neither events, feed filtering, any_value→min
  * child collapse. */
class MtaModelsSpec extends SparkSuite {
  import spark.implicits._

  private def tu: DataFrame = Seq(
    // (_dlt_id, feed, ts, trip_id, route, dir, start_date, schedrel)
    ("tu1", "main", "1000", "123456_X", "R1", 0L, "20240115", "SCHEDULED"),
    ("tu2", "main", "2000", "TNODIGIT", "R1", 0L, "20240115", "ADDED"),
    ("tu3", "other", "3000", null, null, 1L, null, "CANCELED"),
    ("tu4", "main", "4000", "123456_X", "R1", 0L, "20240115", "SCHEDULED")
  ).toDF("_dlt_id", "feed", "trip_update__timestamp",
      "trip_update__trip__trip_id", "trip_update__trip__route_id",
      "trip_update__trip__direction_id", "trip_update__trip__start_date",
      "trip_update__trip__schedule_relationship")
    .withColumn("as_of", concat(lit("a"), col("trip_update__timestamp")))
    .withColumn("_dlt_load_id", lit("L1"))
    .withColumn("entity_id", col("_dlt_id"))

  private def stu: DataFrame = Seq(
    // (_dlt_id, parent, stop, seq, arr, dep, arrDelay, depDelay)
    ("s1", "tu1", "A", "2", Some(1010L), Some(1020L), Some(30L), None: Option[Long]),
    ("s2", "tu1", "B", "1", None: Option[Long], Some(1005L), None: Option[Long], Some(-10L)),
    ("s3", "tu1", "C", null, Some(1030L), None: Option[Long], None: Option[Long], None: Option[Long]),
    ("s4", "tu2", "A", "1", None: Option[Long], None: Option[Long], None: Option[Long], None: Option[Long]),
    ("s5", "tu3", "Z", "1", Some(3100L), None: Option[Long], Some(5L), None: Option[Long]),
    ("s6", "tu4", "B", "3", Some(4010L), None: Option[Long], None: Option[Long], None: Option[Long])
  ).toDF("_dlt_id", "_dlt_parent_id", "stop_id", "stop_sequence",
      "arrival__time", "departure__time", "arrival__delay", "departure__delay")
    .withColumn("arrival__uncertainty", lit(null).cast("long"))
    .withColumn("departure__uncertainty", lit(null).cast("long"))
    .withColumn("schedule_relationship", lit("SCHEDULED"))

  private def stops: DataFrame = Seq(
    ("A", "Alpha", "P1", 40.0, -74.0),
    ("B", "Beta", null, 40.1, -74.1)
  ).toDF("stop_id", "stop_name", "parent_station", "stop_lat", "stop_lon")

  private def trips: DataFrame = Seq(
    ("123456_X", "R1", "SVC1", "Uptown", 0L),
    ("TNODIGIT", "R1", "SVC1", "Downtown", 0L)
  ).toDF("trip_id", "route_id", "service_id", "trip_headsign", "direction_id")

  private lazy val fts = MtaModels.factTripsStops(tu, stu, stops, trips)

  test("fact_trips_stops: row per stop_time_update, enrichment joins") {
    assert(fts.count() === 6)
    val s1 = fts.filter($"stu_id" === "s1").collect().head
    assert(s1.getAs[String]("stop_name") === "Alpha")
    assert(s1.getAs[String]("trip_headsign") === "Uptown")
    // unknown stop C → left-join miss keeps the row
    val s3 = fts.filter($"stu_id" === "s3").collect().head
    assert(s3.getAs[String]("stop_name") === null)
  }

  test("trip_uid: origin-code extraction and UNK fallbacks") {
    val uidText = fts.select($"stu_id", $"trip_uid_text", $"trip_uid")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // digit-prefixed id → origin code extracted
    assert(uidText("s1")._1 === "20240115|R1|Uptown|123456")
    // no digit prefix → falls through to full trip_id (needs NULL regexp)
    assert(uidText("s4")._1 === "20240115|R1|Downtown|TNODIGIT")
    // all-null identity → UNK everywhere
    assert(uidText("s5")._1 === "UNK|UNK|UNK|UNK")
    // sha256 is stable hex
    assert(uidText("s1")._2.matches("[0-9a-f]{64}"))
    // same identity on different snapshots → same uid (tu1 vs tu4)
    assert(uidText("s1")._2 === uidText("s6")._2)
  }

  test("fact_trips_stops: event derivation flags arrival-first") {
    val m = fts.select($"stu_id", $"event_kind_primary", $"has_arrival_ts",
        $"has_departure_ts", unix_timestamp($"event_ts_utc").as("es"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("s1").getString(1) === "arrival")
    assert(m("s2").getString(1) === "departure")
    assert(m("s4").getString(1) === null)
    assert(m("s1").getLong(4) === 1010L)
  }

  test("fact_trips: one row per trip_uid; null-last argmin terminals") {
    val ft = MtaModels.factTrips(fts, stops)
    val uids = ft.select($"trip_uid").collect().map(_.getString(0))
    assert(uids.length === uids.distinct.length)
    assert(ft.count() === 3) // (R1 Uptown), (R1 Downtown), (UNK)
    val up = ft.filter($"trip_headsign" === "Uptown").collect().head
    // null-seq row s3 must NOT win first/last despite NULL sorting first
    assert(up.getAs[String]("first_stop_id") === "B")  // seq 1
    assert(up.getAs[String]("last_stop_id") === "B")   // seq 3 (s6, stop B)
    assert(up.getAs[Long]("first_stop_sequence") === 1L)
    assert(up.getAs[Long]("last_stop_sequence") === 3L)
    // feed window across the tu1/tu4 snapshots
    assert(up.getAs[java.sql.Timestamp]("first_feed_ts_utc").getTime === 1000000L)
    assert(up.getAs[String]("first_stop_name") === "Beta")
  }

  test("fact_delays: subset with feed='main' and a delay present") {
    val fd = MtaModels.factDelays(fts)
    val ids = fd.select($"stu_id").collect().map(_.getString(0)).toSet
    assert(ids === Set("s1", "s2")) // s5 is feed='other'; s3/s4/s6 no delay
  }

  test("fact_alerts: children pre-aggregate to exactly one row per alert") {
    val alerts = Seq(("al1", "alerts", "e1", "a1", "L1"),
      ("al2", "alerts", "e2", "a2", "L1"),
      ("al3", "other", "e3", "a3", "L1"))
      .toDF("_dlt_id", "feed", "entity_id", "as_of", "_dlt_load_id")
    val header = Seq(("al1", "hdr-b"), ("al1", "hdr-a"), ("al2", "only"))
      .toDF("_dlt_parent_id", "text").withColumn("language", lit("en"))
    val desc = Seq(("al1", "d1")).toDF("_dlt_parent_id", "text")
      .withColumn("language", lit("en"))
    val period = Seq(("al1", Some(100L), Some(200L)),
      ("al1", None: Option[Long], Some(300L)))
      .toDF("_dlt_parent_id", "start", "end")
    val informed = Seq(("al1", null, "R9", "A"), ("al1", "R2", null, "B"))
      .toDF("_dlt_parent_id", "trip__route_id", "route_id", "stop_id")
      .withColumn("agency_id", lit("MTA"))
      .withColumn("trip__trip_id", lit("T1"))
      .withColumn("trip__direction_id", lit(0L))
    val routes = Seq(("R2", "Two", "Route Two", "d", 1L, "c", "t", "MTA-R"))
      .toDF("route_id", "route_short_name", "route_long_name", "route_desc",
        "route_type", "route_color", "route_text_color", "agency_id")
    val fa = MtaModels.factAlerts(alerts, header, desc, period, informed,
      routes, stops)
    assert(fa.count() === 2) // feed filter drops al3
    val a1 = fa.filter($"alert_id" === "al1").collect().head
    assert(a1.getAs[String]("header_text") === "hdr-a") // min() collapse
    assert(a1.getAs[java.sql.Timestamp]("first_start_ts_utc").getTime === 100000L)
    // informed: min(coalesce(trip__route_id, route_id)) over {R9, R2} = R2
    assert(a1.getAs[String]("route_id") === "R2")
    assert(a1.getAs[String]("route_short_name") === "Two")
  }
}
