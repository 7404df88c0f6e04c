package graft

import org.apache.spark.sql.functions._

/** The switchover facade: views build, register under reference names,
  * and metrics run against them. */
class GraftFacadeSpec extends SparkSuite {
  import spark.implicits._

  test("facade builds the DAG and metrics run over it") {
    val mta = Graft.mtaFromTestdata(spark, sf())
    mta.register()
    assert(spark.table("fact_trips_stops").count() > 0)
    assert(spark.table("fact_alerts").count() > 0)
    val hw = Graft.metrics.headwaysAtStop(
      mta.factTripsStops, "S5", "2024-01-10", "America/New_York")
    assert(hw.columns.contains("headway_s"))
    val completeness = Graft.metrics.tripCompleteness(mta.factTripsStops)
      .collect().head
    assert(completeness.getLong(0) > 0)
  }
}
