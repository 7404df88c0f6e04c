package graft

import graft.models.{MtaModels, MtaSynthetic}
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's equivalent of dbt's lifecycle (SURVEY §3):
  * ref/source resolution becomes a registry of named lazy views;
  * `dbt run` becomes registerMta (views move no data — computation at
  * query time, exactly like warehouse views); `materialized='table'`
  * becomes a partitioned Parquet write (S4).
  */
object Engine {

  /** Register the driver testdata tables as temp views ("sources"). */
  def registerSources(spark: SparkSession, dir: String): Unit =
    Sources.registerAll(spark, dir)

  /** Build the MTA model DAG as temp views, in topological order:
    * sources → fact_trips_stops → {fact_trips, fact_delays};
    * sources → fact_alerts (SURVEY §3 E1). Views are lazy — this
    * moves no data. */
  def registerMta(spark: SparkSession, dir: String): Unit = {
    val e = MtaSynthetic.ev(spark, dir)
    val stops = MtaSynthetic.stops(spark)
    val fts = MtaModels.factTripsStops(
      MtaSynthetic.tripUpdates(e), MtaSynthetic.stopTimeUpdates(e),
      stops, MtaSynthetic.trips(e))
    fts.createOrReplaceTempView("fact_trips_stops")
    MtaModels.factTrips(fts, stops).createOrReplaceTempView("fact_trips")
    MtaModels.factDelays(fts).createOrReplaceTempView("fact_delays")
    MtaModels.factAlerts(
      MtaSynthetic.alerts(e), MtaSynthetic.headerTx(e), MtaSynthetic.descTx(e),
      MtaSynthetic.activePeriod(e), MtaSynthetic.informedEntity(e),
      MtaSynthetic.routes(spark), stops)
      .createOrReplaceTempView("fact_alerts")
  }

  /** S4 table sink: materialize a model partitioned by local service
    * day — the reference's production guidance
    * (docs/metrics_guide.md:385). Partition pruning then makes
    * day-ranged dashboards scan only their days at any scale. */
  def materializeByServiceDay(df: DataFrame, outPath: String): Unit =
    df.write.mode("overwrite").partitionBy("service_day_local").parquet(outPath)
}
