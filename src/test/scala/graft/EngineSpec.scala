package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt-lifecycle equivalents: view DAG registration (S2/S3) and
  * partitioned table materialization with partition pruning (S4). */
class EngineSpec extends SparkSuite {
  import spark.implicits._

  test("registerMta builds the view DAG; views are queryable by name") {
    Engine.registerSources(spark, sf())
    Engine.registerMta(spark, sf())
    assert(spark.table("fact_trips_stops").count() > 0)
    assert(spark.table("fact_trips").count() > 0)
    assert(spark.table("fact_delays").count() > 0)
    assert(spark.table("fact_alerts").count() > 0)
    // ref-composition: metrics can run over the registered views
    val n = spark.sql(
      """SELECT count(DISTINCT trip_uid) FROM fact_trips_stops
         WHERE feed = 'main'""").collect().head.getLong(0)
    assert(n > 0)
  }

  test("materializeByServiceDay writes day-partitioned parquet; pruning applies") {
    Engine.registerMta(spark, sf())
    val out = Files.createTempDirectory("graft_mat").toString
    Engine.materializeByServiceDay(
      spark.table("fact_trips_stops").filter($"service_day_local".isNotNull), out)
    val back = spark.read.parquet(out)
    assert(back.count() ===
      spark.table("fact_trips_stops").filter($"service_day_local".isNotNull).count())
    // partition pruning: a day filter must turn into PartitionFilters
    val plan = back.filter($"service_day_local" === "2024-01-10")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("service_day_local"))
  }
}
