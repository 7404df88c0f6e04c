package graft

import org.apache.spark.sql.SparkSession

/** Bulk plan capture for the optimization round's evidence trail:
  * write each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` in ONE JVM (graft.Explain costs an
  * sbt+Spark launch per query). Usage:
  *   sbt "runMain graft.PlanDump <outDir> <tag> <q1,q2,...>"
  * Plans are built (not executed); eager `Engine.materialize*` inside
  * a query's fn still runs, exactly as in Bench construction.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.withScratch(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $name ($tag)")
    }
    spark.stop()
  }
}
