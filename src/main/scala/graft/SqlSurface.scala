package graft

import graft.sources.Sources
import org.apache.spark.sql.SparkSession

/** SQL-first entry point: registers the source tables, the MTA model
  * DAG, and any subset of the extension-query catalog as temp views,
  * so a user whose whole workflow is `spark.sql` strings (the
  * reference's users write SQL — docs/metrics_guide.md queries)
  * reaches every operator without touching the Scala API.
  *
  * Query views are LAZY plans, not data — registration moves nothing
  * for pure-DataFrame operators. The exception is operators that pin
  * a hot intermediate through [[Engine.materialize]] (minhash
  * signatures, k-means codebooks, BPE fits): building their frame
  * runs the eager materialize step at registration time. That is why
  * [[register]] takes an explicit name list and [[registerAll]] is a
  * separate, documented-as-expensive call, rather than sources
  * defaulting to the full catalog.
  */
object SqlSurface {

  /** Register sources + model DAG + the named extension queries as
    * temp views (view name = query name, e.g. `dedup_minhash`).
    * Unknown names fail fast with the catalog's valid keys. */
  def register(spark: SparkSession, dir: String,
               queries: Seq[String]): Unit = {
    Sources.registerAll(spark, dir)
    Engine.registerMta(spark, dir)
    queries.foreach { n =>
      val q = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(
          s"SqlSurface: unknown query '$n' (valid: " +
            s"${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
      q(spark, dir).createOrReplaceTempView(n)
    }
  }

  /** Register the ENTIRE catalog (eager-materialize operators run
    * their builds now — minutes at large SF; prefer [[register]] with
    * the views a session actually needs). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, SparkEntry.queries.keys.toSeq.sorted)
}
