package graft

/** A SQL-first user must reach the extension families through
  * `spark.sql` alone — no Scala API in the query path. */
class SqlSurfaceSpec extends SparkSuite {

  test("three extension families run end-to-end via spark.sql only") {
    SqlSurface.register(spark, sf(), Seq(
      "dedup_minhash",    // dedup family (LSH + verify pipeline)
      "text_normalize",   // text-analysis family
      "a_cms"))           // mergeable-sketch family
    // dedup: near-dup pairs are queryable and joinable back to the
    // documents source registered beside them
    val pairs = spark.sql("""
      SELECT p.doc_a, p.doc_b, d.n_chars
      FROM dedup_minhash p JOIN documents d ON d.doc_id = p.doc_a
      ORDER BY p.doc_a, p.doc_b""").collect()
    assert(pairs.length > 0)
    // text: normalization flags compose with ordinary SQL aggregation
    val changed = spark.sql("""
      SELECT count(*) AS n FROM text_normalize WHERE len_norm <= len_raw
      """).head().getLong(0)
    assert(changed ===
      spark.sql("SELECT count(*) FROM text_normalize").head().getLong(0))
    // sketch: the CMS one-sided bound holds when probed from SQL
    val bad = spark.sql(
      "SELECT count(*) AS n FROM a_cms WHERE est_n < exact_n")
      .head().getLong(0)
    assert(bad === 0L)
    // the model DAG rides along: metric-style SQL over a registered
    // model view
    val trips = spark.sql("""
      SELECT count(DISTINCT trip_uid) FROM fact_trips_stops
      WHERE feed = 'main'""").head().getLong(0)
    assert(trips > 0L)
  }

  test("unknown query names fail fast with the valid catalog") {
    val e = intercept[IllegalArgumentException] {
      SqlSurface.register(spark, sf(), Seq("no_such_query"))
    }
    assert(e.getMessage.contains("no_such_query"))
  }
}
