package graft

/** Every registered query must run at sf0.001 (the driver's smoke
  * scale). Value-level correctness is the driver's DuckDB gate
  * (tools/verify_local.py); this spec guards against runtime
  * regressions in any registered operator. */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers every query (or is consciously omitted)") {
    // approx sketches can't hash-match a different engine by design
    val knownRowsOnly = Set("a9_approx")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      knownRowsOnly
    assert(missing.isEmpty,
      s"queries without oracle (rows-only check): $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf())
      assert(df.count() >= 0)
    }
  }
}
