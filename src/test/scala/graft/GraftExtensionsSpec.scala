package graft

import org.apache.spark.sql.{GraftBridge, SparkSession}

/** GraftExtensions must wire the custom strategy, rule, and function
  * into a session built with withExtensions — no lazy fallback calls.
  * The spec builds a second session over the shared SparkContext
  * (clear default/active → getOrCreate attaches a fresh SessionState
  * with the extensions), then restores the suite session. */
class GraftExtensionsSpec extends SparkSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    spark.sparkContext // ensure the shared context exists first
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  test("the codec family is SQL-callable without manual registration") {
    withExtSession { s =>
      val r = s.sql(
        "SELECT CAST(gunzip(gzip_write(CAST('ab ab ab' AS BINARY))) " +
          "AS STRING) AS g, " +
          "CAST(bzip2_read(bzip2_write(CAST('cd cd cd' AS BINARY))) " +
          "AS STRING) AS b, " +
          "size(gzip_members(concat(gzip_write(CAST('x' AS BINARY)), " +
          "gzip_write(CAST('y' AS BINARY))))) AS m, " +
          "flac_decode(CAST('nope' AS BINARY))[0] AS f")
        .collect().head
      assert(r.getString(0) == "ab ab ab")
      assert(r.getString(1) == "cd cd cd")
      assert(r.getInt(2) == 2)
      assert(r.getLong(3) == 0L) // malformed -> ok=0 row
    }
  }

  test("long_dot is SQL-callable without manual registration") {
    withExtSession { s =>
      val d = s.sql("SELECT long_dot(array(1L, 2L), array(3L, 4L)) AS d")
        .collect().head.getLong(0)
      assert(d === 11L)
    }
  }

  test("hilbert_d is SQL-callable and matches the reference walk") {
    withExtSession { s =>
      // xy2d(8, 1, 2) = 13 per the canonical reference implementation
      val d = s.sql("SELECT hilbert_d(1L, 2L, 3) AS d")
        .collect().head.getLong(0)
      assert(d === 13L)
    }
  }

  test("ahash64 is SQL-callable without manual registration") {
    withExtSession { s =>
      val d = s.sql(
        "SELECT ahash64(unhex(sha2('doc0', 256))) AS h").collect().head
      assert(!d.isNullAt(0))
    }
  }

  test("hilbert_d accepts a bigint bits literal (shared builder parity)") {
    withExtSession { s =>
      // Both registration paths route through HilbertD.fromExprs, so
      // the extensions-injected function must accept 3L like the
      // temp-function path always did.
      val d = s.sql("SELECT hilbert_d(1L, 2L, 3L) AS d")
        .collect().head.getLong(0)
      assert(d === 13L)
    }
  }

  test("topk_min is SQL-callable without manual registration") {
    withExtSession { s =>
      val rows = s.sql("""
        SELECT g, topk_min(struct(v, id), 2) AS tk FROM VALUES
          (1, 30L, 1L), (1, 10L, 2L), (1, 20L, 3L), (2, 5L, 4L)
          AS t(g, v, id)
        GROUP BY g ORDER BY g""").collect()
      val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(g1 == Seq((10L, 2L), (20L, 3L)))
      val g2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(g2 == Seq((5L, 4L)))
    }
  }

  test("AsOfJoin plans through the injected strategy (no fallback)") {
    withExtSession { s =>
      val s2 = s
      import s2.implicits._
      val l = Seq((1L, 10L, "p"), (2L, 20L, "q")).toDF("k", "t", "name")
      val r = Seq((1L, 5L, "c")).toDF("rk", "rt", "rname")
      def attr(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      val node = graft.plans.AsOfJoin(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        Seq(attr(l, "k")), Seq(attr(r, "rk")),
        attr(l, "t"), attr(r, "rt"))
      val out = GraftBridge.ofRows(s, node)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin "), s"strategy not injected:\n$plan")
      val rows = out.collect().map(x => x.getString(2) -> x.getString(5)).toMap
      assert(rows("p") === "c")   // match at-or-before
      assert(rows("q") === null)  // no right rows for key 2
    }
  }
}
