package graft

import graft.functions.BqCompat._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic-gap properties (SURVEY §7 hard-part #1): the BigQuery
  * behaviors our compat layer must reproduce exactly. */
class BqCompatSpec extends SparkSuite {
  import spark.implicits._

  test("regexpExtractOrNull: no-match yields NULL, not ''") {
    val df = Seq("123abc", "abc", "-0045x", "").toDF("s")
      .select(regexpExtractOrNull($"s", "^-?\\d{1,8}").as("m"))
    assert(df.collect().map(_.get(0)) === Seq("123", null, "-0045", null))
  }

  test("trip_uid coalesce chain depends on regexp NULL (not '')") {
    // BigQuery: COALESCE(REGEXP_EXTRACT(trip_id, ...), trip_id, 'UNK')
    // falls through to trip_id when there is NO leading digit code —
    // with Spark's '' it would silently produce '' instead.
    val df = Seq(("T77"), ("88_X")).toDF("trip_id")
      .select(coalesce(regexpExtractOrNull($"trip_id", "^-?\\d{1,8}"),
        $"trip_id", lit("UNK")).as("k"))
    assert(df.collect().map(_.getString(0)) === Seq("T77", "88"))
  }

  test("safeCastLong: malformed input gives NULL in any ANSI mode") {
    val df = Seq("42", "x42", "", "9999999999").toDF("s")
      .select(safeCastLong($"s").as("v"))
    assert(df.collect().map(_.get(0)) === Seq(42L, null, null, 9999999999L))
  }

  test("timestampDiff: BigQuery arg order (later, earlier); minutes truncate toward zero") {
    val df = Seq((1000L, 910L), (1000L, 1090L)).toDF("a", "b")
      .select(
        timestampDiffSeconds(timestamp_seconds($"a"), timestamp_seconds($"b")).as("s"),
        timestampDiffMinutes(timestamp_seconds($"a"), timestamp_seconds($"b")).as("m"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(90L, -90L))
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, -1L)) // trunc toward 0
  }

  test("gtfsTimeToTs handles hours >= 24 (25:10:00 = 01:10 next day)") {
    val df = Seq(("2024-01-15", "25:10:00"), ("2024-01-15", "06:00:30"))
      .toDF("day", "hms")
      .select(date_format(
        gtfsTimeToTs($"day".cast("timestamp"), $"hms"),
        "yyyy-MM-dd HH:mm:ss").as("ts"))
    assert(df.collect().map(_.getString(0)) ===
      Seq("2024-01-16 01:10:00", "2024-01-15 06:00:30"))
  }

  test("argMinBy/argMaxBy: null-last composite keys (BigQuery explicit CASE)") {
    // rows: (stop, seq) with a null seq — null-last means 'a' wins argmin
    // even though NULL would sort first under Spark's default asc.
    val df = Seq(("z", Some(5L)), ("a", Some(1L)), ("n", None))
      .toDF("stop", "seq")
    val r = df.agg(
      argMinBy($"stop", $"seq").as("first"),
      argMaxBy($"stop", $"seq").as("last")).collect().head
    assert(r === Row("a", "z")) // null-last in both directions
  }

  test("argMinBy: all-null keys still pick a row (null group fallback)") {
    val df = Seq(("x", None: Option[Long]), ("y", None)).toDF("stop", "seq")
    val r = df.agg(argMinBy($"stop", $"seq").as("first")).collect().head
    assert(Set("x", "y").contains(r.getString(0)))
  }

  test("sumMoney is exact on cents (order-insensitive)") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val df = vals.toDF("v").agg(sumMoney($"v").as("s"))
    assert(df.collect().head.getDouble(0) === 5005.0)
  }

  test("chi2x100Sql: exact inside the envelope, raises outside it") {
    // hand-checked 2x2: n0=100,c0=30 vs n1=100,c1=50 →
    // chi2 = 200*(30*50-50*70)^2/(100*100*80*120) = 8.333… → x100 = 833
    val ok = Seq((100L, 30L, 100L, 50L)).toDF("n0", "c0", "n1", "c1")
      .select(expr(chi2x100Sql()).as("chi2"))
    assert(ok.collect().head.getLong(0) === 833L)
    // zero margin (nobody converted): det = 0 → clean 0, no division error
    val zero = Seq((100L, 0L, 100L, 0L)).toDF("n0", "c0", "n1", "c1")
      .select(expr(chi2x100Sql()).as("chi2"))
    assert(zero.collect().head.getLong(0) === 0L)
    // largest in-envelope N with a det near the bound still computes
    // (N = 55000, det bound ≈ 303693000/236 ≈ 1.29e6; here det =
    // 27500*(c0-c1) = 1.1e6 — numerator 6.66e18 < 2^63, no wrap)
    val edge = Seq((27500L, 14000L, 27500L, 13960L))
      .toDF("n0", "c0", "n1", "c1")
      .select(expr(chi2x100Sql()).as("chi2"))
    assert(edge.collect().head.getLong(0) > 0L)
    // out-of-envelope counts RAISE (never wrap): N > 55000
    val big = Seq((60000L, 30000L, 60000L, 20000L))
      .toDF("n0", "c0", "n1", "c1")
      .select(expr(chi2x100Sql()).as("chi2"))
    val e = intercept[Exception](big.collect())
    assert(e.getMessage.contains("chi2x100"))
  }
}
