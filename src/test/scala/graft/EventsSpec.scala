package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** Fixture-level semantics of the public Events operators (the
  * registered queries hash-check them against DuckDB at corpus scale;
  * this pins the hand-computable laws). */
class EventsSpec extends SparkSuite {
  import spark.implicits._

  test("scd2 collapses runs, persists attrs through day gaps, versions from 1") {
    // user 1: day 0 ends on B (last write wins), day 1 stays B,
    // day 3 flips to A, day 5 A again (gap does NOT split a run —
    // snapshot state persists through missing days)
    val df = Seq(
      (1L, 10L, "A", 1L), (1L, 20L, "B", 2L),   // day 0
      (1L, 86400L + 5L, "B", 3L),               // day 1
      (1L, 3 * 86400L + 1L, "A", 4L),           // day 3
      (1L, 5 * 86400L + 9L, "A", 5L)            // day 5
    ).toDF("user_id", "sec", "event_type", "event_id")
    val out = Events.scd2(df, "user_id", col("sec"), "event_type", "event_id")
      .orderBy($"version")
      .select($"version", $"attr", $"valid_from_day", $"valid_to_day",
        $"n_days")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq((1L, "B", 0L, 1L, 2L), (2L, "A", 3L, 5L, 2L)))
  }

  test("scd2 intervals are disjoint and adjacent versions differ") {
    val df = graft.sources.Sources.table(spark, sf(), "events")
      .filter($"user_id" <= 50)
    val out = Events.scd2(df, "user_id", unix_timestamp($"ts"),
      "event_type", "event_id")
    val bad = out.as("a").join(out.as("b"),
      $"a.user_id" === $"b.user_id" &&
        $"a.version" + 1 === $"b.version" &&
        ($"a.attr" === $"b.attr" ||
          $"a.valid_to_day" >= $"b.valid_from_day"))
    assert(bad.count() === 0,
      "adjacent versions must change attr and not overlap")
  }

  test("attribution splits credit equally and drops untouched conversions") {
    val df = Seq(
      (1L, 10L, "click", 1L), (1L, 20L, "view", 2L),
      (1L, 25L, "purchase", 3L),          // 2 touches → 500000 each
      (2L, 999999L, "purchase", 4L)       // no touches in window → dropped
    ).toDF("user_id", "sec", "event_type", "event_id")
    val out = Events.attributionLinear(df, "user_id", col("sec"),
        isConversion = col("event_type") === "purchase",
        convId = "event_id",
        isTouch = col("event_type").isin("click", "view"),
        channel = col("event_type"), windowSec = 100L)
      .orderBy($"channel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("click", 1L, 500000L), ("view", 1L, 500000L)))
  }

  test("attribution conserves credit up to floor rounding") {
    val df = graft.sources.Sources.table(spark, sf(), "events")
    val out = Events.attributionLinear(df, "user_id",
      unix_timestamp($"ts"),
      isConversion = col("event_type") === "purchase",
      convId = "event_id",
      isTouch = col("event_type").isin("click", "view", "signup"),
      channel = col("event_type"), windowSec = 86400L)
    val total = out.agg(sum($"credit_ppm_total")).collect().head.getLong(0)
    // per credited purchase the floor div loses < n_touch ppm, and
    // every credited purchase contributes ≤ 1e6 — so total/1e6 rounds
    // to the number of credited purchases
    val purchases = df.filter($"event_type" === "purchase").count()
    assert(total <= purchases * 1000000L)
    assert(total > 0)
  }

  test("e_user_lifecycle: states partition actives; news sum to distinct users; first day all-new") {
    val out = SparkEntry.queries("e_user_lifecycle")(spark, sf()).cache()
    // the four states partition each day's actives
    val broken = out.filter(
      $"n_new" + $"n_retained" + $"n_returning" + $"n_resurrected" =!=
        $"n_active")
    assert(broken.count() === 0)
    // every user is new exactly once
    val ev = graft.sources.Sources.table(spark, sf(), "events")
    val users = ev.select($"user_id").distinct().count()
    val news = out.agg(sum($"n_new")).collect().head.getLong(0)
    assert(news === users)
    // the earliest day has no previous day to relate to
    val first = out.orderBy($"day").limit(1).collect().head
    assert(first.getAs[Long]("n_new") === first.getAs[Long]("n_active"))
    out.unpersist()
  }

  test("w_pattern_match regex: greedy spans, error splits, non-overlap") {
    // the exact expression the registered query evaluates, pinned on
    // hand-computable sequences (RE2/DuckDB agreement verified for
    // these same strings — greedy leftmost semantics match):
    //  - greedy [^e]* makes spans MAXIMAL: vcpvcp is ONE match of 6
    //  - an error hard-splits: vcpevcp is two vcp matches
    //  - intervening non-error chars are absorbed: vscp, vcvp match whole
    val rows = Seq("vcpvcp", "vcpevcp", "vecp", "vscp", "cp", "vcvp")
      .toDF("seq")
      .withColumn("ms", expr("regexp_extract_all(seq, 'v[^e]*c[^e]*p', 0)"))
      .select($"seq", size($"ms").as("n"),
        when(size($"ms") > 0, length(element_at($"ms", 1))).otherwise(0)
          .as("span"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(rows("vcpvcp") === ((1, 6)))
    assert(rows("vcpevcp") === ((2, 3)))
    assert(rows("vecp") === ((0, 0)))
    assert(rows("vscp") === ((1, 4)))
    assert(rows("cp") === ((0, 0)))
    assert(rows("vcvp") === ((1, 4)))
  }

  test("e_rfm: scores span 1-5, extremes land on 5, segment concatenates") {
    val out = SparkEntry.queries("e_rfm")(spark, sf()).cache()
    val bad = out.filter(
      $"r_score" < 1 || $"r_score" > 5 ||
      $"f_score" < 1 || $"f_score" > 5 ||
      $"m_score" < 1 || $"m_score" > 5)
    assert(bad.count() === 0, "a score left the 1-5 range")
    // the most recent purchaser scores R5 with recency 0; the biggest
    // spender scores M5 (fixed-range bucketing puts the max at the top
    // bucket's closed upper edge)
    val r0 = out.orderBy($"recency_days").limit(1).collect().head
    assert(r0.getAs[Long]("recency_days") === 0L)
    assert(r0.getAs[Long]("r_score") === 5L)
    val mTop = out.orderBy($"monetary_cents".desc).limit(1).collect().head
    assert(mTop.getAs[Long]("m_score") === 5L)
    val segBroken = out.filter($"segment" =!=
      concat($"r_score", $"f_score", $"m_score"))
    assert(segBroken.count() === 0)
    out.unpersist()
  }

  test("e_survival: KM invariants — n_risk telescopes, S = scalar fold, monotone") {
    val rows = SparkEntry.queries("e_survival")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))) // dur, deaths, censored, n_risk, s_ppm
    assert(rows.nonEmpty)
    // n_risk telescopes: risk set shrinks by exactly the row's exits
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 === a._4 - a._2 - a._3,
        s"n_risk(${b._1}) != n_risk(${a._1}) - deaths - censored")
    case _ => ()
    }
    // S_ppm is the ascending truncating fold of the rows' own factors
    var s = 1000000L
    rows.foreach { case (dur, deaths, _, nRisk, sPpm) =>
      s = s * ((nRisk - deaths) * 1000000L / nRisk) / 1000000L
      assert(sPpm === s, s"S(dur=$dur) mismatch")
    }
    // survival is monotone nonincreasing from 1.0
    assert(rows.map(_._5).sliding(2).forall {
      case Array(a, b) => b <= a
      case _ => true
    } && rows.head._5 <= 1000000L)
  }

  test("e_markov_attribution: removal never helps, shares partition the credit") {
    val out = SparkEntry.queries("e_markov_attribution")(spark, sf())
      .collect()
    assert(out.length === 4, "one row per non-conversion channel")
    out.foreach { r =>
      val (full, removed, eff) = (r.getAs[Long]("p_full_ppm"),
        r.getAs[Long]("p_removed_ppm"), r.getAs[Long]("effect_ppm"))
      // redirect-to-NULL can only lose conversion mass, so the
      // greatest(.., 0) clamp must never actually bind
      assert(full >= removed, s"removal increased conversion: $r")
      assert(eff === full - removed)
      assert(full >= 0L && full <= 1000000L &&
        removed >= 0L && removed <= 1000000L)
    }
    // floor-div shares sum to <= 1e6 and within rounding of it
    val shares = out.map(_.getAs[Long]("share_ppm")).sum
    assert(shares <= 1000000L && shares >= 1000000L - out.length,
      s"shares must partition the credit, got $shares")
  }

  test("e_changepoint: prefix closed form equals the textbook CUSUM recursion") {
    val out = SparkEntry.queries("e_changepoint")(spark, sf())
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n"),
        r.getAs[Long]("mu"), r.getAs[Long]("cusum_pos"),
        r.getAs[Long]("cusum_neg"), r.getAs[Boolean]("flag")))
    assert(out.nonEmpty)
    val mu = out.head._3
    val slack = mu / 20
    // scalar replay of S+_t = max(0, S+_{t-1} + x - mu - slack),
    // S-_t = max(0, S-_{t-1} - (x - mu + slack))
    var (sp, sm) = (0L, 0L)
    out.foreach { case (day, n, _, cp, cm, flag) =>
      sp = math.max(0L, sp + n - mu - slack)
      sm = math.max(0L, sm - (n - mu + slack))
      assert(cp === sp, s"day $day cusum_pos: $cp vs recursion $sp")
      assert(cm === sm, s"day $day cusum_neg: $cm vs recursion $sm")
      assert(flag === (sp > mu / 2 || sm > mu / 2))
    }
  }
}
