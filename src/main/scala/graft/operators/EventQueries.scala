package graft.operators

import graft.Q
import graft.functions.BqCompat._
import graft.sources.Sources
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operator coverage on the `events` table — these are
  * the testdata analogs of the reference's GTFS-rt workload: time
  * bucketing (docs/metrics_guide.md:27-35), ordered argmin rollups
  * (models/fact_trips.sql:42-63), first-pass dedup + headways via
  * windows (docs/metrics_guide.md:170-200), and feed-latency style
  * per-minute aggregates (docs/metrics_guide.md:312-319).
  *
  * Determinism: events.ts is parquet TIMESTAMP(NANOS); Spark reads
  * micros, DuckDB reads ns-truncated-to-us on scan. All emitted time
  * values are floored to epoch seconds or formatted strings so both
  * engines hash identically. (event_id is the unique tiebreak key.)
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "events")

  /** epoch seconds (floor) of ts — deterministic across engines. */
  private val epochS: Column => Column = c => unix_timestamp(c)

  val queries: Map[String, Q] = Map(

    // ── F2/F9/F10 + A2: 5-minute tumbling buckets (the trips-per-5min
    // metric, docs/metrics_guide.md:40-51). Bucket arithmetic in epoch
    // seconds; map-side combine makes this a pure scan at 100 TB.
    "f10_time_buckets" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .withColumn("bucket_s", (epochS($"ts") / 300L).cast(LongType) * 300L)
          .groupBy($"bucket_s", $"event_type")
          .agg(count(lit(1)).as("n"),
               countDistinct($"user_id").as("n_users"),
               sumMoney($"value").as("sum_value"))
          .withColumn("bucket", date_format(timestamp_seconds($"bucket_s"),
                                            "yyyy-MM-dd HH:mm:ss"))
          .select($"bucket", $"event_type", $"n", $"n_users", $"sum_value")
          .orderBy($"bucket", $"event_type")
          .limit(500)
      },
      oracle = Some("""
        SELECT strftime(make_timestamp((epoch_us(ts)//1000000)//300*300*1000000),
                        '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 500"""),
      desc = "F10 5-min epoch bucketing + A2/A8 multi-key agg"),

    // ── A5: ordered argmin/argmax rollup — first/last event per user,
    // the fact_trips shape (models/fact_trips.sql:42-63) via min_by /
    // max_by over composite null-last keys: O(n) single pass, no sort,
    // map-side partial aggregation (vs ARRAY_AGG ORDER BY LIMIT 1's
    // O(n log n) per-group sort).
    "a5_argmin_rollup" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .withColumn("es", epochS($"ts"))
          .groupBy($"user_id")
          .agg(
            argMinBy($"event_type", $"es", $"event_id").as("first_type"),
            argMaxBy($"event_type", $"es", $"event_id").as("last_type"),
            min($"es").as("first_s"),
            max($"es").as("last_s"),
            count(lit(1)).as("n_events"),
            sumMoney($"value").as("sum_value"))
          .withColumn("span_s", $"last_s" - $"first_s")
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH e AS (SELECT *, epoch_us(ts)//1000000 AS es FROM events),
        r AS (SELECT *,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY es, event_id) AS rn_a,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY es DESC, event_id DESC) AS rn_z
              FROM e)
        SELECT user_id,
               min(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
               min(CASE WHEN rn_z = 1 THEN event_type END) AS last_type,
               min(es) AS first_s,
               max(es) AS last_s,
               count(*) AS n_events,
               sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value,
               max(es) - min(es) AS span_s
        FROM r GROUP BY user_id ORDER BY user_id"""),
      desc = "A5 ordered argmin/argmax per-group rollup (min_by/max_by)"),

    // ── W1: first-pass dedup — QUALIFY ROW_NUMBER() = 1
    // (docs/metrics_guide.md:188-191). Partitioned window: shuffles
    // once on user_id, scales linearly.
    "w1_first_pass" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id", $"event_type",
                  epochS($"ts").as("first_s"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        SELECT user_id, event_id, event_type, epoch_us(ts)//1000000 AS first_s
        FROM (SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1 ORDER BY user_id"""),
      desc = "W1 row_number dedup (QUALIFY rn=1)"),

    // ── W2: global sequence row_number (docs/metrics_guide.md:186-199).
    // Single-partition window by construction (reference semantics);
    // at scale this is applied per stop/day slice — bounded. Filter to
    // purchases keeps the global sort small here.
    "w2_global_seq" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"ts", $"event_id")
        ev(s, dir)
          .filter($"event_type" === "purchase")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 100 && $"rn" > 1)
          .select($"rn", $"event_id", $"user_id")
          .orderBy($"rn")
      },
      oracle = Some("""
        SELECT rn, event_id, user_id
        FROM (SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn
              FROM events WHERE event_type = 'purchase')
        WHERE rn <= 100 AND rn > 1 ORDER BY rn"""),
      desc = "W2 global row_number sequence + range filter"),

    // ── W3: LAG headways — inter-event gap per user
    // (docs/metrics_guide.md:170-200). Gaps are integral seconds so
    // avg is exact double arithmetic in both engines.
    "w3_lag_headway" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        ev(s, dir)
          .withColumn("es", epochS($"ts"))
          .withColumn("prev_es", lag($"es", 1).over(w))
          .filter($"prev_es".isNotNull)
          .withColumn("gap_s", $"es" - $"prev_es")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_gaps"),
               min($"gap_s").as("min_gap"),
               max($"gap_s").as("max_gap"),
               avg($"gap_s").as("avg_gap"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts)//1000000
                   - lag(epoch_us(ts)//1000000) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
          FROM events)
        SELECT user_id, count(*) AS n_gaps, min(gap_s) AS min_gap,
               max(gap_s) AS max_gap, avg(gap_s) AS avg_gap
        FROM g WHERE gap_s IS NOT NULL
        GROUP BY user_id ORDER BY user_id"""),
      desc = "W3 lag() headways + integral-second avg"),

    // ── J6/J7: self-join of two filtered scans — signup→purchase
    // conversion delay (the A→B run-time query,
    // docs/metrics_guide.md:222-237). Equi on user_id + theta residual.
    "j6_self_conversion" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir).withColumn("es", epochS($"ts"))
        val a = e.filter($"event_type" === "signup")
          .select($"user_id", $"es".as("signup_s"), $"event_id".as("signup_id"))
        val b = e.filter($"event_type" === "purchase")
          .select($"user_id", $"es".as("purchase_s"))
        a.join(b, Seq("user_id"), "inner")
          .filter($"purchase_s" >= $"signup_s")
          .groupBy($"user_id", $"signup_id")
          .agg(count(lit(1)).as("n_purchases_after"),
               min($"purchase_s" - $"signup_s").as("min_delay_s"))
          .orderBy($"user_id", $"signup_id")
      },
      oracle = Some("""
        WITH e AS (SELECT *, epoch_us(ts)//1000000 AS es FROM events)
        SELECT a.user_id, a.event_id AS signup_id,
               count(*) AS n_purchases_after,
               min(b.es - a.es) AS min_delay_s
        FROM e a JOIN e b ON a.user_id = b.user_id AND b.es >= a.es
        WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      desc = "J6 self-join two filtered scans + J7 theta residual"),

    // ── strict-sequence funnel (view → click → purchase) ────────────
    // The product-analytics operator the reference's trip lifecycle
    // rollup generalizes to: per user, the earliest time each step
    // completes STRICTLY AFTER the previous step. Iterated
    // conditional-min shape: each stage is a user-keyed pre-aggregate
    // joined to the next stage's filtered scan — every join is on the
    // user key, so at 100 TB the event table shuffles once per stage
    // on the same key (co-partitioned under bucketing) and each
    // stage's frame is users-sized, not events-sized.
    "e_funnel" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
          .select($"user_id", $"event_type", epochS($"ts").as("es"))
        val fv = e.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"es").as("t_view"))
        val fc = e.filter($"event_type" === "click")
          .join(fv, Seq("user_id"))
          .filter($"es" > $"t_view")
          .groupBy($"user_id").agg(min($"es").as("t_click"))
        val fp = e.filter($"event_type" === "purchase")
          .join(fc, Seq("user_id"))
          .filter($"es" > $"t_click")
          .groupBy($"user_id").agg(min($"es").as("t_purchase"))
        fv.join(fc, Seq("user_id"), "left")
          .join(fp, Seq("user_id"), "left")
          .withColumn("stage", (lit(1) +
            when($"t_click".isNotNull, 1).otherwise(0) +
            when($"t_purchase".isNotNull, 1).otherwise(0)).cast(LongType))
          .select($"user_id", $"t_view", $"t_click", $"t_purchase", $"stage")
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts)//1000000 AS es
          FROM events),
        fv AS (
          SELECT user_id, min(es) AS t_view
          FROM e WHERE event_type = 'view' GROUP BY 1),
        fc AS (
          SELECT e.user_id, min(es) AS t_click
          FROM e JOIN fv USING (user_id)
          WHERE event_type = 'click' AND es > t_view GROUP BY 1),
        fp AS (
          SELECT e.user_id, min(es) AS t_purchase
          FROM e JOIN fc USING (user_id)
          WHERE event_type = 'purchase' AND es > t_click GROUP BY 1)
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
               CAST(1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END
                 AS BIGINT) AS stage
        FROM fv v LEFT JOIN fc c USING (user_id)
        LEFT JOIN fp p USING (user_id)
        ORDER BY user_id"""),
      desc = "strict-sequence funnel: iterated conditional-min, user-keyed joins"),

    // ── conversion-window funnel (the production e_funnel) ──────────
    // Real funnel definitions bound each step: a click only counts
    // within `W` of the qualifying view, a purchase within `W` of the
    // qualifying click — unbounded funnels credit conversions months
    // later and every analytics product (GA, Amplitude) windows them.
    // Same iterated conditional-min shape as e_funnel with the upper
    // bound riding each step's join filter (still user-keyed, one
    // shuffle); W = 3 days. Emits per-stage counts beside the per-user
    // frame's aggregate: the step timestamps, stage, and both step
    // latencies — the funnel report's actual columns.
    "e_funnel_windowed" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val W = 3L * 86400L
        val e = ev(s, dir)
          .select($"user_id", $"event_type", epochS($"ts").as("es"))
        val fv = e.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"es").as("t_view"))
        val fc = e.filter($"event_type" === "click")
          .join(fv, Seq("user_id"))
          .filter($"es" > $"t_view" && $"es" <= $"t_view" + W)
          .groupBy($"user_id")
          .agg(min($"es").as("t_click"), min($"t_view").as("t_view"))
        val fp = e.filter($"event_type" === "purchase")
          .join(fc.select($"user_id", $"t_click"), Seq("user_id"))
          .filter($"es" > $"t_click" && $"es" <= $"t_click" + W)
          .groupBy($"user_id").agg(min($"es").as("t_purchase"))
        fv.join(fc.select($"user_id", $"t_click"), Seq("user_id"), "left")
          .join(fp, Seq("user_id"), "left")
          .withColumn("stage", (lit(1) +
            when($"t_click".isNotNull, 1).otherwise(0) +
            when($"t_purchase".isNotNull, 1).otherwise(0)).cast(LongType))
          .select($"user_id", $"t_view", $"t_click", $"t_purchase",
            $"stage", ($"t_click" - $"t_view").as("lat_vc_s"),
            ($"t_purchase" - $"t_click").as("lat_cp_s"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts)//1000000 AS es
          FROM events),
        wv AS (
          SELECT user_id, min(es) AS t_view
          FROM e WHERE event_type = 'view' GROUP BY 1),
        wc AS (
          SELECT e.user_id, min(es) AS t_click
          FROM e JOIN wv USING (user_id)
          WHERE event_type = 'click' AND es > t_view
            AND es <= t_view + 259200
          GROUP BY 1),
        wp AS (
          SELECT e.user_id, min(es) AS t_purchase
          FROM e JOIN wc USING (user_id)
          WHERE event_type = 'purchase' AND es > t_click
            AND es <= t_click + 259200
          GROUP BY 1)
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
               CAST(1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END
                 AS BIGINT) AS stage,
               c.t_click - v.t_view AS lat_vc_s,
               p.t_purchase - c.t_click AS lat_cp_s
        FROM wv v LEFT JOIN wc c USING (user_id)
        LEFT JOIN wp p USING (user_id)
        ORDER BY user_id"""),
      desc = "conversion-window funnel: each step bounded to 3 days, with step latencies"),

    // ── daily cohort retention ──────────────────────────────────────
    // Cohort = day of a user's first event; matrix cell = distinct
    // users of cohort d active d+offset. cohort_day comes from an
    // unbounded min window over user_id, so cohorting and the
    // activity scan share ONE user_id exchange — no users-sized
    // broadcast (a billion-user build side would OOM the driver) and
    // no second shuffle for a self-join.
    "e_retention" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
          .select($"user_id", (epochS($"ts") / 86400L).cast(LongType).as("day"))
        e.withColumn("cohort_day", min($"day").over(Window.partitionBy($"user_id")))
          .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
          .agg(countDistinct($"user_id").as("n_users"))
          .orderBy($"cohort_day", $"day_offset")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, (epoch_us(ts)//1000000)//86400 AS day
          FROM events),
        f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM e JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      desc = "daily cohort retention matrix: first-touch cohorts × active offsets"),

    // ── growth accounting: per-day active-user lifecycle states ─────
    // The companion readout to e_retention: each (user, active day)
    // classified against the user's PREVIOUS active day — new (first
    // ever), retained (yesterday), returning (gap 2..7d), resurrected
    // (gap >7d) — then rolled up per day. One exchange on user_id
    // (per-user distinct days collected as a sorted array — bounded
    // by the calendar, the documented sessionize bound), then a tiny
    // (day,state) aggregate. No self-join, no day spine, no second
    // pass over raw events — the shape that holds at 100 TB.
    "e_user_lifecycle" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"))
          .groupBy($"user_id")
          .agg(array_sort(collect_set($"day")).as("ds"))
          .select(explode(expr(
            "transform(ds, (d, i) -> struct(d AS day, " +
              "CASE WHEN i = 0 THEN CAST(NULL AS BIGINT) " +
              "ELSE ds[i-1] END AS prev_day))")).as("x"))
          .select($"x.day".as("day"), $"x.prev_day".as("prev_day"))
          .withColumn("state",
            when($"prev_day".isNull, "new")
              .when($"day" - $"prev_day" === 1L, "retained")
              .when($"day" - $"prev_day" <= 7L, "returning")
              .otherwise("resurrected"))
          .groupBy($"day")
          .agg(
            count(when($"state" === "new", 1)).as("n_new"),
            count(when($"state" === "retained", 1)).as("n_retained"),
            count(when($"state" === "returning", 1)).as("n_returning"),
            count(when($"state" === "resurrected", 1)).as("n_resurrected"),
            count(lit(1)).as("n_active"))
          .orderBy($"day")
      },
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT user_id, (epoch_us(ts)//1000000)//86400 AS day
          FROM events),
        c AS (
          SELECT user_id, day,
                 lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
          FROM d),
        s AS (
          SELECT day,
                 CASE WHEN prev_day IS NULL THEN 'new'
                      WHEN day - prev_day = 1 THEN 'retained'
                      WHEN day - prev_day <= 7 THEN 'returning'
                      ELSE 'resurrected' END AS state
          FROM c)
        SELECT day,
               count(*) FILTER (state = 'new') AS n_new,
               count(*) FILTER (state = 'retained') AS n_retained,
               count(*) FILTER (state = 'returning') AS n_returning,
               count(*) FILTER (state = 'resurrected') AS n_resurrected,
               count(*) AS n_active
        FROM s GROUP BY day ORDER BY day"""),
      desc = "growth accounting: new/retained/returning/resurrected per active day"),

    // ── A9: quantiles — p50/p90 of value per event_type. Exact
    // percentile on integral cents in both engines (approx sketches
    // diverge between engines; SURVEY A9). At 100 TB swap to
    // percentile_approx — same API shape.
    "a9_quantiles" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val cents = round($"value" * 100).cast(LongType)
        ev(s, dir)
          .withColumn("cents", cents)
          .groupBy($"event_type")
          .agg(
            percentile($"cents", lit(0.5)).as("p50_cents"),
            percentile($"cents", lit(0.9)).as("p90_cents"),
            count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        SELECT event_type,
               quantile_cont(CAST(round(value*100) AS BIGINT), 0.5) AS p50_cents,
               quantile_cont(CAST(round(value*100) AS BIGINT), 0.9) AS p90_cents,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      desc = "A9 exact percentiles (p50/p90) on integral cents"),

    // ── A6/A7/A11 + F11: conditional counts/rates (COUNTIF /
    // AVG(CASE) / SAFE_DIVIDE — docs/metrics_guide.md:285-292) and
    // day-of-week extraction (1=Sunday, BigQuery convention).
    "a6_condcount" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .withColumn("dow", dayofweek(timestamp_seconds(epochS($"ts"))))
          .groupBy($"dow")
          .agg(
            count(lit(1)).as("n"),
            count_if($"event_type" === "error").as("n_errors"),
            avg(when($"event_type" === "purchase", 1.0).otherwise(0.0))
              .as("purchase_rate"),
            try_divide(count_if($"value" > 100.0), count(lit(1)))
              .as("high_value_rate"),
            try_divide(count_if($"event_type" === "refund"),
                       count_if($"event_type" === "purchase")).as("refund_ratio"))
          .orderBy($"dow")
      },
      oracle = Some("""
        SELECT dayofweek(ts) + 1 AS dow,
               count(*) AS n,
               count(*) FILTER (event_type = 'error') AS n_errors,
               avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                 AS purchase_rate,
               CAST(count(*) FILTER (value > 100.0) AS DOUBLE)/count(*)
                 AS high_value_rate,
               CAST(count(*) FILTER (event_type = 'refund') AS DOUBLE)
                 / nullif(count(*) FILTER (event_type = 'purchase'), 0)
                 AS refund_ratio
        FROM events GROUP BY 1 ORDER BY 1"""),
      desc = "A6/A7/A11 count_if, avg(case), try_divide + F11 dayofweek"),

    // ── F-json: JSON field extraction from props (beyond reference —
    // dlt-style payload probing) + F1 try_cast.
    "f_json_props" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .withColumn("k", safeCastLong(get_json_object($"props", "$.k")))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
               sum($"k").as("sum_k"),
               min($"k").as("min_k"),
               max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(try_cast(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_k,
               min(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY 1 ORDER BY 1"""),
      desc = "JSON extraction + F1 try_cast aggregated"),

    // ── interval union (gaps-and-islands) ───────────────────────────
    // Coalesce overlapping activity intervals — the alert-uptime shape
    // of the reference's active_period windows (models/fact_alerts.sql
    // :40-63) generalized: each event opens a [es, es+300) interval;
    // per user we merge overlapping/touching intervals into islands
    // and report coverage. One window pass over a user-partitioned
    // sort — at 100 TB this is a single shuffle on user_id with no
    // joins; island detection is the running-max-of-end trick, not a
    // self-join.
    "e_interval_union" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"es", $"event_id")
        val prevEnd = max($"e2").over(
          w.rowsBetween(Window.unboundedPreceding, -1))
        ev(s, dir)
          .select($"user_id", $"event_id", epochS($"ts").as("es"))
          .withColumn("e2", $"es" + 300L)
          .withColumn("new_island",
            when(prevEnd.isNull || $"es" > prevEnd, 1L).otherwise(0L))
          .withColumn("island", sum($"new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"island")
          .agg(min($"es").as("i_start"), max($"e2").as("i_end"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_islands"),
               sum($"i_end" - $"i_start").as("covered_s"),
               max($"i_end" - $"i_start").as("longest_s"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH iv AS (
          SELECT user_id, event_id,
                 epoch_us(ts)//1000000 AS es,
                 epoch_us(ts)//1000000 + 300 AS e2
          FROM events),
        marked AS (
          SELECT user_id, es, e2,
                 CASE WHEN max(e2) OVER (PARTITION BY user_id
                        ORDER BY es ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                   OR es > max(e2) OVER (PARTITION BY user_id
                        ORDER BY es ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_island,
                 event_id
          FROM iv),
        isl AS (
          SELECT user_id, es, e2,
                 sum(new_island) OVER (PARTITION BY user_id
                   ORDER BY es ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
          FROM marked),
        grouped AS (
          SELECT user_id, island, min(es) AS i_start, max(e2) AS i_end
          FROM isl GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_islands,
               CAST(sum(i_end - i_start) AS BIGINT) AS covered_s,
               max(i_end - i_start) AS longest_s
        FROM grouped GROUP BY 1 ORDER BY user_id"""),
      desc = "interval union: gaps-and-islands coalescing via running-max window"),

    // ── batch CDC MERGE: snapshot ⊕ changelog upsert/delete ─────────
    // The daily warehouse op the streaming mergeKeys sink performs
    // continuously, as an auditable batch twin: a base snapshot (per-
    // user latest state before the split day) merged with a delta
    // changelog (latest change per user on/after it), where a delta
    // row is an UPSERT (new state wins) or a TOMBSTONE (user_id % 10
    // = 0 here — a stand-in for the changelog's delete flag; the
    // testdata carries none) that removes the key. Everything is
    // keyed user_id: two argmax aggregates + one full outer join, all
    // riding the same exchange key — MERGE INTO at 100 TB is exactly
    // this plan plus a partition-pruned rewrite of matched files.
    // Day 19738 splits the testdata's fixed 30-day window in half.
    "e_merge_upsert" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir).select($"user_id", $"event_id",
          epochS($"ts").as("es"), $"event_type",
          round($"value" * 100).cast(LongType).as("cents"),
          (epochS($"ts") / 86400L).cast(LongType).as("day_i"))
        def latest(df: DataFrame) = df.groupBy($"user_id")
          .agg(max_by(struct($"event_type".as("attr"), $"cents", $"es"),
            struct($"es", $"event_id")).as("r"))
          .select($"user_id", $"r.attr", $"r.cents", $"r.es")
        val base = latest(e.filter($"day_i" < 19738L))
        val delta = latest(e.filter($"day_i" >= 19738L))
          .withColumn("op",
            when($"user_id" % 10 === 0, lit("delete")).otherwise(lit("upsert")))
          .select($"user_id", $"attr".as("d_attr"), $"cents".as("d_cents"),
            $"es".as("d_es"), $"op")
        base.join(delta, Seq("user_id"), "full_outer")
          .filter($"op".isNull || $"op" === "upsert")
          .select($"user_id",
            coalesce($"d_attr", $"attr").as("attr"),
            coalesce($"d_cents", $"cents").as("cents"),
            coalesce($"d_es", $"es").as("updated_es"),
            when($"op".isNotNull, lit("delta")).otherwise(lit("base"))
              .as("src"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts)//1000000 AS es,
                 event_type, CAST(round(value*100) AS BIGINT) AS cents,
                 epoch_us(ts)//1000000//86400 AS day_i
          FROM events),
        b AS (
          SELECT user_id, event_type AS attr, cents, es FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY es DESC, event_id DESC) AS rn
            FROM e WHERE day_i < 19738) WHERE rn = 1),
        d AS (
          SELECT user_id, event_type AS d_attr, cents AS d_cents,
                 es AS d_es,
                 CASE WHEN user_id % 10 = 0 THEN 'delete'
                      ELSE 'upsert' END AS op
          FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY es DESC, event_id DESC) AS rn
            FROM e WHERE day_i >= 19738) WHERE rn = 1)
        SELECT COALESCE(d.user_id, b.user_id) AS user_id,
               COALESCE(d.d_attr, b.attr) AS attr,
               COALESCE(d.d_cents, b.cents) AS cents,
               COALESCE(d.d_es, b.es) AS updated_es,
               CASE WHEN d.user_id IS NOT NULL THEN 'delta'
                    ELSE 'base' END AS src
        FROM b FULL OUTER JOIN d ON b.user_id = d.user_id
        WHERE d.op IS NULL OR d.op = 'upsert'
        ORDER BY user_id"""),
      desc = "batch CDC merge: snapshot + changelog upsert/tombstone, one key"),

    // ── data-quality anomaly flags: MAD outliers on daily volumes ───
    // The volume monitor every ingest pipeline runs before training
    // jobs consume a day: daily counts per event type, flagged when
    // |n − median| > 3·MAD (median absolute deviation — robust to the
    // very anomalies it hunts, unlike stddev). The daily frame is
    // (types × days)-sized at ANY corpus scale, so the two percentile
    // passes and the flag join are over a tiny frame; the events scan
    // is one map-side-combined count. MAD is clamped ≥ 0.5 in both
    // engines (a constant series has MAD 0 and every deviation would
    // flag).
    "dq_anomaly" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val daily = graft.Engine.materialize(
          ev(s, dir)
            .select($"event_type",
              (epochS($"ts") / 86400L).cast(LongType).as("day_i"))
            .groupBy($"event_type", $"day_i")
            .agg(count(lit(1)).as("n")),
          key = "event_type", name = "dq_daily")
        val med = daily.groupBy($"event_type")
          .agg(percentile($"n", lit(0.5)).as("med"))
        val stats = daily.join(broadcast(med), Seq("event_type"))
          .groupBy($"event_type")
          .agg(min($"med").as("med"),
               percentile(abs($"n" - $"med"), lit(0.5)).as("mad"))
        daily.join(broadcast(stats), Seq("event_type"))
          .select($"event_type", $"day_i", $"n", $"med", $"mad",
            (abs($"n" - $"med") > greatest($"mad", lit(0.5)) * 3.0)
              .as("is_anomaly"))
          .orderBy($"event_type", $"day_i")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, epoch_us(ts)//1000000//86400 AS day_i
          FROM events),
        daily AS (
          SELECT event_type, day_i, count(*) AS n FROM e GROUP BY 1, 2),
        med AS (
          SELECT event_type, quantile_cont(n, 0.5) AS med
          FROM daily GROUP BY 1),
        st AS (
          SELECT d.event_type, min(m.med) AS med,
                 quantile_cont(abs(d.n - m.med), 0.5) AS mad
          FROM daily d JOIN med m USING (event_type) GROUP BY 1)
        SELECT d.event_type, d.day_i, d.n, st.med, st.mad,
               abs(d.n - st.med) > greatest(st.mad, 0.5) * 3.0
                 AS is_anomaly
        FROM daily d JOIN st USING (event_type)
        ORDER BY event_type, day_i"""),
      desc = "daily-volume anomaly flags via 3-MAD robust outlier test"),

    // ── data freshness / staleness monitor ──────────────────────────
    // The other half of the ingest health check beside dq_anomaly's
    // volume test: per stream, how far behind the feed's global
    // watermark did this event type last report? (The reference's M11
    // feed-latency metric generalized to a per-source SLA check —
    // docs/metrics_guide.md:312-319.) One map-side-combined agg per
    // group + a broadcast 1-row watermark; at 100 TB, with day
    // partitions, the scan prunes to the newest partitions since
    // last_es is monotone in the partition key.
    "dq_freshness" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir).select($"event_type", epochS($"ts").as("es"))
        val wm = e.agg(max($"es").as("watermark_es"))
        e.groupBy($"event_type")
          .agg(count(lit(1)).as("n_rows"), max($"es").as("last_es"))
          .crossJoin(broadcast(wm))
          .withColumn("lag_s", $"watermark_es" - $"last_es")
          .withColumn("stale", $"lag_s" > 3600L)
          .select($"event_type", $"n_rows", $"last_es", $"watermark_es",
            $"lag_s", $"stale")
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, epoch_us(ts)//1000000 AS es FROM events),
        g AS (SELECT max(es) AS watermark_es FROM e)
        SELECT event_type, count(*) AS n_rows, max(es) AS last_es,
               g.watermark_es,
               g.watermark_es - max(es) AS lag_s,
               (g.watermark_es - max(es)) > 3600 AS stale
        FROM e CROSS JOIN g
        GROUP BY event_type, g.watermark_es
        ORDER BY event_type"""),
      desc = "per-stream freshness lag vs feed watermark with SLA flag"),

    // ── RFM segmentation (recency / frequency / monetary) ───────────
    // The classic customer-value segmentation: per purchasing user,
    // days-since-last-purchase, purchase count, and lifetime cents,
    // each scored 1–5 by FIXED-RANGE bucketing over the observed
    // extent — ((v − lo)·5) div (hi − lo + 1) + 1, the layout_zorder
    // div-bucket pattern: deterministic, shuffle-parallel, and
    // DuckDB-`//`-replayable, where the textbook ntile(5) would be a
    // single-partition global sort (the round-7 layout finding's
    // class). Extent is a broadcast 1-row frame; the per-user rollup
    // rides one user_id exchange. Score 5 = most recent / most
    // frequent / highest spend.
    "e_rfm" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val per = ev(s, dir).filter($"event_type" === "purchase")
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            round($"value" * 100).cast(LongType).as("cents"))
          .groupBy($"user_id")
          .agg(max($"day").as("last_day"), count(lit(1)).as("frequency"),
            sum($"cents").as("monetary_cents"))
        val ext = per.agg(
          min($"last_day").as("ld_lo"), max($"last_day").as("ld_hi"),
          min($"frequency").as("f_lo"), max($"frequency").as("f_hi"),
          min($"monetary_cents").as("m_lo"), max($"monetary_cents").as("m_hi"))
        per.crossJoin(broadcast(ext))
          .withColumn("r_score",
            expr("((last_day - ld_lo) * 5) div (ld_hi - ld_lo + 1) + 1"))
          .withColumn("f_score",
            expr("((frequency - f_lo) * 5) div (f_hi - f_lo + 1) + 1"))
          .withColumn("m_score",
            expr("((monetary_cents - m_lo) * 5) div (m_hi - m_lo + 1) + 1"))
          .select($"user_id", ($"ld_hi" - $"last_day").as("recency_days"),
            $"frequency", $"monetary_cents",
            $"r_score", $"f_score", $"m_score",
            concat($"r_score", $"f_score", $"m_score").as("segment"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT user_id,
                 (epoch_us(ts)//1000000)//86400 AS day,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        per AS (
          SELECT user_id, max(day) AS last_day, count(*) AS frequency,
                 CAST(sum(cents) AS BIGINT) AS monetary_cents
          FROM p GROUP BY user_id),
        ext AS (
          SELECT min(last_day) AS ld_lo, max(last_day) AS ld_hi,
                 min(frequency) AS f_lo, max(frequency) AS f_hi,
                 min(monetary_cents) AS m_lo, max(monetary_cents) AS m_hi
          FROM per),
        sc AS (
          SELECT user_id, ld_hi - last_day AS recency_days,
                 frequency, monetary_cents,
                 ((last_day - ld_lo) * 5) // (ld_hi - ld_lo + 1) + 1
                   AS r_score,
                 ((frequency - f_lo) * 5) // (f_hi - f_lo + 1) + 1
                   AS f_score,
                 ((monetary_cents - m_lo) * 5) // (m_hi - m_lo + 1) + 1
                   AS m_score
          FROM per CROSS JOIN ext)
        SELECT user_id, recency_days, frequency, monetary_cents,
               r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                 || CAST(m_score AS VARCHAR) AS segment
        FROM sc ORDER BY user_id"""),
      desc = "RFM 1-5 segmentation via fixed-range div buckets (no global sort)"),

    // ── A/B experiment readout (2×2 contingency + chi-square) ───────
    // The experiment-analysis frame: users hash-split into two arms
    // (the stratifiedSample md5 draw — assignment is a pure function
    // of user_id, reproducible on any engine and any re-run),
    // conversion = has ≥1 purchase, and the 2×2 independence test as
    // an integer chi²×100 — N(ad−bc)²·100 div the margin product.
    // Every count is a user_id-keyed agg (map-side combined); the
    // arm pivot is a 2-row frame. The integer chi² numerator bounds
    // N·(n0·n1)² — fine to ~10^6 users; past that the same statistic
    // computes from per-arm ppm shares (documented, not needed at
    // driver SF). One row out; ORDER BY is trivially total.
    "e_ab_test" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val arms = e.select($"user_id").distinct()
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        // "conversion" = power purchaser (≥14 purchases — the median
        // split on this data, where plain any-purchase saturates)
        val conv = e.filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_purch"),
            sum(round($"value" * 100).cast(LongType)).as("cents"))
          .filter($"n_purch" >= 14L)
        val per = arms.join(conv, Seq("user_id"), "left")
          .groupBy($"arm")
          .agg(count(lit(1)).as("n_users"),
            count($"n_purch").as("n_conv"),
            coalesce(sum($"cents"), lit(0L)).as("sum_cents"))
        val a0 = per.filter($"arm" === 0L)
          .select($"n_users".as("n0"), $"n_conv".as("c0"),
            $"sum_cents".as("cents0"))
        val a1 = per.filter($"arm" === 1L)
          .select($"n_users".as("n1"), $"n_conv".as("c1"),
            $"sum_cents".as("cents1"))
        a0.crossJoin(broadcast(a1))
          .withColumn("ppm0", expr("c0 * 1000000L div n0"))
          .withColumn("ppm1", expr("c1 * 1000000L div n1"))
          .withColumn("diff_ppm", $"ppm1" - $"ppm0")
          // a zero margin (all or none converted) zeroes ad−bc too, so
          // greatest(…,1) turns the degenerate 0/0 into a clean 0;
          // the x100 integer form is overflow-GUARDED (raises out of
          // envelope rather than wrapping — BqCompat.chi2x100Sql)
          .withColumn("chi2_x100",
            expr(graft.functions.BqCompat.chi2x100Sql()))
          .select($"n0", $"c0", $"ppm0", $"cents0",
            $"n1", $"c1", $"ppm1", $"cents1",
            $"diff_ppm", $"chi2_x100")
          .orderBy($"n0")
      },
      oracle = Some("""
        WITH arms AS (
          SELECT DISTINCT user_id,
                 ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM events),
        conv AS (
          SELECT user_id, count(*) AS n_purch,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1
          HAVING count(*) >= 14),
        per AS (
          SELECT a.arm, count(*) AS n_users, count(c.n_purch) AS n_conv,
                 CAST(COALESCE(sum(c.cents), 0) AS BIGINT) AS sum_cents
          FROM arms a LEFT JOIN conv c USING (user_id)
          GROUP BY a.arm),
        w AS (
          SELECT p0.n_users AS n0, p0.n_conv AS c0,
                 p0.sum_cents AS cents0,
                 p1.n_users AS n1, p1.n_conv AS c1,
                 p1.sum_cents AS cents1
          FROM (SELECT * FROM per WHERE arm = 0) p0
          CROSS JOIN (SELECT * FROM per WHERE arm = 1) p1)
        SELECT n0, c0, c0 * 1000000 // n0 AS ppm0, cents0,
               n1, c1, c1 * 1000000 // n1 AS ppm1, cents1,
               c1 * 1000000 // n1 - c0 * 1000000 // n0 AS diff_ppm,
               (n0 + n1) * (c0 * (n1 - c1) - c1 * (n0 - c0))
                 * (c0 * (n1 - c1) - c1 * (n0 - c0)) * 100
                 // greatest(n0 * n1 * (c0 + c1) * (n0 + n1 - c0 - c1), 1)
                 AS chi2_x100
        FROM w ORDER BY n0"""),
      desc = "A/B readout: hash arms, conversion ppm, integer chi-square"),

    // ── sample-ratio mismatch: the assignment-integrity guardrail ───
    // The FIRST check an experimentation platform runs before any
    // readout (Fabijan et al., KDD 2019): do the observed arm sizes
    // match the declared 50/50 split? A mismatch invalidates the
    // whole experiment (redirect bugs, bot filtering by arm, logging
    // loss). For an equal two-way split the chi-square statistic
    // collapses to (2·n0 − n)² / n — exact in integers ×100; flag at
    // the 3.84 critical value (α = .05, df = 1). Two splits side by
    // side: the healthy md5 hash split, and a deliberately broken
    // user_id % 4 == 0 assignment the flag must catch — both
    // outcomes pinned deterministically.
    "e_srm" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val users = ev(s, dir).select($"user_id").distinct()
        def split(name: String, arm: Column): DataFrame =
          users.withColumn("arm", arm)
            .agg(sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n0"),
              sum(when($"arm" =!= 0L, 1L).otherwise(0L)).as("n1"))
            .withColumn("split", lit(name))
        val healthy = split("hash_50_50", expr("CAST(conv(substring(md5(" +
          "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val broken = split("mod4_bug",
          when($"user_id" % 4 === 0L, 0L).otherwise(1L))
        healthy.unionByName(broken)
          .withColumn("n", $"n0" + $"n1")
          .withColumn("share0_ppm", expr("n0 * 1000000L div n"))
          .withColumn("chi2_x100", expr(
            "(2L * n0 - n) * (2L * n0 - n) * 100L div n"))
          .withColumn("srm", $"chi2_x100" > 384L)
          .select($"split", $"n0", $"n1", $"n", $"share0_ppm",
            $"chi2_x100", $"srm")
          .orderBy($"split")
      },
      oracle = Some("""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        s AS (
          SELECT 'hash_50_50' AS split,
                 CAST(sum(CASE WHEN ('0x' || substring(md5(
                     CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN ('0x' || substring(md5(
                     CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 <> 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n1
          FROM u
          UNION ALL
          SELECT 'mod4_bug' AS split,
                 CAST(sum(CASE WHEN user_id % 4 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN user_id % 4 <> 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n1
          FROM u)
        SELECT split, n0, n1, n0 + n1 AS n,
               n0 * 1000000 // (n0 + n1) AS share0_ppm,
               (2 * n0 - (n0 + n1)) * (2 * n0 - (n0 + n1)) * 100
                 // (n0 + n1) AS chi2_x100,
               (2 * n0 - (n0 + n1)) * (2 * n0 - (n0 + n1)) * 100
                 // (n0 + n1) > 384 AS srm
        FROM s ORDER BY split"""),
      desc = "sample-ratio-mismatch guardrail: exact chi-square vs declared split"),

    // ── CUPED variance reduction (the experimentation workhorse) ────
    // Deng et al., WSDM 2013: adjust each arm's post-period metric by
    // θ·(pre-period covariate − its mean), where θ = cov(x,y)/var(x)
    // is fit POOLED across arms (x is pre-experiment, so θ is
    // assignment-independent). Arm-level means suffice for the
    // adjusted effect: Δ_cuped = (ȳ₁−ȳ₀) − θ·(x̄₁−x̄₀) — no per-user
    // adjusted rows ever materialize. All fixed-point BIGINT: x/y are
    // per-user purchase cents pre/post the observed mid-day (the
    // e_did split), moments are computed on mean-CENTERED values
    // (xc = x − ⌊Σx/n⌋ — the two-pass form, so no n·Σxy term: raw
    // moments overflow Long at ~40k users × $1k cents, centered ones
    // hold to 1e9 users), and θ_ppm = cov div max(var div 1e6, 1) —
    // denominator-shrunk so cov·1e6 never forms. Truncating div
    // matches `//` in DuckDB on negatives (both toward zero). Shape:
    // one user_id shuffle, then 1-row/2-row broadcast frames.
    "e_ab_cuped" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val ext = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"))
          .agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val per = ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            when($"event_type" === "purchase",
              round($"value" * 100).cast(LongType)).otherwise(0L)
              .as("cents"))
          .crossJoin(broadcast(ext))
          .groupBy($"user_id")
          .agg(sum(when($"day" < $"mid", $"cents").otherwise(0L)).as("x"),
            sum(when($"day" >= $"mid", $"cents").otherwise(0L)).as("y"))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val m1 = per.agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"))
        val m2 = per.crossJoin(broadcast(m1))
          .withColumn("xc", $"x" - expr("sx div n"))
          .withColumn("yc", $"y" - expr("sy div n"))
          .agg(sum($"xc" * $"yc").as("cov_c"),
            sum($"xc" * $"xc").as("var_c"))
        val arms = per.groupBy($"arm")
          .agg(count(lit(1)).as("n_a"), sum($"x").as("sx_a"),
            sum($"y").as("sy_a"))
        def pick(a: Long, c: String) = min(when($"arm" === a, col(c)))
        arms.agg(
            pick(0L, "n_a").as("n0"), pick(1L, "n_a").as("n1"),
            pick(0L, "sx_a").as("sx0"), pick(1L, "sx_a").as("sx1"),
            pick(0L, "sy_a").as("sy0"), pick(1L, "sy_a").as("sy1"))
          .crossJoin(broadcast(m2))
          .withColumn("theta_ppm", expr(
            "cov_c div greatest(var_c div 1000000L, 1L)"))
          .withColumn("x_diff_x100",
            expr("sx1 * 100L div n1 - sx0 * 100L div n0"))
          .withColumn("y_diff_x100",
            expr("sy1 * 100L div n1 - sy0 * 100L div n0"))
          .withColumn("cuped_diff_x100",
            expr("y_diff_x100 - theta_ppm * x_diff_x100 div 1000000L"))
          .select($"n0", $"n1", $"theta_ppm", $"x_diff_x100",
            $"y_diff_x100", $"cuped_diff_x100")
          .orderBy($"n0")
      },
      oracle = Some("""
        WITH cu_d AS (
          SELECT user_id, (epoch_us(ts)//1000000)//86400 AS day,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value*100) AS BIGINT)
                      ELSE 0 END AS cents
          FROM events),
        cu_m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM cu_d),
        cu_p AS (
          SELECT d.user_id,
                 CAST(sum(CASE WHEN d.day < m.mid THEN d.cents
                          ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN d.day >= m.mid THEN d.cents
                          ELSE 0 END) AS BIGINT) AS y,
                 ('0x' || substring(md5(CAST(d.user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM cu_d d CROSS JOIN cu_m m
          GROUP BY d.user_id),
        cu_1 AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy
          FROM cu_p),
        cu_2 AS (
          SELECT CAST(sum((p.x - o.sx // o.n) * (p.y - o.sy // o.n))
                   AS BIGINT) AS cov_c,
                 CAST(sum((p.x - o.sx // o.n) * (p.x - o.sx // o.n))
                   AS BIGINT) AS var_c
          FROM cu_p p CROSS JOIN cu_1 o),
        cu_a AS (
          SELECT arm, CAST(count(*) AS BIGINT) AS n_a,
                 CAST(sum(x) AS BIGINT) AS sx_a,
                 CAST(sum(y) AS BIGINT) AS sy_a
          FROM cu_p GROUP BY 1),
        cu_w AS (
          SELECT
            min(CASE WHEN arm = 0 THEN n_a END) AS n0,
            min(CASE WHEN arm = 1 THEN n_a END) AS n1,
            min(CASE WHEN arm = 0 THEN sx_a END) AS sx0,
            min(CASE WHEN arm = 1 THEN sx_a END) AS sx1,
            min(CASE WHEN arm = 0 THEN sy_a END) AS sy0,
            min(CASE WHEN arm = 1 THEN sy_a END) AS sy1
          FROM cu_a),
        cu_f AS (
          SELECT w.*, c.cov_c // greatest(c.var_c // 1000000, 1)
                   AS theta_ppm,
                 sx1 * 100 // n1 - sx0 * 100 // n0 AS x_diff_x100,
                 sy1 * 100 // n1 - sy0 * 100 // n0 AS y_diff_x100
          FROM cu_w w CROSS JOIN cu_2 c)
        SELECT n0, n1, theta_ppm, x_diff_x100, y_diff_x100,
               y_diff_x100 - theta_ppm * x_diff_x100 // 1000000
                 AS cuped_diff_x100
        FROM cu_f ORDER BY n0"""),
      desc = "CUPED adjusted A/B effect: pooled theta from centered BIGINT moments"),

    // ── Poisson-bootstrap CI (the bootstrap that shards) ────────────
    // The percentile CI on the A/B revenue-per-user difference via
    // the Poisson bootstrap (Chamandy et al. 2012, the Google
    // resampling for data that doesn't fit one machine): classical
    // resampling needs coordinated global draws, but Poisson(1)
    // per-row replicate weights are iid ACROSS rows, so each
    // partition draws independently and partials merge — and here the
    // draws are derandomized entirely: weight = inverse-CDF of
    // md5(user_id:replicate) mod 1e6 against fixed cumulative-ppm
    // thresholds (367879, 735759, 919699, 981012, 996340, then 5 —
    // capped; P(W>5) ≈ 6e-4 folds into the top bin), reproducible on
    // any engine and any partitioning. 32 replicates explode inline
    // and collapse to 64 (replicate, arm) groups map-side — the
    // shuffle carries 64·partitions rows, not 32·users. Rank edges
    // 2..31 of the sorted diffs bound a 93.75% percentile interval;
    // the windows run over the bounded 32-row frame.
    "e_ab_bootstrap" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val conv = e.filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(sum(round($"value" * 100).cast(LongType)).as("cents"))
        val per = e.select($"user_id").distinct()
          .join(conv, Seq("user_id"), "left")
          .withColumn("cents", coalesce($"cents", lit(0L)))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val rep = per
          .select($"user_id", $"cents", $"arm",
            explode(sequence(lit(0L), lit(31L))).as("replicate"))
          .withColumn("u", expr("CAST(conv(substring(md5(concat(" +
            "CAST(user_id AS STRING), ':', CAST(replicate AS STRING)" +
            ")), 1, 8), 16, 10) AS BIGINT) % 1000000L"))
          .withColumn("w", expr("""CASE
              WHEN u < 367879L THEN 0L WHEN u < 735759L THEN 1L
              WHEN u < 919699L THEN 2L WHEN u < 981012L THEN 3L
              WHEN u < 996340L THEN 4L ELSE 5L END"""))
        val g = rep.groupBy($"replicate", $"arm")
          .agg(sum($"w").as("wn"), sum($"w" * $"cents").as("wc"))
        val wide = g.groupBy($"replicate")
          .agg(min(when($"arm" === 0L, $"wn")).as("wn0"),
            min(when($"arm" === 1L, $"wn")).as("wn1"),
            min(when($"arm" === 0L, $"wc")).as("wc0"),
            min(when($"arm" === 1L, $"wc")).as("wc1"))
          .withColumn("diff_x100", expr(
            "wc1 * 100L div greatest(wn1, 1L) " +
              "- wc0 * 100L div greatest(wn0, 1L)"))
        wide
          .withColumn("rk", row_number().over(
            Window.orderBy($"diff_x100", $"replicate")))
          .withColumn("in_ci94", $"rk" >= 2L && $"rk" <= 31L)
          .select($"replicate", $"wn0", $"wn1", $"diff_x100",
            $"rk".cast(LongType).as("rk"), $"in_ci94")
          .orderBy($"replicate")
      },
      oracle = Some("""
        WITH bo_c AS (
          SELECT user_id,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        bo_p AS (
          SELECT u.user_id, COALESCE(c.cents, 0) AS cents,
                 ('0x' || substring(md5(CAST(u.user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM (SELECT DISTINCT user_id FROM events) u
          LEFT JOIN bo_c c USING (user_id)),
        bo_r AS (
          SELECT p.*, r.r AS replicate,
                 ('0x' || substring(md5(CAST(p.user_id AS VARCHAR)
                   || ':' || CAST(r.r AS VARCHAR)), 1, 8))
                   ::BIGINT % 1000000 AS u
          FROM bo_p p CROSS JOIN range(0, 32) r(r)),
        bo_w AS (
          SELECT replicate, arm, cents,
                 CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                      WHEN u < 996340 THEN 4 ELSE 5 END AS w
          FROM bo_r),
        bo_g AS (
          SELECT replicate, arm, CAST(sum(w) AS BIGINT) AS wn,
                 CAST(sum(w * cents) AS BIGINT) AS wc
          FROM bo_w GROUP BY 1, 2),
        bo_d AS (
          SELECT replicate,
                 min(CASE WHEN arm = 0 THEN wn END) AS wn0,
                 min(CASE WHEN arm = 1 THEN wn END) AS wn1,
                 min(CASE WHEN arm = 0 THEN wc END) AS wc0,
                 min(CASE WHEN arm = 1 THEN wc END) AS wc1
          FROM bo_g GROUP BY 1),
        bo_f AS (
          SELECT replicate, wn0, wn1,
                 wc1 * 100 // greatest(wn1, 1)
                   - wc0 * 100 // greatest(wn0, 1) AS diff_x100
          FROM bo_d),
        bo_k AS (
          SELECT *, CAST(row_number() OVER (ORDER BY diff_x100, replicate)
                   AS BIGINT) AS rk
          FROM bo_f)
        SELECT replicate, wn0, wn1, diff_x100, rk,
               rk >= 2 AND rk <= 31 AS in_ci94
        FROM bo_k ORDER BY replicate"""),
      desc = "Poisson bootstrap: derandomized per-row weights, 32-replicate percentile CI"),

    // ── quantile treatment effects (beyond-the-mean readout) ────────
    // The distributional companion to e_ab_test/e_ab_cuped: a launch
    // that moves the p75 while gutting the p25 averages to "no
    // effect" — QTE reads the shift at each quantile separately
    // (Athey & Imbens 2017's heterogeneity lens). Per-arm exact
    // type-1 quantiles (p25/50/75) of per-user purchase cents via the
    // histogram+threshold machinery (a_quantile_weighted's shape at
    // weight 1): the cumsum window runs over DISTINCT cents values
    // per arm — bounded by the value domain, not user count — and the
    // all-integer threshold pick is interpolation-free, so both
    // engines agree bit-for-bit. One user_id shuffle + a 2-row pivot;
    // output unpivots to one row per quantile.
    "e_qte" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val conv = e.filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(sum(round($"value" * 100).cast(LongType)).as("cents"))
        val per = e.select($"user_id").distinct()
          .join(conv, Seq("user_id"), "left")
          .withColumn("cents", coalesce($"cents", lit(0L)))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val cum = per.groupBy($"arm", $"cents")
          .agg(count(lit(1)).as("wm"))
          .withColumn("cw", sum($"wm").over(
            Window.partitionBy($"arm").orderBy($"cents")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("tw", sum($"wm").over(
            Window.partitionBy($"arm").rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
        def q(pPpm: Long) =
          min(when($"cw" * 1000000L >= lit(pPpm) * $"tw", $"cents"))
        val acc = cum.groupBy($"arm")
          .agg(max($"tw").as("n_users"), q(250000L).as("q25"),
            q(500000L).as("q50"), q(750000L).as("q75"))
        def pick(a: Long, c: String) = min(when($"arm" === a, col(c)))
        acc.agg(
            pick(0L, "n_users").as("n0"), pick(1L, "n_users").as("n1"),
            pick(0L, "q25").as("q25_0"), pick(1L, "q25").as("q25_1"),
            pick(0L, "q50").as("q50_0"), pick(1L, "q50").as("q50_1"),
            pick(0L, "q75").as("q75_0"), pick(1L, "q75").as("q75_1"))
          .selectExpr("n0", "n1",
            "stack(3, 'p25', q25_0, q25_1, 'p50', q50_0, q50_1, " +
              "'p75', q75_0, q75_1) AS (quantile, arm0_cents, arm1_cents)")
          .withColumn("qte_cents", $"arm1_cents" - $"arm0_cents")
          .select($"quantile", $"n0", $"n1", $"arm0_cents",
            $"arm1_cents", $"qte_cents")
          .orderBy($"quantile")
      },
      oracle = Some("""
        WITH qt_c AS (
          SELECT user_id,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        qt_p AS (
          SELECT u.user_id, COALESCE(c.cents, 0) AS cents,
                 ('0x' || substring(md5(CAST(u.user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM (SELECT DISTINCT user_id FROM events) u
          LEFT JOIN qt_c c USING (user_id)),
        qt_h AS (
          SELECT arm, cents, count(*) AS wm FROM qt_p GROUP BY 1, 2),
        qt_cu AS (
          SELECT arm, cents,
                 CAST(sum(wm) OVER (PARTITION BY arm ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
                 CAST(sum(wm) OVER (PARTITION BY arm) AS BIGINT) AS tw
          FROM qt_h),
        qt_a AS (
          SELECT arm, max(tw) AS n_users,
                 min(CASE WHEN cw * 1000000 >= 250000 * tw
                          THEN cents END) AS q25,
                 min(CASE WHEN cw * 1000000 >= 500000 * tw
                          THEN cents END) AS q50,
                 min(CASE WHEN cw * 1000000 >= 750000 * tw
                          THEN cents END) AS q75
          FROM qt_cu GROUP BY arm),
        qt_w AS (
          SELECT
            min(CASE WHEN arm = 0 THEN n_users END) AS n0,
            min(CASE WHEN arm = 1 THEN n_users END) AS n1,
            min(CASE WHEN arm = 0 THEN q25 END) AS q25_0,
            min(CASE WHEN arm = 1 THEN q25 END) AS q25_1,
            min(CASE WHEN arm = 0 THEN q50 END) AS q50_0,
            min(CASE WHEN arm = 1 THEN q50 END) AS q50_1,
            min(CASE WHEN arm = 0 THEN q75 END) AS q75_0,
            min(CASE WHEN arm = 1 THEN q75 END) AS q75_1
          FROM qt_a)
        SELECT 'p25' AS quantile, n0, n1, q25_0 AS arm0_cents,
               q25_1 AS arm1_cents, q25_1 - q25_0 AS qte_cents
        FROM qt_w
        UNION ALL
        SELECT 'p50', n0, n1, q50_0, q50_1, q50_1 - q50_0 FROM qt_w
        UNION ALL
        SELECT 'p75', n0, n1, q75_0, q75_1, q75_1 - q75_0 FROM qt_w
        ORDER BY quantile"""),
      desc = "quantile treatment effect: exact per-arm p25/50/75 shifts"),

    // ── difference-in-differences (the causal panel readout) ────────
    // e_ab_test's sibling for launches without randomization-time
    // logging: md5-hash arms × pre/post periods (split at the
    // observed mid-day from a broadcast 1-row extent), per-cell
    // revenue-per-active-user ×100, and the DiD estimate
    // (Δtreated − Δcontrol) — the parallel-trends counterfactual.
    // Sum and distinct-user counts run as SEPARATE passes joined on
    // the 4-row cell key (the Expand-avoidance rule); the pivot is a
    // conditional agg over 4 rows.
    "e_stickiness" -> Q(
      // ── DAU/MAU stickiness, EXACT at any scale ────────────────────
      // The engagement ratio every product dashboard carries, computed
      // the mergeable-partial way: daily 32-bit user-bitmap words
      // (the a_bitmap_distinct partial), each day-word contributing to
      // the ≤30 window days it covers through a bounded range join
      // against the tiny distinct-days frame (broadcast), OR-merged
      // per (window day, word), popcounted. No 30× event replay, no
      // approximate sketch, no Expand — DAU counts a pre-distinct
      // frame. The oracle is the definitional 30-day distinct count.
      fn = (s, dir) => {
        import s.implicits._
        val du = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"),
            $"user_id")
          .distinct()
        val words = du.withColumn("word", expr("user_id div 32"))
          .groupBy($"day", $"word")
          .agg(bit_or(expr("shiftleft(1L, cast(user_id % 32 as int))"))
            .as("m"))
        val days = du.select($"day".as("rday")).distinct()
        val mau = words
          .join(broadcast(days),
            $"rday" >= $"day" && $"rday" <= $"day" + 29L)
          .groupBy($"rday", $"word").agg(bit_or($"m").as("mm"))
          .groupBy($"rday")
          .agg(sum(bit_count($"mm")).cast(LongType).as("mau"))
        val dau = du.groupBy($"day").agg(count(lit(1)).as("dau"))
        dau.join(mau, $"day" === $"rday")
          .select($"day", $"dau", $"mau",
            expr("dau * 1000000L div mau").as("stickiness_ppm"))
          .orderBy($"day")
      },
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT (epoch_us(ts)//1000000)//86400 AS day, user_id
          FROM events),
        days AS (SELECT DISTINCT day FROM d),
        dau AS (SELECT day, count(DISTINCT user_id) AS dau
                FROM d GROUP BY 1),
        mau AS (
          SELECT dd.day, count(DISTINCT d.user_id) AS mau
          FROM days dd JOIN d ON d.day BETWEEN dd.day - 29 AND dd.day
          GROUP BY 1)
        SELECT a.day, a.dau, m.mau,
               a.dau * CAST(1000000 AS BIGINT) // m.mau AS stickiness_ppm
        FROM dau a JOIN mau m ON m.day = a.day
        ORDER BY a.day"""),
      desc = "DAU/MAU stickiness: exact 30-day rolling distinct via bitmap words"),

    "e_did" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val ext = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"))
          .agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val e = ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            when($"event_type" === "purchase",
              round($"value" * 100).cast(LongType)).otherwise(0L)
              .as("cents"))
          .crossJoin(broadcast(ext))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
          .withColumn("period",
            when($"day" < $"mid", "pre").otherwise("post"))
        val rev = e.groupBy($"arm", $"period")
          .agg(sum($"cents").as("cents"))
        val usr = e.select($"arm", $"period", $"user_id").distinct()
          .groupBy($"arm", $"period").agg(count(lit(1)).as("users"))
        val cells = rev.join(usr, Seq("arm", "period"))
          .withColumn("avg_x100", expr("cents * 100L div users"))
        def cell(a: Long, p: String) =
          min(when($"arm" === a && $"period" === p, $"avg_x100"))
        cells.agg(
            cell(0L, "pre").as("c_pre_x100"),
            cell(0L, "post").as("c_post_x100"),
            cell(1L, "pre").as("t_pre_x100"),
            cell(1L, "post").as("t_post_x100"))
          .withColumn("did_x100",
            ($"t_post_x100" - $"t_pre_x100")
              - ($"c_post_x100" - $"c_pre_x100"))
          .orderBy($"did_x100")
      },
      oracle = Some("""
        WITH d AS (
          SELECT user_id, (epoch_us(ts)//1000000)//86400 AS day,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value*100) AS BIGINT)
                      ELSE 0 END AS cents
          FROM events),
        m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM d),
        e AS (
          SELECT d.*,
                 ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm,
                 CASE WHEN d.day < m.mid THEN 'pre' ELSE 'post' END
                   AS period
          FROM d CROSS JOIN m),
        rev AS (
          SELECT arm, period, CAST(sum(cents) AS BIGINT) AS cents
          FROM e GROUP BY 1, 2),
        usr AS (
          SELECT arm, period, count(*) AS users FROM (
            SELECT DISTINCT arm, period, user_id FROM e)
          GROUP BY 1, 2),
        cells AS (
          SELECT r.arm, r.period, r.cents * 100 // u.users AS avg_x100
          FROM rev r JOIN usr u USING (arm, period)),
        px AS (
          SELECT
            min(CASE WHEN arm = 0 AND period = 'pre' THEN avg_x100 END)
              AS c_pre_x100,
            min(CASE WHEN arm = 0 AND period = 'post' THEN avg_x100 END)
              AS c_post_x100,
            min(CASE WHEN arm = 1 AND period = 'pre' THEN avg_x100 END)
              AS t_pre_x100,
            min(CASE WHEN arm = 1 AND period = 'post' THEN avg_x100 END)
              AS t_post_x100
          FROM cells)
        SELECT c_pre_x100, c_post_x100, t_pre_x100, t_post_x100,
               (t_post_x100 - t_pre_x100) - (c_post_x100 - c_pre_x100)
                 AS did_x100
        FROM px ORDER BY did_x100"""),
      desc = "difference-in-differences: arm x period cells + DiD estimate"),

    // ── Herfindahl concentration index (log-free diversity) ─────────
    // How concentrated is each stream across users? HHI = Σ share²,
    // the antitrust/market-concentration measure and the log-free
    // stand-in for entropy diversity (1 − HHI = Gini impurity): in
    // ppm, hhi = Σ n_u² · 1e6 div n² — exact integers, two map-side-
    // combined aggs (per-(stream, user) counts, then per-stream sum
    // of squares). 1e6/HHI ≈ effective participant count. n_u² · 1e6
    // holds to n_u ~ 3e6 rows per user; past that shares pre-scale
    // to ppm (documented, not needed at driver SF).
    "a_hhi" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val per = ev(s, dir)
          .groupBy($"event_type", $"user_id")
          .agg(count(lit(1)).as("n_u"))
        per.groupBy($"event_type")
          .agg(sum($"n_u").as("n"),
            count(lit(1)).as("n_users"),
            sum($"n_u" * $"n_u").as("ss"))
          .withColumn("hhi_ppm", expr("ss * 1000000L div (n * n)"))
          .withColumn("effective_users", expr(
            "CASE WHEN hhi_ppm > 0 THEN 1000000L div hhi_ppm ELSE 0L END"))
          .select($"event_type", $"n", $"n_users", $"hhi_ppm",
            $"effective_users")
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH per AS (
          SELECT event_type, user_id, count(*) AS n_u
          FROM events GROUP BY 1, 2),
        agg AS (
          SELECT event_type,
                 CAST(sum(n_u) AS BIGINT) AS n,
                 count(*) AS n_users,
                 CAST(sum(n_u * n_u) AS BIGINT) AS ss
          FROM per GROUP BY 1)
        SELECT event_type, n, n_users,
               ss * 1000000 // (n * n) AS hhi_ppm,
               CASE WHEN ss * 1000000 // (n * n) > 0
                    THEN 1000000 // (ss * 1000000 // (n * n))
                    ELSE 0 END AS effective_users
        FROM agg ORDER BY event_type"""),
      desc = "Herfindahl concentration ppm + effective participant count"),

    // ── seasonal-naive forecast backtest (MAE readout) ──────────────
    // The capacity-planning baseline every metrics team runs first:
    // forecast tomorrow's volume as last week's same-day (lag-7) and
    // as yesterday's (lag-1), then backtest both over the observed
    // days — per stream, the mean absolute error ×100 of each and
    // which baseline wins. The daily frame is (types × days)-sized at
    // ANY corpus scale; the lag joins are self-joins on that tiny
    // frame (join on day−7, not a window lag — day gaps must MISS,
    // not slide to the previous present day).
    "e_forecast_baseline" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .select($"event_type",
            (epochS($"ts") / 86400L).cast(LongType).as("day"))
          .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
        val p7 = daily.select($"event_type", ($"day" + 7L).as("day"),
          $"n".as("pred7"))
        val p1 = daily.select($"event_type", ($"day" + 1L).as("day"),
          $"n".as("pred1"))
        daily.join(p7, Seq("event_type", "day"))
          .join(p1, Seq("event_type", "day"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(abs($"n" - $"pred7")).as("abs_err_seasonal"),
            sum(abs($"n" - $"pred1")).as("abs_err_naive"))
          .withColumn("mae7_x100",
            expr("abs_err_seasonal * 100L div n_days"))
          .withColumn("mae1_x100", expr("abs_err_naive * 100L div n_days"))
          .withColumn("seasonal_wins",
            $"abs_err_seasonal" < $"abs_err_naive")
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type, (epoch_us(ts)//1000000)//86400 AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        j AS (
          SELECT d.event_type, d.n, p7.n AS pred7, p1.n AS pred1
          FROM daily d
          JOIN daily p7 ON p7.event_type = d.event_type
                       AND p7.day = d.day - 7
          JOIN daily p1 ON p1.event_type = d.event_type
                       AND p1.day = d.day - 1),
        agg AS (
          SELECT event_type, count(*) AS n_days,
                 CAST(sum(abs(n - pred7)) AS BIGINT) AS abs_err_seasonal,
                 CAST(sum(abs(n - pred1)) AS BIGINT) AS abs_err_naive
          FROM j GROUP BY 1)
        SELECT event_type, n_days, abs_err_seasonal, abs_err_naive,
               abs_err_seasonal * 100 // n_days AS mae7_x100,
               abs_err_naive * 100 // n_days AS mae1_x100,
               abs_err_seasonal < abs_err_naive AS seasonal_wins
        FROM agg ORDER BY event_type"""),
      desc = "lag-7 vs lag-1 volume forecast backtest with integer MAE"),

    // ── gaps and islands: consecutive-day activity runs ─────────────
    // The canonical streak operator (subscription/engagement runs —
    // the grouping e_user_lifecycle's states summarize, here surfaced
    // as intervals): distinct active days per user, island id =
    // day − row_number() (constant exactly across a consecutive run),
    // then min/max/count per island. One user_id exchange; per-user
    // state is the distinct-day list (the sessionize bound).
    "w_gaps_islands" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val days = ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"))
          .distinct()
        val w = Window.partitionBy($"user_id").orderBy($"day")
        days.withColumn("grp", $"day" - row_number().over(w))
          .groupBy($"user_id", $"grp")
          .agg(min($"day").as("start_day"), max($"day").as("end_day"),
            count(lit(1)).as("len_days"))
          .select($"user_id", $"start_day", $"end_day", $"len_days")
          .orderBy($"user_id", $"start_day")
      },
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT user_id,
                 (epoch_us(ts)//1000000)//86400 AS day
          FROM events),
        g AS (
          SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id
                   ORDER BY day) AS grp
          FROM d)
        SELECT user_id, min(day) AS start_day, max(day) AS end_day,
               count(*) AS len_days
        FROM g GROUP BY user_id, grp
        ORDER BY user_id, start_day"""),
      desc = "gaps-and-islands: consecutive-day streak intervals per user"),

    "a_quantile_weighted" -> Q(
      // ── exact WEIGHTED quantiles (type-1) ─────────────────────────
      // The quantity-weighted price percentile a revenue dashboard
      // needs (unweighted quantiles treat a 1-unit and a 50-unit line
      // the same): collapse to the (value, weight-mass) histogram
      // FIRST (the mta_m8 rule — the window then runs over distinct
      // values, not rows), cumulative mass per group, and the p-th
      // quantile is the smallest value whose cumulative mass reaches
      // p·total (all-integer threshold — no interpolation, so both
      // engines agree bit-for-bit). At extreme cardinality the
      // histogram cumsum shifts to the shardAssign two-level bucket
      // pattern; group count bounds the window partitions here.
      fn = (s, dir) => {
        import s.implicits._
        val hist = Sources.table(s, dir, "lineitem")
          .select($"l_returnflag".as("grp"),
            round($"l_extendedprice" * 100).cast(LongType).as("cents"),
            round($"l_quantity").cast(LongType).as("w"))
          .groupBy($"grp", $"cents").agg(sum($"w").as("wm"))
        val cum = hist
          .withColumn("cw", sum($"wm").over(
            Window.partitionBy($"grp").orderBy($"cents")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("tw", sum($"wm").over(
            Window.partitionBy($"grp").rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
        def q(pPpm: Long) =
          min(when($"cw" * 1000000L >= lit(pPpm) * $"tw", $"cents"))
        cum.groupBy($"grp")
          .agg(max($"tw").as("total_w"),
            q(500000L).as("p50_cents"),
            q(900000L).as("p90_cents"))
          .orderBy($"grp")
      },
      oracle = Some("""
        WITH b AS (
          SELECT l_returnflag AS grp,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(round(l_quantity) AS BIGINT) AS w
          FROM lineitem),
        h AS (
          SELECT grp, cents, CAST(sum(w) AS BIGINT) AS wm
          FROM b GROUP BY 1, 2),
        c AS (
          SELECT grp, cents, wm,
                 CAST(sum(wm) OVER (PARTITION BY grp ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
                 CAST(sum(wm) OVER (PARTITION BY grp) AS BIGINT) AS tw
          FROM h)
        SELECT grp, max(tw) AS total_w,
               min(CASE WHEN cw * 1000000 >= 500000 * tw
                        THEN cents END) AS p50_cents,
               min(CASE WHEN cw * 1000000 >= 900000 * tw
                        THEN cents END) AS p90_cents
        FROM c GROUP BY grp ORDER BY grp"""),
      desc = "exact weighted quantiles: (value, mass) histogram + threshold"),

    "a_mad" -> Q(
      // ── median absolute deviation (robust spread) ─────────────────
      // The robust-stats member beside a_outliers/a_winsorize (stddev
      // explodes on one fat-finger row; MAD doesn't): type-1 median
      // via the histogram+threshold machinery (a_quantile_weighted's
      // shape at weight 1), then the MAD pass re-weights the SAME
      // (grp, cents) histogram — |cents − median| only depends on the
      // histogram key, so deviation masses are sums of cents masses
      // and the raw rows are never touched twice. The median rides
      // the dev aggregation as a carried constant (min of a per-grp
      // constant), so the median subtree is referenced ONCE: the old
      // shape planned the full window pyramid three times (dev input,
      // broadcast side, final join — 18 Exchanges, r16 opt round;
      // 3.76 s → see OPTIMIZATION_r16.md) and re-aggregated raw rows
      // for the dev histogram. Exact, interpolation-free,
      // bit-identical across engines; oracle unchanged.
      fn = (s, dir) => {
        import s.implicits._
        def cum(df: org.apache.spark.sql.DataFrame, vCol: String) = df
          .withColumn("cw", sum($"wm").over(
            Window.partitionBy($"grp").orderBy(col(vCol))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("tw", sum($"wm").over(
            Window.partitionBy($"grp").rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
        val hist = Sources.table(s, dir, "lineitem")
          .select($"l_returnflag".as("grp"),
            round($"l_extendedprice" * 100).cast(LongType).as("cents"))
          .groupBy($"grp", $"cents").agg(count(lit(1)).as("wm"))
        val med = cum(hist, "cents").groupBy($"grp")
          .agg(min(when($"cw" * 2L >= $"tw", $"cents")).as("median_cents"))
        val devHist = hist.join(broadcast(med), Seq("grp"))
          .withColumn("dev", abs($"cents" - $"median_cents"))
          .groupBy($"grp", $"dev")
          .agg(sum($"wm").as("wm"), min($"median_cents").as("median_cents"))
        cum(devHist, "dev").groupBy($"grp")
          .agg(min($"median_cents").as("median_cents"),
            min(when($"cw" * 2L >= $"tw", $"dev")).as("mad_cents"))
          .select($"grp", $"median_cents", $"mad_cents")
          .orderBy($"grp")
      },
      oracle = Some("""
        WITH b AS (
          SELECT l_returnflag AS grp,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem),
        h1 AS (SELECT grp, cents, count(*) AS wm FROM b GROUP BY 1, 2),
        c1 AS (
          SELECT grp, cents,
                 CAST(sum(wm) OVER (PARTITION BY grp ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
                 CAST(sum(wm) OVER (PARTITION BY grp) AS BIGINT) AS tw
          FROM h1),
        med AS (
          SELECT grp, min(CASE WHEN cw * 2 >= tw THEN cents END)
                   AS median_cents
          FROM c1 GROUP BY grp),
        d AS (
          SELECT b.grp, abs(b.cents - m.median_cents) AS dev
          FROM b JOIN med m ON m.grp = b.grp),
        h2 AS (SELECT grp, dev, count(*) AS wm FROM d GROUP BY 1, 2),
        c2 AS (
          SELECT grp, dev,
                 CAST(sum(wm) OVER (PARTITION BY grp ORDER BY dev
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
                 CAST(sum(wm) OVER (PARTITION BY grp) AS BIGINT) AS tw
          FROM h2),
        mad AS (
          SELECT grp, min(CASE WHEN cw * 2 >= tw THEN dev END)
                   AS mad_cents
          FROM c2 GROUP BY grp)
        SELECT m.grp, m.median_cents, a.mad_cents
        FROM med m JOIN mad a ON a.grp = m.grp
        ORDER BY m.grp"""),
      desc = "median absolute deviation: histogram-threshold medians, two passes"),

    // ── winsorized robust aggregates (outlier-clipped means) ────────
    // The preprocessing twin of dq_anomaly's detection: per stream,
    // clip cents at the exact p05/p95 (interpolated percentile — the
    // a9_quantiles determinism precedent; thresholds ROUND to integer
    // cents so the clipped sum stays an exact long, never an
    // order-dependent double sum), report how many rows each side
    // clipped and the winsorized mean ×100. Two passes over a
    // map-side-combined frame + a broadcast threshold row per group.
    "a_winsorize" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val e = ev(s, dir).select($"event_type",
          round($"value" * 100).cast(LongType).as("cents"))
        val th = e.groupBy($"event_type")
          .agg(round(percentile($"cents", lit(0.05))).cast(LongType)
              .as("lo"),
            round(percentile($"cents", lit(0.95))).cast(LongType)
              .as("hi"))
        e.join(broadcast(th), Seq("event_type"))
          .withColumn("w",
            when($"cents" < $"lo", $"lo")
              .when($"cents" > $"hi", $"hi").otherwise($"cents"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            min($"lo").as("lo_cents"), min($"hi").as("hi_cents"),
            count(when($"cents" < $"lo", 1)).as("n_clip_lo"),
            count(when($"cents" > $"hi", 1)).as("n_clip_hi"),
            sum($"w").as("sum_wins"))
          .withColumn("mean_wins_x100", expr("sum_wins * 100L div n"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
          FROM events),
        th AS (
          SELECT event_type,
                 CAST(round(quantile_cont(cents, 0.05)) AS BIGINT) AS lo,
                 CAST(round(quantile_cont(cents, 0.95)) AS BIGINT) AS hi
          FROM e GROUP BY 1),
        c AS (
          SELECT e.event_type, e.cents, th.lo, th.hi,
                 CASE WHEN e.cents < th.lo THEN th.lo
                      WHEN e.cents > th.hi THEN th.hi
                      ELSE e.cents END AS w
          FROM e JOIN th USING (event_type))
        SELECT event_type, count(*) AS n,
               min(lo) AS lo_cents, min(hi) AS hi_cents,
               count(CASE WHEN cents < lo THEN 1 END) AS n_clip_lo,
               count(CASE WHEN cents > hi THEN 1 END) AS n_clip_hi,
               CAST(sum(w) AS BIGINT) AS sum_wins,
               CAST(sum(w) AS BIGINT) * 100 // count(*) AS mean_wins_x100
        FROM c GROUP BY event_type ORDER BY event_type"""),
      desc = "winsorized means: p05/p95 integer clipping with clip counts"),

    // ── cohorted-LTV triangle (the revenue face of e_retention) ─────
    // Per signup cohort (first-seen day, assigned by the SAME
    // unbounded min-window-over-user_id shape the e_retention fix
    // mandates — no users-sized broadcast), purchase revenue by
    // cohort age, the running cumulative, and LTV-per-user ×100.
    // The (cohort × age) frame is tiny at any corpus scale, so the
    // cumulative window partitioned by cohort is bounded; cohort
    // sizes come from a second agg on the per-user frame joined on
    // the cohort key.
    "e_ltv_cohorts" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val wAll = Window.partitionBy($"user_id")
        val e = ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            when($"event_type" === "purchase",
              round($"value" * 100).cast(LongType)).otherwise(0L)
              .as("cents"))
          .withColumn("cohort_day", min($"day").over(wAll))
        // sum and distinct-count run as SEPARATE passes joined on the
        // tiny (cohort, age) key — one agg mixing them would Expand
        // every event row ×2 through the shuffle (the CLAUDE.md
        // sketch-mixing rule's plain-aggregate form)
        val rev = e.groupBy($"cohort_day", ($"day" - $"cohort_day").as("age"))
          .agg(sum($"cents").as("rev_cents"))
        val act = e.select($"cohort_day", ($"day" - $"cohort_day").as("age"),
            $"user_id").distinct()
          .groupBy($"cohort_day", $"age")
          .agg(count(lit(1)).as("n_active"))
        val tri = rev.join(act, Seq("cohort_day", "age"))
        val sizes = e.select($"user_id", $"cohort_day").distinct()
          .groupBy($"cohort_day").agg(count(lit(1)).as("cohort_users"))
        val wCum = Window.partitionBy($"cohort_day").orderBy($"age")
          .rowsBetween(Window.unboundedPreceding, 0)
        tri.join(broadcast(sizes), Seq("cohort_day"))
          .withColumn("cum_cents", sum($"rev_cents").over(wCum))
          .withColumn("ltv_x100", expr("cum_cents * 100L div cohort_users"))
          .select($"cohort_day", $"age", $"rev_cents", $"n_active",
            $"cum_cents", $"cohort_users", $"ltv_x100")
          .orderBy($"cohort_day", $"age")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, (epoch_us(ts)//1000000)//86400 AS day,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value*100) AS BIGINT)
                      ELSE 0 END AS cents
          FROM events),
        c AS (
          SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day
          FROM e),
        tri AS (
          SELECT cohort_day, day - cohort_day AS age,
                 CAST(sum(cents) AS BIGINT) AS rev_cents,
                 count(DISTINCT user_id) AS n_active
          FROM c GROUP BY 1, 2),
        sizes AS (
          SELECT cohort_day, count(*) AS cohort_users FROM (
            SELECT DISTINCT user_id, cohort_day FROM c)
          GROUP BY 1),
        cum AS (
          SELECT t.*, s.cohort_users,
                 CAST(sum(t.rev_cents) OVER (PARTITION BY t.cohort_day
                   ORDER BY t.age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_cents
          FROM tri t JOIN sizes s USING (cohort_day))
        SELECT cohort_day, age, rev_cents, n_active, cum_cents,
               cohort_users,
               cum_cents * 100 // cohort_users AS ltv_x100
        FROM cum ORDER BY cohort_day, age"""),
      desc = "cohort LTV triangle: revenue by age + cumulative per-user value"),

    // ── Markov transition counts ────────────────────────────────────
    // Per-user event-type transition matrix (the "what happens after
    // X" product question; generalizes the reference's stop-to-stop
    // sequencing, models/fact_trips_stops.sql:100-118). One lead()
    // window per user then a global count agg — no self-join, so the
    // event table shuffles once on user_id and once on the 49-row
    // transition key space (map-side combined to almost nothing).
    "e_transitions" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"es", $"event_id")
        ev(s, dir)
          .select($"user_id", $"event_id", $"event_type",
            epochS($"ts").as("es"))
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .withColumn("gap_s", lead($"es", 1).over(w) - $"es")
          .filter($"next_type".isNotNull)
          .groupBy($"event_type", $"next_type")
          .agg(count(lit(1)).as("n"),
               min($"gap_s").as("min_gap_s"),
               max($"gap_s").as("max_gap_s"),
               sum($"gap_s").as("sum_gap_s"))
          .orderBy($"event_type", $"next_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type,
                 epoch_us(ts)//1000000 AS es
          FROM events),
        led AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY es ASC, event_id ASC) AS next_type,
                 lead(es) OVER (PARTITION BY user_id
                   ORDER BY es ASC, event_id ASC) - es AS gap_s
          FROM e)
        SELECT event_type, next_type, count(*) AS n,
               min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s,
               CAST(sum(gap_s) AS BIGINT) AS sum_gap_s
        FROM led WHERE next_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      desc = "event-type transition matrix: lead window + global count agg"),

    // ── time-weighted average ───────────────────────────────────────
    // The IoT/finance staple a plain AVG gets wrong: each event's
    // value holds until the next event, so the mean must weight by
    // holding time. One lead window per user (same single user_id
    // shuffle as sessionize) then a map-side-combined agg; all mass
    // arithmetic in exact cents·seconds, one div at the end.
    "a_time_weighted" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"es", $"event_id")
        ev(s, dir)
          .select($"user_id", $"event_id", epochS($"ts").as("es"),
            round($"value" * 100).cast(LongType).as("cents"))
          .withColumn("gap", coalesce(lead($"es", 1).over(w) - $"es", lit(0L)))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"),
               (max($"es") - min($"es")).as("span_s"),
               sum($"cents" * $"gap").as("mass"))
          .filter($"span_s" > 0)
          // floorDivPos, not `div`: mass goes negative on refund-style
          // negative values; BOTH engines truncate toward zero
          // natively (Spark div, DuckDB v1.0.0 //), so both sides
          // carry the explicit floor adjustment. span_s > 0 above.
          .select($"user_id", $"n", $"span_s",
            floorDivPos($"mass", $"span_s").as("twa_cents"))
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts)//1000000 AS es,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events),
        led AS (
          SELECT user_id, es, cents,
                 COALESCE(lead(es) OVER (PARTITION BY user_id
                   ORDER BY es ASC, event_id ASC) - es, 0) AS gap
          FROM e),
        agg AS (
          SELECT user_id, count(*) AS n,
                 max(es) - min(es) AS span_s,
                 CAST(sum(cents * gap) AS BIGINT) AS mass
          FROM led GROUP BY 1)
        -- DuckDB integer // truncates toward zero (v1.0.0); adjust to
        -- floor exactly as the Spark side's BqCompat.floorDivPos, so
        -- the twins agree when mass nets negative (refund-style)
        SELECT user_id, n, span_s,
               mass // span_s - CASE WHEN mass < 0 AND mass % span_s <> 0
                                THEN 1 ELSE 0 END AS twa_cents
        FROM agg WHERE span_s > 0 ORDER BY user_id"""),
      desc = "time-weighted average: hold-until-next weighting in cents·seconds"),

    // ── contingency table + independence deviation ──────────────────
    // The statistical-QA operator for a release dashboard: observed
    // (event_type × day-of-week) cell counts vs the independence
    // expectation, with the chi-square cell contribution in exact
    // scaled integers (centi-counts / milli units — no float enters
    // the hash). Row/col/grand totals come from windows over the
    // already-aggregated 35-cell frame, so the single-partition
    // global window is over a constant-size input at any SF.
    // exp_centi is clamped to ≥ 1 in BOTH engines: a skewed cell with
    // rt·ct < gt/100 floors to 0, where Spark `div` yields NULL but
    // DuckDB `//` raises — the clamp keeps the twins aligned and the
    // division defined. Bound: (obs·100 − exp)² needs obs ≲ 3e8 rows
    // per cell to stay in Long; past that, drop the centi/milli
    // scaling (chi² tolerates unit precision at that magnitude).
    "a_contingency" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val cells = ev(s, dir)
          .withColumn("dow", dayofweek(timestamp_seconds(epochS($"ts"))))
          .groupBy($"event_type", $"dow")
          .agg(count(lit(1)).as("obs"))
        cells
          .withColumn("rt", sum($"obs").over(
            Window.partitionBy($"event_type")))
          .withColumn("ct", sum($"obs").over(Window.partitionBy($"dow")))
          .withColumn("gt", sum($"obs").over(Window.partitionBy()))
          .withColumn("exp_centi",
            expr("greatest(rt * ct * 100 div gt, bigint(1))"))
          .withColumn("chi_milli", expr(
            "(obs * 100 - exp_centi) * (obs * 100 - exp_centi) * 10 div exp_centi"))
          .select($"event_type", $"dow", $"obs", $"exp_centi", $"chi_milli")
          .orderBy($"event_type", $"dow")
      },
      oracle = Some("""
        WITH cells AS (
          SELECT event_type,
                 dayofweek(make_timestamp(
                   (epoch_us(ts)//1000000) * 1000000)) + 1 AS dow,
                 count(*) AS obs
          FROM events GROUP BY 1, 2),
        tot AS (
          SELECT event_type, dow, obs,
                 CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
                 CAST(sum(obs) OVER (PARTITION BY dow) AS BIGINT) AS ct,
                 CAST(sum(obs) OVER () AS BIGINT) AS gt
          FROM cells),
        ex AS (
          SELECT event_type, dow, obs,
                 greatest(rt * ct * 100 // gt, 1) AS exp_centi
          FROM tot)
        SELECT event_type, dow, obs, exp_centi,
               (obs * 100 - exp_centi) * (obs * 100 - exp_centi) * 10
                 // exp_centi AS chi_milli
        FROM ex ORDER BY event_type, dow"""),
      desc = "contingency cells vs independence: integer chi-square contributions"),

    // ── z-score outlier detection without sqrt ──────────────────────
    // Per-group 3σ outliers in EXACT integer arithmetic: the test
    // (x − mean)² > 9·var needs no square root, so no float touches
    // the hash; mean/var come from the (sum, sumsq, n) moments (one
    // map-side-combined pass, quantized by floor div — deterministic
    // in both engines). Stats frame is groups-sized → broadcast back
    // into the scan. sumsq is cents² — fits long through ~1e16 rows
    // per group; beyond that re-center on a first-pass group mean
    // before squaring (same two-pass shape).
    "a_outliers" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = ev(s, dir)
          .select($"event_type",
            round($"value" * 100).cast(LongType).as("cents"))
        val stats = base.groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
               sum($"cents" * $"cents").as("s2"))
          // mean_c via floorDivPos, with the SAME explicit floor
          // adjustment spelled out in the oracle (DuckDB's integer //
          // truncates toward zero, v1.0.0 — both engines must floor
          // for a negative s). s2 ≥ 0 always, plain div is safe.
          .withColumn("mean_c", floorDivPos($"s", $"n"))
          .withColumn("var_c2", expr("s2 div n - mean_c * mean_c"))
        base.join(broadcast(stats), Seq("event_type"))
          .withColumn("dev", $"cents" - $"mean_c")
          .withColumn("is_out",
            when($"dev" * $"dev" > $"var_c2" * 9L, 1L).otherwise(0L))
          .groupBy($"event_type")
          .agg(min($"n").as("n"), min($"mean_c").as("mean_c"),
               min($"var_c2").as("var_c2"),
               sum($"is_out").as("n_out"),
               max(abs($"dev")).as("max_abs_dev"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH base AS (
          SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
          FROM events),
        stats AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(cents) AS BIGINT) AS s,
                 CAST(sum(cents * cents) AS BIGINT) AS s2
          FROM base GROUP BY 1),
        stm AS (
          -- floor-adjusted mean: DuckDB // truncates toward zero
          SELECT *, s // n - CASE WHEN s < 0 AND s % n <> 0
                             THEN 1 ELSE 0 END AS mean_c
          FROM stats),
        st AS (
          SELECT event_type, n, mean_c,
                 s2 // n - mean_c * mean_c AS var_c2
          FROM stm)
        SELECT b.event_type, min(st.n) AS n, min(st.mean_c) AS mean_c,
               min(st.var_c2) AS var_c2,
               CAST(sum(CASE WHEN (b.cents - st.mean_c) * (b.cents - st.mean_c)
                              > st.var_c2 * 9 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_out,
               max(abs(b.cents - st.mean_c)) AS max_abs_dev
        FROM base b JOIN st ON st.event_type = b.event_type
        GROUP BY 1 ORDER BY 1"""),
      desc = "3-sigma outliers via the sqrt-free squared-deviation test"),

    // ── hopping (sliding) window aggregates ─────────────────────────
    // 10-minute windows advancing every 5 — the batch twin of
    // Structured Streaming's window(ts, '10 minutes', '5 minutes'):
    // each event explodes into its size/hop = 2 member windows, then a
    // plain map-side-combined agg. The explode factor is the constant
    // size/hop, so this stays scan-shaped at any SF; distinct users
    // must be counted per window (overlap means they don't sum from
    // tumbling partials).
    "f_hopping" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .withColumn("b", (epochS($"ts") / 300L).cast(LongType) * 300L)
          .withColumn("w", explode(array($"b", $"b" - 300L)))
          .groupBy($"w", $"event_type")
          .agg(count(lit(1)).as("n"),
               countDistinct($"user_id").as("n_users"),
               sumMoney($"value").as("sum_value"))
          .withColumn("w_start", date_format(timestamp_seconds($"w"),
            "yyyy-MM-dd HH:mm:ss"))
          .select($"w_start", $"event_type", $"n", $"n_users", $"sum_value")
          .orderBy($"w_start", $"event_type")
          .limit(500)
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, user_id, value,
                 (epoch_us(ts)//1000000)//300*300 AS b
          FROM events),
        h AS (
          SELECT event_type, user_id, value,
                 unnest([b, b - 300]) AS w
          FROM e)
        SELECT strftime(make_timestamp(w * 1000000),
                        '%Y-%m-%d %H:%M:%S') AS w_start,
               event_type, count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
        FROM h GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 500"""),
      desc = "hopping 10m/5m windows via constant-factor explode + hash agg"),

    // ── RANGE frames: trailing time-window rolling aggregates ───────
    // The time-series form W4's ROWS frames can't express: the frame
    // is "everything in the last 10 MINUTES", not "the last k rows" —
    // value-based rangeBetween(-600, 0) on epoch seconds. Tied
    // timestamps all enter the frame (RANGE semantics), so the result
    // is deterministic without a tiebreak in the frame bound itself.
    // One user_id shuffle + partition-local sort, same as sessionize.
    "w_range_frames" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"es")
          .rangeBetween(-600L, 0L)
        ev(s, dir)
          .filter($"user_id" <= 100)
          .select($"user_id", $"event_id", epochS($"ts").as("es"),
            round($"value" * 100).cast(LongType).as("cents"))
          .withColumn("n_10m", count(lit(1)).over(w))
          .withColumn("cents_10m", sum($"cents").over(w))
          .select($"user_id", $"event_id", $"es", $"n_10m", $"cents_10m")
          .orderBy($"user_id", $"event_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts)//1000000 AS es,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events WHERE user_id <= 100)
        SELECT user_id, event_id, es,
               count(*) OVER (PARTITION BY user_id ORDER BY es ASC
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10m,
               CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY es ASC
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cents_10m
        FROM e ORDER BY user_id, event_id"""),
      desc = "trailing 10-minute RANGE-frame rolling count/sum per user"),

    // ── SCD2 dimension-history build from snapshots ─────────────────
    // The warehouse change-tracking shape: daily per-user snapshots
    // (last event_type observed that day, A5 ordered-argmax) collapse
    // into validity intervals [valid_from_day, valid_to_day] with a
    // version sequence — lag-change flag + running sum, then one agg.
    // Everything is keyed user_id: ONE shuffle feeds the snapshot agg,
    // the version windows, and the interval agg; at 100 TB the
    // partitioning is reused across all three stages, and each stage
    // is map-side combinable or partition-local.
    "e_scd2" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        // the public API IS the implementation (Events.scd2 — one
        // hash exchange on user_id, pinned by PlanAuditSpec)
        Events.scd2(ev(s, dir).filter($"user_id" <= 200),
            key = "user_id", tsSec = epochS($"ts"),
            attr = "event_type", tiebreak = "event_id")
          .orderBy($"user_id", $"version")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts)//1000000//86400 AS day_i,
                 epoch_us(ts)//1000000 AS es, event_id, event_type
          FROM events WHERE user_id <= 200),
        snap AS (
          SELECT user_id, day_i, event_type AS attr FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, day_i
              ORDER BY es DESC, event_id DESC) AS rn FROM e)
          WHERE rn = 1),
        v AS (
          SELECT user_id, day_i, attr,
            CASE WHEN lag(attr) OVER (PARTITION BY user_id ORDER BY day_i)
                        IS NULL
                   OR lag(attr) OVER (PARTITION BY user_id ORDER BY day_i)
                        <> attr
                 THEN 1 ELSE 0 END AS chg
          FROM snap),
        ver AS (
          SELECT user_id, day_i, attr,
                 CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY day_i)
                      AS BIGINT) AS version
          FROM v)
        SELECT user_id, version, min(attr) AS attr,
               min(day_i) AS valid_from_day, max(day_i) AS valid_to_day,
               count(*) AS n_days
        FROM ver GROUP BY 1, 2 ORDER BY user_id, version"""),
      desc = "SCD2 validity intervals from daily snapshots (one key shuffle)"),

    // ── key-skew profile: count-of-counts histogram ─────────────────
    // The diagnostic you run BEFORE choosing a join strategy at 100 TB:
    // per-key event counts bucketed by decimal digit count (integer —
    // no float log in the hash). Level 1 is the only real shuffle
    // (map-side combined); the histogram itself is tiny. A key whose
    // bucket sits orders of magnitude above the median is the one you
    // salt or AQE-skew-split.
    "a_skew_profile" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
          .groupBy($"cnt")
          .agg(count(lit(1)).as("n_keys"),
               ($"cnt" * count(lit(1))).as("events"))
          .orderBy($"cnt")
      },
      oracle = Some("""
        WITH pk AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        SELECT cnt, count(*) AS n_keys,
               CAST(cnt * count(*) AS BIGINT) AS events
        FROM pk GROUP BY cnt ORDER BY cnt"""),
      desc = "count-of-counts key-skew histogram (raw frequency spectrum)"),

    // ── linear multi-touch attribution ──────────────────────────────
    // Each purchase splits 1e6 ppm of credit equally across the
    // user's touches (click/view/signup) in the preceding 24 h; the
    // complement of the as-of family's last-touch form. The
    // purchase×touch join is user-keyed — co-partitioned at 100 TB,
    // fan-out bounded by per-user activity in the window — and the
    // per-purchase touch count is a window over the join result, not
    // a second join. Credit in integer ppm (floor div): no float in
    // the hash.
    "e_attribution_multi" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        // the public API IS the implementation (Events
        // .attributionLinear — co-partitioned join, window rides the
        // join partitioning; pinned by PlanAuditSpec)
        Events.attributionLinear(ev(s, dir),
            key = "user_id", tsSec = epochS($"ts"),
            isConversion = $"event_type" === "purchase",
            convId = "event_id",
            isTouch = $"event_type".isin("click", "view", "signup"),
            channel = $"event_type", windowSec = 86400L)
          .orderBy($"channel")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, event_type,
                     epoch_us(ts)//1000000 AS es FROM events),
        purch AS (
          SELECT user_id, event_id AS p_id, es AS p_es
          FROM e WHERE event_type = 'purchase'),
        touch AS (
          SELECT user_id, event_id AS t_id, event_type AS channel,
                 es AS t_es
          FROM e WHERE event_type IN ('click', 'view', 'signup')),
        j AS (
          SELECT p.p_id, t.channel,
                 count(*) OVER (PARTITION BY p.p_id) AS n_touch
          FROM purch p JOIN touch t
            ON p.user_id = t.user_id
           AND t.t_es <= p.p_es AND t.t_es > p.p_es - 86400)
        SELECT channel, count(*) AS n_credited,
               CAST(sum(1000000 // n_touch) AS BIGINT)
                 AS credit_ppm_total
        FROM j GROUP BY channel ORDER BY channel"""),
      desc = "linear multi-touch attribution (24h window, integer ppm credit)"),

    // ── mergeable exact quantiles via (value, freq) histograms ──────
    // The percentile analog of a_sketch_merge's HLL rollup: per-(type,
    // day) EXACT cents histograms are the persisted daily partial;
    // coarser grains merge by summing freqs — raw events are never
    // rescanned — and the weighted 3-arg percentile runs over the
    // tiny merged histogram. Unlike a quantile sketch this merge is
    // LOSSLESS, so the in-query verdict demands exact equality with
    // the direct percentile, not an error bound.
    "a_quantile_merge" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = ev(s, dir)
          .withColumn("cents", round($"value" * 100).cast(LongType))
          .withColumn("day_i", (epochS($"ts") / 86400L).cast(LongType))
        val daily = base.groupBy($"event_type", $"day_i", $"cents")
          .agg(count(lit(1)).as("freq"))
        val merged = daily.groupBy($"event_type", $"cents")
          .agg(sum($"freq").as("freq"))
        val fromMerged = merged.groupBy($"event_type")
          .agg(percentile($"cents", lit(0.5), $"freq").as("p50_merged"),
               percentile($"cents", lit(0.95), $"freq").as("p95_merged"),
               sum($"freq").as("n"))
        val direct = base.groupBy($"event_type")
          .agg(percentile($"cents", lit(0.5)).as("p50_direct"),
               percentile($"cents", lit(0.95)).as("p95_direct"))
        fromMerged.join(direct, Seq("event_type"))
          .select($"event_type", $"n", $"p50_merged", $"p95_merged",
            ($"p50_merged" === $"p50_direct").as("p50_ok"),
            ($"p95_merged" === $"p95_direct").as("p95_ok"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, count(*) AS n,
               quantile_cont(cents, 0.5) AS p50_merged,
               quantile_cont(cents, 0.95) AS p95_merged,
               TRUE AS p50_ok, TRUE AS p95_ok
        FROM e GROUP BY event_type ORDER BY event_type"""),
      desc = "mergeable exact quantiles: daily histograms → lossless rollup"),

    // ── mergeable APPROX quantiles via log-bucket sketches ──────────
    // The lossy sibling of a_quantile_merge for when even the exact
    // (value, freq) histogram is too wide (high-cardinality values at
    // 100 TB): per-(type, day) partials are DDSketch-style log-scale
    // bucket histograms (Masson et al., VLDB 2019) — bucket index
    // ceil(ln|v| / ln γ) with γ = (1+α)/(1−α) gives ≤ α relative
    // error per quantile and a FIXED partial size (≈ 2·log_γ(max)+1
    // buckets/day regardless of row count). Coarser grains merge by
    // summing bucket freqs — raw events never rescanned — and the
    // quantile reads out as the 3-arg weighted percentile over bucket
    // midpoints 2γ^i/(γ+1). Spark's percentile_approx sketch has no
    // SQL-level union aggregate, so the mergeable partial is explicit
    // here; the contract (estimate + exact twin + in-query verdict
    // bound) is a_sketch_merge's. Verdict bound: α·|exact| doubled
    // for midpoint-vs-interpolation slack, +1 cent absolute for the
    // exact twin's own .5-interpolation.
    "a_percentile_merge" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val alpha = 0.01
        val lnGamma = math.log((1 + alpha) / (1 - alpha))
        val base = ev(s, dir)
          .withColumn("cents", round($"value" * 100).cast(LongType))
          .withColumn("day_i", (epochS($"ts") / 86400L).cast(LongType))
        val bucketed = base
          .withColumn("sgn", signum($"cents").cast(LongType))
          .withColumn("idx", when($"sgn" === 0, lit(0L))
            .otherwise(ceil(log(abs($"cents")) / lnGamma).cast(LongType)))
        val daily = bucketed.groupBy($"event_type", $"day_i", $"sgn", $"idx")
          .agg(count(lit(1)).as("freq"))
        val mergedSk = daily.groupBy($"event_type", $"sgn", $"idx")
          .agg(sum($"freq").as("freq"))
          .withColumn("mid", when($"sgn" === 0, lit(0.0))
            .otherwise($"sgn" * lit(2.0) * exp($"idx" * lnGamma) /
              (math.exp(lnGamma) + 1.0)))
        val fromSketch = mergedSk.groupBy($"event_type")
          .agg(percentile($"mid", lit(0.5), $"freq").as("p50_sk"),
               percentile($"mid", lit(0.95), $"freq").as("p95_sk"),
               sum($"freq").as("n"))
        val direct = base.groupBy($"event_type")
          .agg(percentile($"cents", lit(0.5)).as("p50_cents"),
               percentile($"cents", lit(0.95)).as("p95_cents"))
        fromSketch.join(direct, Seq("event_type"))
          .select($"event_type", $"n", $"p50_cents", $"p95_cents",
            (abs($"p50_sk" - $"p50_cents") <=
              abs($"p50_cents") * (2 * alpha) + 1.0).as("p50_ok"),
            (abs($"p95_sk" - $"p95_cents") <=
              abs($"p95_cents") * (2 * alpha) + 1.0).as("p95_ok"))
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, count(*) AS n,
               quantile_cont(cents, 0.5) AS p50_cents,
               quantile_cont(cents, 0.95) AS p95_cents,
               TRUE AS p50_ok, TRUE AS p95_ok
        FROM e GROUP BY event_type ORDER BY event_type"""),
      desc = "DDSketch-style log-bucket percentile partials merged by freq-sum"),

    // ── mergeable heavy hitters via per-day top-k + residual bound ──
    // The frequent-items member of the mergeable-partial family
    // (counts: a_sketch_merge HLL; quantiles: a_quantile_merge /
    // a_percentile_merge): each day persists only its top-k users by
    // (count DESC, user ASC) plus ONE residual — the (k+1)-th count,
    // an upper bound on every user it dropped that day (Berinde et
    // al., PODS 2009 §3's counter summary). Merging sums kept counts
    // (est_lower) and, for days where a user was NOT kept, at most
    // the residual can be missing (est_upper) — so the true count is
    // provably inside [lower, upper] with NO rescan of raw events.
    // All integers with explicit tie order → both engines replay the
    // partials bit-for-bit, and the in_bounds verdict is the
    // guarantee itself, not a tolerance.
    "a_heavy_hitters" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val k = 8
        val daily = ev(s, dir)
          .withColumn("day_i", (epochS($"ts") / 86400L).cast(LongType))
          .groupBy($"day_i", $"user_id").agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy($"day_i").orderBy($"c".desc, $"user_id")))
        val kept = daily.filter($"rn" <= k)
          .select($"day_i", $"user_id", $"c")
        val errs = daily.filter($"rn" === k + 1)
          .select($"day_i", $"c".as("err_day"))
        val errTotal = errs
          .agg(coalesce(sum($"err_day"), lit(0L)).as("err_total"))
        val perUser = kept.join(errs, Seq("day_i"), "left")
          .groupBy($"user_id")
          .agg(sum($"c").as("est_lower"),
            sum(coalesce($"err_day", lit(0L))).as("err_covered"))
          .crossJoin(broadcast(errTotal))
          .select($"user_id", $"est_lower",
            ($"est_lower" + $"err_total" - $"err_covered").as("est_upper"))
        val exact = ev(s, dir).groupBy($"user_id")
          .agg(count(lit(1)).as("exact_n"))
        perUser.join(exact, Seq("user_id"))
          .select($"user_id", $"est_lower", $"est_upper", $"exact_n",
            ($"exact_n" >= $"est_lower" && $"exact_n" <= $"est_upper")
              .as("in_bounds"))
          .orderBy($"est_lower".desc, $"user_id")
          .limit(10)
      },
      oracle = Some("""
        WITH hhd AS (
          SELECT epoch_us(ts)//1000000//86400 AS day_i, user_id,
                 count(*) AS c
          FROM events GROUP BY 1, 2),
        hhr AS (
          SELECT *, row_number() OVER (PARTITION BY day_i
                      ORDER BY c DESC, user_id) AS rn
          FROM hhd),
        kept AS (SELECT day_i, user_id, c FROM hhr WHERE rn <= 8),
        errs AS (SELECT day_i, c AS err_day FROM hhr WHERE rn = 9),
        et AS (SELECT COALESCE(CAST(sum(err_day) AS BIGINT), 0)
                 AS err_total FROM errs),
        pu AS (
          SELECT k.user_id,
                 CAST(sum(k.c) AS BIGINT) AS est_lower,
                 CAST(sum(COALESCE(e.err_day, 0)) AS BIGINT)
                   AS err_covered
          FROM kept k LEFT JOIN errs e ON e.day_i = k.day_i
          GROUP BY 1),
        ex AS (SELECT user_id, count(*) AS exact_n
               FROM events GROUP BY 1)
        SELECT p.user_id, p.est_lower,
               p.est_lower + et.err_total - p.err_covered AS est_upper,
               ex.exact_n,
               ex.exact_n >= p.est_lower
                 AND ex.exact_n <= p.est_lower + et.err_total
                       - p.err_covered AS in_bounds
        FROM pu p CROSS JOIN et JOIN ex ON ex.user_id = p.user_id
        ORDER BY p.est_lower DESC, p.user_id LIMIT 10"""),
      desc = "mergeable heavy hitters: per-day top-k partials + residual bounds"),

    // ── per-group OLS trend (integer least squares over daily means) ─
    // The trend-detection sibling of dq_anomaly's level check: slope
    // of the per-day integer mean (cents) against the day index, per
    // event type. Regressing the DAILY aggregate — not raw rows —
    // bounds every sum by calendar² · value-range, so the arithmetic
    // is corpus-size-INDEPENDENT (a raw-row x·y sum at 1e6-scale
    // overflows long by sf0.1). Closed form with x shifted to the
    // group's first day (slope is shift-invariant):
    //   num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)²,
    //   slope_pml = floor(num·1000 / den) — staged as q·1000 +
    //   floor(r·1000/den) so the intermediate never exceeds den·1000.
    //   BOTH engines truncate integer division toward zero (Spark
    //   div, DuckDB v1.0.0 //), so both sides carry the explicit
    //   floor adjustment (floorDivPos here, a CASE in the oracle) —
    //   verified empirically: -881205 // 67425 = -13 in DuckDB.
    "a_regression" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .withColumn("day_i", (epochS($"ts") / 86400L).cast(LongType))
          .withColumn("cents", round($"value" * 100).cast(LongType))
          .groupBy($"event_type", $"day_i")
          .agg(floorDivPos(sum($"cents"), count(lit(1))).as("mean_c"))
        val stats = daily
          .withColumn("d0", min($"day_i").over(
            Window.partitionBy($"event_type")))
          .withColumn("x", $"day_i" - $"d0")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_days"), sum($"x").as("sx"),
            sum($"mean_c").as("sy"), sum($"x" * $"mean_c").as("sxy"),
            sum($"x" * $"x").as("sxx"))
          .withColumn("num", $"n_days" * $"sxy" - $"sx" * $"sy")
          .withColumn("den", $"n_days" * $"sxx" - $"sx" * $"sx")
          .filter($"den" > 0)
        stats
          .withColumn("q", floorDivPos($"num", $"den"))
          .withColumn("r", $"num" - $"q" * $"den")
          .withColumn("slope_pml",
            $"q" * 1000L + floorDivPos($"r" * 1000L, $"den"))
          .withColumn("intercept_pml",
            floorDivPos($"sy" * 1000L - $"slope_pml" * $"sx", $"n_days"))
          .select($"event_type", $"n_days", $"slope_pml", $"intercept_pml")
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH rd0 AS (
          SELECT event_type, epoch_us(ts)//1000000//86400 AS day_i,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS sc,
                 count(*) AS nd
          FROM events GROUP BY 1, 2),
        rd AS (
          -- floor-adjusted daily mean (DuckDB // truncates to zero)
          SELECT event_type, day_i,
                 sc // nd - CASE WHEN sc < 0 AND sc % nd <> 0
                            THEN 1 ELSE 0 END AS mean_c
          FROM rd0),
        rx AS (
          SELECT event_type, mean_c,
                 day_i - min(day_i) OVER (PARTITION BY event_type) AS x
          FROM rd),
        rs AS (
          SELECT event_type, count(*) AS n_days,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(mean_c) AS BIGINT) AS sy,
                 CAST(sum(x * mean_c) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM rx GROUP BY 1),
        rn AS (
          SELECT *, n_days * sxy - sx * sy AS num,
                 n_days * sxx - sx * sx AS den
          FROM rs WHERE n_days * sxx - sx * sx > 0),
        rq AS (
          -- DuckDB integer // truncates toward zero (like Spark div);
          -- adjust to floor exactly as BqCompat.floorDivPos does
          SELECT *,
                 num // den - CASE WHEN num < 0 AND num % den <> 0
                              THEN 1 ELSE 0 END AS q
          FROM rn),
        rr AS (
          SELECT *, num - q * den AS r FROM rq),
        rsl AS (
          SELECT *, q * 1000 + (r * 1000) // den AS slope_pml FROM rr),
        ri AS (
          SELECT *, sy * 1000 - slope_pml * sx AS inum FROM rsl)
        SELECT event_type, n_days, slope_pml,
               inum // n_days - CASE WHEN inum < 0 AND inum % n_days <> 0
                                THEN 1 ELSE 0 END AS intercept_pml
        FROM ri ORDER BY event_type"""),
      desc = "per-group integer OLS trend over daily means (staged floor div)"),

    // ── calendar-spine densification (sparse → dense series) ────────
    // Fill every user's missing days between their first and last
    // activity with explicit zero rows — the densification step a
    // forecasting/retention pipeline needs before any window over
    // time. sequence() + explode builds the spine from the per-user
    // bounds; one repartition on user_id up front serves the daily
    // agg, the bounds agg, and the spine⋈daily join (the e_scd2
    // single-exchange pattern).
    "e_date_spine" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        // daily feeds BOTH the spine (bounds agg) and the join probe —
        // materialize it or Catalyst duplicates the whole subtree
        // (two scans + two exchanges; the plan audit caught exactly
        // that)
        val daily = graft.Engine.materialize(
          ev(s, dir)
            .filter($"user_id" <= 100)
            .withColumn("day_i", (epochS($"ts") / 86400L).cast(LongType))
            .repartition($"user_id")
            .groupBy($"user_id", $"day_i")
            .agg(count(lit(1)).as("n_day")),
          key = "user_id", name = "spine_daily")
        val spine = daily.groupBy($"user_id")
          .agg(min($"day_i").as("d0"), max($"day_i").as("d1"))
          .select($"user_id", explode(sequence($"d0", $"d1")).as("day_i"))
        spine.join(daily, Seq("user_id", "day_i"), "left")
          .select($"user_id", $"day_i",
            coalesce($"n_day", lit(0L)).as("n_day"),
            when($"n_day".isNull, 1L).otherwise(0L).as("is_gap"))
          .orderBy($"user_id", $"day_i")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts)//1000000//86400 AS day_i
          FROM events WHERE user_id <= 100),
        daily AS (
          SELECT user_id, day_i, count(*) AS n_day FROM e GROUP BY 1, 2),
        b AS (
          SELECT user_id, min(day_i) AS d0, max(day_i) AS d1
          FROM daily GROUP BY 1),
        spine AS (
          SELECT user_id, unnest(range(d0, d1 + 1)) AS day_i FROM b)
        SELECT s.user_id, s.day_i,
               COALESCE(d.n_day, 0) AS n_day,
               CASE WHEN d.n_day IS NULL THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS is_gap
        FROM spine s LEFT JOIN daily d
          ON d.user_id = s.user_id AND d.day_i = s.day_i
        ORDER BY s.user_id, s.day_i"""),
      desc = "calendar-spine densification: explicit zero rows for gap days"),

    // ── time-decayed engagement score (integer half-life) ──────────
    // The recsys feature: recent activity counts more, halving every
    // 7 days. Exact integer arithmetic — weight_ppm = 1e6 >> (age_days
    // div 7), never a float pow (2^(−dt/h) is not IEEE-portable).
    // The decay anchor is the corpus max timestamp (a deterministic
    // 1-row broadcast); the score agg is map-side combinable, so the
    // whole query is scan-shaped at 100 TB.
    "a_decay_engagement" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = ev(s, dir)
          .select($"user_id", epochS($"ts").as("es"),
            round($"value" * 100).cast(LongType).as("cents"))
        val ref = base.agg(max($"es").as("ref_es"))
        base.join(broadcast(ref))
          .withColumn("k",
            least(expr("(ref_es - es) div 86400 div 7"), lit(19L)))
          .withColumn("w_ppm", expr("shiftright(1000000L, CAST(k AS INT))"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
               sum($"cents" * $"w_ppm").as("decayed_cents_ppm"),
               sum($"w_ppm").as("weight_sum_ppm"))
          .filter($"user_id" <= 300)
          .orderBy($"user_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts)//1000000 AS es,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events),
        r AS (SELECT max(es) AS ref_es FROM e),
        w AS (
          SELECT user_id, cents,
                 1000000 >> CAST(LEAST((r.ref_es - es)//86400//7, 19)
                   AS INT) AS w_ppm
          FROM e, r)
        SELECT user_id, count(*) AS n_events,
               CAST(sum(cents * w_ppm) AS BIGINT) AS decayed_cents_ppm,
               CAST(sum(w_ppm) AS BIGINT) AS weight_sum_ppm
        FROM w WHERE user_id <= 300
        GROUP BY user_id ORDER BY user_id"""),
      desc = "half-life-decayed engagement score (integer shifts, no float pow)"),

    // ── Kaplan-Meier survival (product-limit estimator) ──────────────
    // The time-to-event workhorse: each user's clock starts at their
    // first active day; the EVENT is their first ≥$200 purchase, and
    // users who never convert are right-CENSORED at the observation
    // horizon (the corpus's last day). S(t) = Π_{u≤t} (n_u − d_u)/n_u
    // in ppm with a truncating integer fold — order matters for
    // truncation, so both engines fold factors in ascending-duration
    // order (Spark: sort_array + aggregate(); DuckDB: ordered list +
    // list_reduce). Scale: one user_id shuffle; everything after is
    // the distinct-duration frame, bounded by the CALENDAR day
    // domain, so the global n-at-risk window and the O(T²)
    // prefix-fold join never see row-scale data. (KM: Kaplan & Meier
    // 1958; the fold is the standard product-limit recurrence.)
    "e_survival" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val days = ev(s, dir)
          .select($"user_id", (epochS($"ts") / 86400L).cast(LongType).as("day"),
            $"event_type", $"value")
        val perUser = days.groupBy($"user_id")
          .agg(min($"day").as("first"),
            min(when($"event_type" === "purchase" && $"value" >= 200.0,
              $"day")).as("pday"))
        val horizon = days.agg(max($"day").as("m"))
        val byT = perUser.crossJoin(broadcast(horizon))
          .withColumn("evt", when($"pday".isNotNull, 1L).otherwise(0L))
          .withColumn("dur", when($"evt" === 1L, $"pday" - $"first")
            .otherwise($"m" - $"first"))
          .groupBy($"dur")
          .agg(sum($"evt").as("deaths"),
            (count(lit(1)) - sum($"evt")).as("censored"),
            count(lit(1)).as("ct"))
        val atRisk = Window.orderBy($"dur")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val f = byT.withColumn("n_risk", sum($"ct").over(atRisk))
          .withColumn("factor_ppm",
            expr("(n_risk - deaths) * 1000000 div n_risk"))
        val contrib = f.select($"dur".as("f_dur"), $"factor_ppm".as("f_factor"))
        f.join(contrib, $"f_dur" <= $"dur")
          .groupBy($"dur")
          .agg(min($"deaths").as("deaths"), min($"censored").as("censored"),
            min($"n_risk").as("n_risk"),
            sort_array(collect_list(struct($"f_dur", $"f_factor")))
              .as("fs"))
          .withColumn("s_ppm", expr(
            "aggregate(transform(fs, r -> r.f_factor), " +
              "CAST(1000000 AS BIGINT), (a, x) -> a * x div 1000000)"))
          .select($"dur", $"deaths", $"censored", $"n_risk", $"s_ppm")
          .orderBy($"dur")
      },
      oracle = Some("""
        WITH sv_d AS (
          SELECT user_id,
                 min((epoch_us(ts)//1000000)//86400) AS first,
                 min(CASE WHEN event_type = 'purchase' AND value >= 200
                     THEN (epoch_us(ts)//1000000)//86400 END) AS pday
          FROM events GROUP BY 1),
        sv_m AS (
          SELECT max((epoch_us(ts)//1000000)//86400) AS m FROM events),
        sv_u AS (
          SELECT CASE WHEN d.pday IS NOT NULL THEN 1 ELSE 0 END AS evt,
                 CASE WHEN d.pday IS NOT NULL THEN d.pday - d.first
                      ELSE m.m - d.first END AS dur
          FROM sv_d d CROSS JOIN sv_m m),
        sv_t AS (
          SELECT dur, CAST(sum(evt) AS BIGINT) AS deaths,
                 CAST(count(*) - sum(evt) AS BIGINT) AS censored,
                 CAST(count(*) AS BIGINT) AS ct
          FROM sv_u GROUP BY 1),
        sv_f AS (
          SELECT dur, deaths, censored,
                 CAST(sum(ct) OVER (ORDER BY dur
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_risk,
                 (CAST(sum(ct) OVER (ORDER BY dur
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) - deaths) * 1000000
                 // CAST(sum(ct) OVER (ORDER BY dur
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS factor_ppm
          FROM sv_t)
        SELECT t.dur, min(t.deaths) AS deaths,
               min(t.censored) AS censored, min(t.n_risk) AS n_risk,
               list_reduce(list_prepend(CAST(1000000 AS BIGINT),
                 list(f.factor_ppm ORDER BY f.dur)),
                 (a, b) -> a * b // 1000000) AS s_ppm
        FROM sv_f t JOIN sv_f f ON f.dur <= t.dur
        GROUP BY t.dur ORDER BY t.dur"""),
      desc = "Kaplan-Meier product-limit survival in ppm (time to first big purchase, right-censored)"),

    // ── Classical seasonal decomposition: day-of-week index ──────────
    // Ratio-to-moving-average with a RANGE(±3 day) frame so calendar
    // GAPS shrink the window count and the partial weeks drop out
    // (ROWS frames would silently span gaps). dow from pure integer
    // arithmetic — (day + 4) % 7, 0 = Sunday — because Spark's
    // dayofweek is 1-based and DuckDB's 0-based. Per-dow index =
    // lower median of the per-day ratios (exact: 1-based pick at
    // (n+1) div 2 of the sorted list). Scale: the daily frame is
    // calendar-bounded, so the global RANGE window is a bounded-
    // domain pass, the same class as a_mad's histogram window.
    "e_seasonality" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"))
          .groupBy($"day").agg(count(lit(1)).as("n"))
        val w7 = Window.orderBy($"day").rangeBetween(-3L, 3L)
        daily
          .withColumn("tot7", sum($"n").over(w7))
          .withColumn("cnt7", count(lit(1)).over(w7))
          .filter($"cnt7" === 7L)
          .withColumn("ratio_ppm", expr("n * 7 * 1000000 div tot7"))
          .withColumn("dow", expr("(day + 4) % 7"))
          .groupBy($"dow")
          .agg(count(lit(1)).as("n_days"),
            expr("sum(ratio_ppm) div count(1)").as("mean_ratio_ppm"),
            sort_array(collect_list($"ratio_ppm")).as("rs"))
          .withColumn("median_ratio_ppm",
            expr("element_at(rs, CAST((size(rs) + 1) div 2 AS INT))"))
          .select($"dow", $"n_days", $"mean_ratio_ppm", $"median_ratio_ppm")
          .orderBy($"dow")
      },
      oracle = Some("""
        WITH se_d AS (
          SELECT (epoch_us(ts)//1000000)//86400 AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        se_w AS (
          SELECT day, n,
                 CAST(sum(n) OVER (ORDER BY day
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS BIGINT) AS tot7,
                 count(*) OVER (ORDER BY day
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
          FROM se_d),
        se_r AS (
          SELECT (day + 4) % 7 AS dow, n * 7 * 1000000 // tot7 AS ratio_ppm
          FROM se_w WHERE cnt7 = 7)
        SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS mean_ratio_ppm,
               list(ratio_ppm ORDER BY ratio_ppm)[(count(*)+1)//2]
                 AS median_ratio_ppm
        FROM se_r GROUP BY dow ORDER BY dow"""),
      desc = "ratio-to-moving-average day-of-week seasonal index (gap-aware RANGE frame)"),

    // ── calendar spine + LOCF gap fill ───────────────────────────────
    // The time-series regularization every metrics store runs before
    // charting or modeling: 40 user-bucket purchase series, a dense
    // per-series day spine (sequence over the observed extent), LEFT
    // join to mark gaps, then last-observation-carried-forward via
    // last(ignore nulls) over the per-series day order, plus the gap
    // age (days since the carried observation; observed days read 0,
    // leading gaps stay NULL). Scale: the spine is series × calendar
    // days (domain-bounded, generated — never shuffled from data);
    // the fill window partitions by series.
    "e_gap_fill" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .filter($"event_type" === "purchase")
          .select(($"user_id" % 40L).as("series"),
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            round($"value" * 100).cast(LongType).as("c"))
          .groupBy($"series", $"day").agg(sum($"c").as("cents"))
        val ext = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
        val spine = daily.select($"series").distinct()
          .crossJoin(broadcast(ext))
          .select($"series", explode(sequence($"d0", $"d1")).as("day"))
        val wFill = Window.partitionBy($"series").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("series", "day"), "left")
          .withColumn("filled_cents", last($"cents", ignoreNulls = true)
            .over(wFill))
          .withColumn("last_obs_day",
            max(when($"cents".isNotNull, $"day")).over(wFill))
          .select($"series", $"day", $"cents",
            $"filled_cents", ($"day" - $"last_obs_day").as("gap_age"))
          .orderBy($"series", $"day")
      },
      oracle = Some("""
        WITH gf_d AS (
          SELECT user_id % 40 AS series,
                 (epoch_us(ts)//1000000)//86400 AS day,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1, 2),
        gf_x AS (SELECT min(day) AS d0, max(day) AS d1 FROM gf_d),
        gf_s AS (
          SELECT s.series, unnest(generate_series(x.d0, x.d1)) AS day
          FROM (SELECT DISTINCT series FROM gf_d) s
          CROSS JOIN gf_x x),
        gf_j AS (
          SELECT s.series, s.day, d.cents
          FROM gf_s s LEFT JOIN gf_d d
            ON d.series = s.series AND d.day = s.day)
        SELECT series, day, cents,
               last_value(cents IGNORE NULLS) OVER (PARTITION BY series
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS filled_cents,
               day - max(CASE WHEN cents IS NOT NULL THEN day END)
                 OVER (PARTITION BY series ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS gap_age
        FROM gf_j ORDER BY series, day"""),
      desc = "dense day spine + last-observation-carried-forward fill with gap age"),

    // ── rolling exact median (spike detection) ───────────────────────
    // Per event type: daily counts, trailing-7-row exact LOWER median
    // (sorted frame list, 1-based pick at (n+1) div 2 — the
    // engine-portable median both engines compute identically, no
    // interpolation), trailing mean in ppm, and a spike flag when the
    // day runs ≥50% above its trailing median. Windows partition by
    // event_type over the calendar-bounded daily frame.
    "a_rolling_median" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val w7 = Window.partitionBy($"event_type").orderBy($"day")
          .rowsBetween(-6, Window.currentRow)
        ev(s, dir)
          .select($"event_type",
            (epochS($"ts") / 86400L).cast(LongType).as("day"))
          .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
          .withColumn("ws", sort_array(collect_list($"n").over(w7)))
          .withColumn("med7",
            expr("element_at(ws, CAST((size(ws) + 1) div 2 AS INT))"))
          .withColumn("mean7_ppm", expr(
            "aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + x)" +
              " * 1000000 div size(ws)"))
          .withColumn("spike", $"n" * 100L > $"med7" * 150L)
          .select($"event_type", $"day", $"n", $"med7", $"mean7_ppm",
            $"spike")
          .orderBy($"event_type", $"day")
      },
      oracle = Some("""
        WITH rm_d AS (
          SELECT event_type, (epoch_us(ts)//1000000)//86400 AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        rm_w AS (
          SELECT event_type, day, n,
                 list_sort(list(n) OVER (PARTITION BY event_type
                   ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
                   AS ws
          FROM rm_d)
        SELECT event_type, day, n,
               ws[(len(ws)+1)//2] AS med7,
               CAST(list_sum(ws) AS BIGINT) * 1000000 // len(ws)
                 AS mean7_ppm,
               n * 100 > ws[(len(ws)+1)//2] * 150 AS spike
        FROM rm_w ORDER BY event_type, day"""),
      desc = "trailing-7 exact lower median + ppm mean + spike flag per event type"),

    // ── experiment power: minimum detectable effect ──────────────────
    // The sample-size sanity check run BEFORE an A/B test: with the
    // e_ab_test arm split, per-user purchase cents y, pooled variance
    // from mean-CENTERED exact moments (the e_ab_cuped two-pass form
    // — raw Σy² overflows where centered moments hold to 1e9 users),
    // MDE at 80% power / 5% two-sided significance =
    // 2.8·sqrt(2·s²/n̄) with n̄ the smaller arm (conservative), all
    // through the exact integer isqrt (BqCompat.isqrt — the CASE
    // chain makes the floor exact at perfect squares in both
    // engines). Shape: one user_id shuffle, then 1-row frames.
    "e_power_mde" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val per = ev(s, dir)
          .select($"user_id",
            when($"event_type" === "purchase",
              round($"value" * 100).cast(LongType)).otherwise(0L)
              .as("cents"))
          .groupBy($"user_id").agg(sum($"cents").as("y"))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val m1 = per.agg(count(lit(1)).as("n"), sum($"y").as("sy"))
        val mom = per.crossJoin(broadcast(m1))
          .withColumn("yc", $"y" - expr("sy div n"))
          .agg(sum($"yc" * $"yc").as("ss"), min($"n").as("n"),
            sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n0"),
            sum(when($"arm" =!= 0L, 1L).otherwise(0L)).as("n1"))
        mom
          .withColumn("var_cents2", expr("ss div (n - 1)"))
          .withColumn("n_min", least($"n0", $"n1"))
          .withColumn("se_x10", graft.functions.BqCompat.isqrt(
            expr("200 * var_cents2 div n_min")))
          .withColumn("mde_cents_x10", expr("28 * se_x10 div 10"))
          .select($"n", $"n0", $"n1", $"var_cents2", $"se_x10",
            $"mde_cents_x10")
          .orderBy($"n")
      },
      oracle = Some("""
        WITH pw_p AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value*100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y,
                 ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM events GROUP BY user_id),
        pw_1 AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS sy
          FROM pw_p),
        pw_m AS (
          SELECT CAST(sum((p.y - o.sy // o.n) * (p.y - o.sy // o.n))
                   AS BIGINT) AS ss,
                 min(o.n) AS n,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n1
          FROM pw_p p CROSS JOIN pw_1 o),
        pw_v AS (
          SELECT n, n0, n1, ss // (n - 1) AS var_cents2,
                 least(n0, n1) AS n_min
          FROM pw_m),
        pw_s AS (
          SELECT *, CAST(floor(sqrt(CAST(200 * var_cents2 // n_min
                   AS DOUBLE))) AS BIGINT) AS s0,
                 200 * var_cents2 // n_min AS arg
          FROM pw_v),
        pw_a AS (
          SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= arg THEN s0 + 1
                         ELSE s0 END AS s1
          FROM pw_s),
        pw_f AS (
          SELECT *, CASE WHEN s1 * s1 > arg THEN s1 - 1 ELSE s1 END
                   AS se_x10
          FROM pw_a)
        SELECT n, n0, n1, var_cents2, se_x10,
               28 * se_x10 // 10 AS mde_cents_x10
        FROM pw_f"""),
      desc = "A/B power analysis: centered-moment variance, isqrt SE, 2.8-sigma MDE"),

    // ── exact Gini coefficient (histogram-first) ─────────────────────
    // Spend-concentration inequality per event type, the a_mad shape:
    // group users by their exact cents VALUE first, then the sorted
    // cumsum runs over the bounded value domain — never a row-scale
    // sort. With ties grouped, Σᵢ i·yᵢ over a value v spanning ranks
    // (r, r+c] is v·(c·r + c·(c+1)/2), so
    // G = (2·Σ − (n+1)·S) / (n·S) is exact integer ppm. Overflow
    // bound: Σᵢ i·yᵢ ≤ n·S — fine to ~10⁹ user-cents products; beyond
    // that compute per cohort and average. Zero-spend users count
    // (they ARE the inequality); an all-zero type yields NULL (0/0).
    "a_gini" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val perUser = ev(s, dir)
          .select($"event_type", $"user_id",
            round($"value" * 100).cast(LongType).as("cents"))
          .groupBy($"event_type", $"user_id")
          .agg(sum($"cents").as("y"))
        val hist = perUser.groupBy($"event_type", $"y")
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy($"event_type").orderBy($"y")
          .rowsBetween(Window.unboundedPreceding, -1)
        hist
          .withColumn("r", coalesce(sum($"c").over(wCum), lit(0L)))
          .withColumn("a", expr("y * (c * r + c * (c + 1) div 2)"))
          .groupBy($"event_type")
          .agg(sum(expr("c")).as("n"), sum(expr("y * c")).as("s"),
            sum($"a").as("aa"))
          .withColumn("gini_ppm",
            expr("(2 * aa - (n + 1) * s) * 1000000 div nullif(n * s, 0)"))
          .select($"event_type", $"n", $"s".as("sum_cents"), $"gini_ppm")
          .orderBy($"event_type")
      },
      oracle = Some("""
        WITH gi_u AS (
          SELECT event_type, user_id,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS y
          FROM events GROUP BY 1, 2),
        gi_h AS (
          SELECT event_type, y, CAST(count(*) AS BIGINT) AS c
          FROM gi_u GROUP BY 1, 2),
        gi_r AS (
          SELECT event_type, y, c,
                 COALESCE(CAST(sum(c) OVER (PARTITION BY event_type
                   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS BIGINT), 0) AS r
          FROM gi_h),
        gi_a AS (
          SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(y * c) AS BIGINT) AS s,
                 CAST(sum(y * (c * r + c * (c + 1) // 2)) AS BIGINT)
                   AS aa
          FROM gi_r GROUP BY 1)
        SELECT event_type, n, s AS sum_cents,
               CAST((2 * aa - (n + 1) * s) * 1000000
                 // NULLIF(n * s, 0) AS BIGINT) AS gini_ppm
        FROM gi_a ORDER BY event_type"""),
      desc = "exact Gini spend concentration per event type (grouped-ties histogram form)"),

    // ── sequential A/B monitoring (the daily-look companion) ─────────
    // The experiment dashboard's "can we stop yet": per calendar day
    // the CUMULATIVE enrolled users and converters per arm (first
    // activity / first purchase day — each user counts once from
    // their event day onward), the e_ab_test 2×2 chi-square at every
    // look, and a stop flag at a constant Pocock-style boundary
    // (z = 2.9 → chi² > 8.41, the repeated-looks correction for ~5
    // looks at α=0.05; the boundary CONSTANT is the policy knob, the
    // machinery is the operator). All counts — no raw sums of
    // squares, so the only overflow bound is the chi-square's own
    // exact-BIGINT envelope, now GUARDED inside chi2x100Sql (raises
    // out of envelope instead of wrapping to values that would still
    // hash-match an equally wrapped oracle). The cumsum windows
    // partition by arm over the calendar-bounded day spine.
    "e_ab_sequential" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val per = ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            $"event_type")
          .groupBy($"user_id")
          .agg(min($"day").as("first_day"),
            min(when($"event_type" === "purchase", $"day")).as("conv_day"))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val days = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"))
          .distinct()
        val spine = days.crossJoin(
          Seq(0L, 1L).toDF("arm"))
        val enr = per.groupBy($"arm", $"first_day".as("day"))
          .agg(count(lit(1)).as("n_enr"))
        val cnv = per.filter($"conv_day".isNotNull)
          .groupBy($"arm", $"conv_day".as("day"))
          .agg(count(lit(1)).as("n_cnv"))
        val wCum = Window.partitionBy($"arm").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = spine
          .join(enr, Seq("arm", "day"), "left")
          .join(cnv, Seq("arm", "day"), "left")
          .withColumn("n", sum(coalesce($"n_enr", lit(0L))).over(wCum))
          .withColumn("c", sum(coalesce($"n_cnv", lit(0L))).over(wCum))
        def pick(a: Long, col0: String) =
          min(when($"arm" === a, col(col0)))
        cum.groupBy($"day")
          .agg(pick(0L, "n").as("n0"), pick(0L, "c").as("c0"),
            pick(1L, "n").as("n1"), pick(1L, "c").as("c1"))
          .filter($"n0" > 0L && $"n1" > 0L)
          .withColumn("diff_ppm",
            expr("c1 * 1000000L div n1 - c0 * 1000000L div n0"))
          .withColumn("chi2_x100",
            expr(graft.functions.BqCompat.chi2x100Sql()))
          .withColumn("stop", $"chi2_x100" > 841L)
          .select($"day", $"n0", $"c0", $"n1", $"c1", $"diff_ppm",
            $"chi2_x100", $"stop")
          .orderBy($"day")
      },
      oracle = Some("""
        WITH sq_p AS (
          SELECT user_id,
                 min((epoch_us(ts)//1000000)//86400) AS first_day,
                 min(CASE WHEN event_type = 'purchase'
                     THEN (epoch_us(ts)//1000000)//86400 END) AS conv_day,
                 ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM events GROUP BY user_id),
        sq_d AS (
          SELECT DISTINCT (epoch_us(ts)//1000000)//86400 AS day
          FROM events),
        sq_s AS (
          SELECT d.day, a.arm
          FROM sq_d d CROSS JOIN (VALUES (0), (1)) a(arm)),
        sq_e AS (
          SELECT arm, first_day AS day, CAST(count(*) AS BIGINT) AS n_enr
          FROM sq_p GROUP BY 1, 2),
        sq_c AS (
          SELECT arm, conv_day AS day, CAST(count(*) AS BIGINT) AS n_cnv
          FROM sq_p WHERE conv_day IS NOT NULL GROUP BY 1, 2),
        sq_m AS (
          SELECT s.day, s.arm,
                 CAST(sum(COALESCE(e.n_enr, 0)) OVER (PARTITION BY s.arm
                   ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS n,
                 CAST(sum(COALESCE(c.n_cnv, 0)) OVER (PARTITION BY s.arm
                   ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS c
          FROM sq_s s
          LEFT JOIN sq_e e ON e.arm = s.arm AND e.day = s.day
          LEFT JOIN sq_c c ON c.arm = s.arm AND c.day = s.day),
        sq_w AS (
          SELECT day,
                 min(CASE WHEN arm = 0 THEN n END) AS n0,
                 min(CASE WHEN arm = 0 THEN c END) AS c0,
                 min(CASE WHEN arm = 1 THEN n END) AS n1,
                 min(CASE WHEN arm = 1 THEN c END) AS c1
          FROM sq_m GROUP BY day)
        SELECT day, n0, c0, n1, c1,
               c1 * 1000000 // n1 - c0 * 1000000 // n0 AS diff_ppm,
               (n0 + n1) * (c0 * (n1 - c1) - c1 * (n0 - c0))
                 * (c0 * (n1 - c1) - c1 * (n0 - c0)) * 100
                 // greatest(n0 * n1 * (c0 + c1) * (n0 + n1 - c0 - c1), 1)
                 AS chi2_x100,
               (n0 + n1) * (c0 * (n1 - c1) - c1 * (n0 - c0))
                 * (c0 * (n1 - c1) - c1 * (n0 - c0)) * 100
                 // greatest(n0 * n1 * (c0 + c1) * (n0 + n1 - c0 - c1), 1)
                 > 841 AS stop
        FROM sq_w WHERE n0 > 0 AND n1 > 0
        ORDER BY day"""),
      desc = "sequential A/B looks: cumulative 2x2 chi-square per day vs a Pocock boundary"),

    // ── uplift evaluation: the Qini curve by score decile ────────────
    // How targeting models are graded (Radcliffe 2007): rank users by
    // a score (here the pre-period spend — the CUPED covariate as the
    // model stand-in), cut into deciles HISTOGRAM-FIRST (thresholds
    // from a cumsum over the bounded distinct-score domain — never an
    // ntile over row-scale data; ties share a decile), then per
    // cumulative best-k-deciles prefix the Qini value
    // c₁ − c₀·n₁/n₀ in exact x100. The arm is the e_ab hash split —
    // an A/A design, so the curve hovering near 0 IS the correct
    // reading (machinery under test, not the treatment). Windows: the
    // score histogram (bounded domain) and the 10-row decile frame.
    "e_uplift" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val ext = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"))
          .agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val per = ev(s, dir)
          .select($"user_id",
            (epochS($"ts") / 86400L).cast(LongType).as("day"),
            $"event_type",
            when($"event_type" === "purchase",
              round($"value" * 100).cast(LongType)).otherwise(0L)
              .as("cents"))
          .crossJoin(broadcast(ext))
          .groupBy($"user_id")
          .agg(sum(when($"day" < $"mid", $"cents").otherwise(0L)).as("x"),
            max(when($"day" >= $"mid" &&
              $"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
          .withColumn("arm", expr("CAST(conv(substring(md5(" +
            "CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        val n = per.agg(count(lit(1)).as("n_all"))
        val wHist = Window.orderBy($"x".desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val dec = per.groupBy($"x").agg(count(lit(1)).as("c"))
          .withColumn("cum_prev", coalesce(sum($"c").over(wHist), lit(0L)))
          .crossJoin(broadcast(n))
          .select($"x", expr("least(cum_prev * 10 div n_all, 9) + 1")
            .as("decile"))
        val grp = per.join(dec, Seq("x"))
          .groupBy($"decile")
          .agg(sum($"arm").as("n1"), sum($"arm" * $"conv").as("c1"),
            sum(lit(1L) - $"arm").as("n0"),
            sum((lit(1L) - $"arm") * $"conv").as("c0"))
        val wCum = Window.orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grp
          .withColumn("cn1", sum($"n1").over(wCum))
          .withColumn("cc1", sum($"c1").over(wCum))
          .withColumn("cn0", sum($"n0").over(wCum))
          .withColumn("cc0", sum($"c0").over(wCum))
          .withColumn("uplift_ppm", expr(
            "c1 * 1000000 div nullif(n1, 0) " +
              "- c0 * 1000000 div nullif(n0, 0)"))
          .withColumn("qini_x100", expr(
            "cc1 * 100 - cc0 * cn1 * 100 div nullif(cn0, 0)"))
          .select($"decile", $"n1", $"c1", $"n0", $"c0",
            $"uplift_ppm", $"qini_x100")
          .orderBy($"decile")
      },
      oracle = Some("""
        WITH up_d AS (
          SELECT user_id, (epoch_us(ts)//1000000)//86400 AS day,
                 event_type,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value*100) AS BIGINT)
                      ELSE 0 END AS cents
          FROM events),
        up_m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM up_d),
        up_p AS (
          SELECT d.user_id,
                 CAST(sum(CASE WHEN d.day < m.mid THEN d.cents
                          ELSE 0 END) AS BIGINT) AS x,
                 CAST(max(CASE WHEN d.day >= m.mid
                          AND d.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS conv,
                 ('0x' || substring(md5(CAST(d.user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS arm
          FROM up_d d CROSS JOIN up_m m
          GROUP BY d.user_id),
        up_n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM up_p),
        up_h AS (
          SELECT x, CAST(count(*) AS BIGINT) AS c FROM up_p GROUP BY 1),
        up_t AS (
          SELECT x, COALESCE(CAST(sum(c) OVER (ORDER BY x DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cum_prev
          FROM up_h),
        up_dc AS (
          SELECT t.x, least(t.cum_prev * 10 // n.n_all, 9) + 1 AS decile
          FROM up_t t CROSS JOIN up_n n),
        up_g AS (
          SELECT d.decile,
                 CAST(sum(p.arm) AS BIGINT) AS n1,
                 CAST(sum(p.arm * p.conv) AS BIGINT) AS c1,
                 CAST(sum(1 - p.arm) AS BIGINT) AS n0,
                 CAST(sum((1 - p.arm) * p.conv) AS BIGINT) AS c0
          FROM up_p p JOIN up_dc d ON d.x = p.x
          GROUP BY 1),
        up_c AS (
          SELECT *,
                 CAST(sum(n1) OVER w AS BIGINT) AS cn1,
                 CAST(sum(c1) OVER w AS BIGINT) AS cc1,
                 CAST(sum(n0) OVER w AS BIGINT) AS cn0,
                 CAST(sum(c0) OVER w AS BIGINT) AS cc0
          FROM up_g
          WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW))
        SELECT decile, n1, c1, n0, c0,
               c1 * 1000000 // NULLIF(n1, 0)
                 - c0 * 1000000 // NULLIF(n0, 0) AS uplift_ppm,
               cc1 * 100 - cc0 * cn1 * 100 // NULLIF(cn0, 0) AS qini_x100
        FROM up_c ORDER BY decile"""),
      desc = "Qini uplift curve by score decile (histogram-first cuts, A/A arms)"),

    // ── Markov removal-effect attribution (the chain model) ─────────
    // The data-driven complement of e_attribution_multi's positional
    // credit (Anderl et al. 2016): per-user journeys to FIRST purchase
    // become first-order transitions over {START, event types, CONV,
    // NULL}; each channel's credit is its REMOVAL EFFECT — how much
    // P(conversion from START) drops when every transition into the
    // channel redirects to NULL. Conversion probability is the
    // FIXED-HORIZON (16-step) absorption, iterated as integer ppm
    // with per-term floor division — deterministic under any
    // partitioning, replayable by 16 unrolled oracle CTEs per variant
    // (the kmeans pattern; all 5 variants iterate as ONE keyed frame).
    //
    // Scale shape: one user-keyed scan + lag window builds the
    // transition counts; everything after is metadata scale (≤
    // |states|² rows × variants), iterated via broadcast-sized
    // materialized frames — at 100 TB the journeys scan dominates and
    // is a single shuffle on user_id.
    "e_markov_attribution" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val spark = s
        val ROUNDS = 16
        val base = ev(s, dir).select($"user_id", $"event_id",
          epochS($"ts").as("es"), $"event_type")
        // journey truncates at the FIRST purchase (the conversion);
        // (es, event_id) is the deterministic order (ts floors to
        // seconds, so event_id breaks the tie)
        val firstP = base.filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(min(struct($"es", $"event_id")).as("fp"))
        val jo = base.join(firstP, Seq("user_id"), "left")
          .filter($"fp".isNull || struct($"es", $"event_id") <= $"fp")
        val w = Window.partitionBy($"user_id").orderBy($"es", $"event_id")
        val steps = jo
          .withColumn("src", coalesce(lag($"event_type", 1).over(w),
            lit("START")))
          .withColumn("dst", when($"event_type" === "purchase",
            lit("CONV")).otherwise($"event_type"))
          .withColumn("rk", row_number().over(w))
        // unconverted journeys absorb into NULL after their last event
        val lastRk = jo.groupBy($"user_id").agg(count(lit(1)).as("mrk"))
        val terminal = steps
          .join(lastRk, Seq("user_id"))
          .join(firstP.select($"user_id"), Seq("user_id"), "left_anti")
          .filter($"rk" === $"mrk")
          .select($"event_type".as("src"), lit("NULL").as("dst"))
        val trans = steps.select($"src", $"dst")
          .unionByName(terminal)
          .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
        // variants: 'full' + one removal per non-conversion channel;
        // a removal redirects transitions INTO the channel to NULL
        // (probability mass conserved — counts re-aggregate, totals
        // per src unchanged)
        val channels = ev(s, dir).select($"event_type").distinct()
          .filter($"event_type" =!= "purchase")
        val variants = channels
          .select($"event_type".as("variant"), $"event_type".as("c"))
          .unionByName(Seq(("full", null.asInstanceOf[String]))
            .toDF("variant", "c"))
        val tv = trans.crossJoin(broadcast(variants))
          .withColumn("dst2",
            when($"dst" === $"c", lit("NULL")).otherwise($"dst"))
          .groupBy($"variant", $"src", $"dst2")
          .agg(sum($"n").as("n"))
        val tot = tv.groupBy($"variant", $"src").agg(sum($"n").as("t"))
        val tMat = graft.Engine.materialize(
          tv.join(tot, Seq("variant", "src"))
            .select($"variant", $"src", $"dst2".as("dst"),
              expr("n * 1000000 div t").as("p_ppm")),
          key = "variant", name = "markov_T")
        val convRows = graft.Engine.materialize(
          variants.select($"variant", lit("CONV").as("state"),
            lit(1000000L).as("p")),
          key = "variant", name = "markov_conv")
        var pk = convRows
        var pkT: Option[String] = None
        for (i <- 0 until ROUNDS) {
          val (next, nextT) = graft.Engine.materializeTracked(
            tMat
              .join(pk.select($"variant", $"state".as("dst"),
                $"p".as("pd")), Seq("variant", "dst"), "left")
              .withColumn("pd", coalesce($"pd", lit(0L)))
              .groupBy($"variant", $"src")
              .agg(sum(expr("p_ppm * pd div 1000000")).as("p"))
              .withColumnRenamed("src", "state")
              .unionByName(convRows),
            key = "variant", name = s"markov_p_${i % 2}")
          graft.Engine.dropMaterialized(spark, pkT)
          pk = next
          pkT = nextT
        }
        val pStart = pk.filter($"state" === "START")
          .select($"variant", $"p")
        val full = pStart.filter($"variant" === "full")
          .select($"p".as("p_full_ppm"))
        val eff = pStart.filter($"variant" =!= "full")
          .select($"variant".as("channel"), $"p".as("p_removed_ppm"))
          .crossJoin(broadcast(full))
          .withColumn("effect_ppm",
            greatest($"p_full_ppm" - $"p_removed_ppm", lit(0L)))
        val totEff = eff.agg(sum($"effect_ppm").as("te"))
        eff.crossJoin(broadcast(totEff))
          .select($"channel", $"p_full_ppm", $"p_removed_ppm",
            $"effect_ppm",
            expr("effect_ppm * 1000000 div nullif(te, 0)").as("share_ppm"))
          .orderBy($"channel")
      },
      oracle = Some({
        val rounds = (1 to 16).map { i => s"""
        mk_p$i AS MATERIALIZED (
          SELECT t.variant, t.src AS state,
                 CAST(sum(t.p_ppm * COALESCE(p.p, 0) // 1000000)
                   AS BIGINT) AS p
          FROM mk_T t
          LEFT JOIN mk_p${i - 1} p
            ON p.variant = t.variant AND p.state = t.dst
          GROUP BY 1, 2
          UNION ALL
          SELECT variant, 'CONV' AS state, CAST(1000000 AS BIGINT) AS p
          FROM mk_v)"""
        }.mkString(",")
        s"""
        WITH mk_e AS (
          SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
                 event_type
          FROM events),
        mk_r AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY es, event_id) AS rk
          FROM mk_e),
        mk_fp AS (
          SELECT user_id, min(rk) AS fprk
          FROM mk_r WHERE event_type = 'purchase' GROUP BY 1),
        mk_j AS (
          SELECT r.user_id, r.event_type, r.rk
          FROM mk_r r LEFT JOIN mk_fp f USING (user_id)
          WHERE f.fprk IS NULL OR r.rk <= f.fprk),
        mk_tr0 AS (
          SELECT user_id,
                 COALESCE(lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY rk), 'START') AS src,
                 CASE WHEN event_type = 'purchase' THEN 'CONV'
                      ELSE event_type END AS dst
          FROM mk_j),
        mk_last AS (SELECT user_id, max(rk) AS mrk FROM mk_j GROUP BY 1),
        mk_term AS (
          SELECT j.event_type AS src, 'NULL' AS dst
          FROM mk_j j
          JOIN mk_last l ON l.user_id = j.user_id AND j.rk = l.mrk
          LEFT JOIN mk_fp f ON f.user_id = j.user_id
          WHERE f.fprk IS NULL),
        mk_tr AS (
          SELECT src, dst FROM mk_tr0
          UNION ALL SELECT src, dst FROM mk_term),
        mk_ch AS (
          SELECT DISTINCT event_type AS c FROM events
          WHERE event_type <> 'purchase'),
        mk_v AS MATERIALIZED (
          SELECT 'full' AS variant, CAST(NULL AS VARCHAR) AS c
          UNION ALL SELECT c AS variant, c FROM mk_ch),
        mk_tv AS (
          SELECT v.variant, t.src,
                 CASE WHEN t.dst = v.c THEN 'NULL' ELSE t.dst END AS dst,
                 CAST(count(*) AS BIGINT) AS n
          FROM mk_tr t CROSS JOIN mk_v v
          GROUP BY 1, 2, 3),
        mk_tot AS (
          SELECT variant, src, CAST(sum(n) AS BIGINT) AS t
          FROM mk_tv GROUP BY 1, 2),
        mk_T AS MATERIALIZED (
          SELECT a.variant, a.src, a.dst, a.n * 1000000 // b.t AS p_ppm
          FROM mk_tv a
          JOIN mk_tot b ON b.variant = a.variant AND b.src = a.src),
        mk_p0 AS MATERIALIZED (
          SELECT variant, 'CONV' AS state, CAST(1000000 AS BIGINT) AS p
          FROM mk_v),$rounds,
        mk_ps AS (
          SELECT variant, p FROM mk_p16 WHERE state = 'START'),
        mk_eff AS MATERIALIZED (
          SELECT r.variant AS channel,
                 f.p AS p_full_ppm, r.p AS p_removed_ppm,
                 greatest(f.p - r.p, CAST(0 AS BIGINT)) AS effect_ppm
          FROM mk_ps r
          CROSS JOIN (SELECT p FROM mk_ps WHERE variant = 'full') f
          WHERE r.variant <> 'full')
        SELECT channel, p_full_ppm, p_removed_ppm, effect_ppm,
               effect_ppm * 1000000
                 // NULLIF(CAST((SELECT sum(effect_ppm) FROM mk_eff)
                     AS BIGINT), 0)
                 AS share_ppm
        FROM mk_eff ORDER BY channel"""
      }),
      desc = "Markov removal-effect attribution: 16-step integer absorption per removed channel"),

    // ── CUSUM change-point detection (the ops-dashboard monitor) ────
    // Page 1954's cumulative-sum control chart over the daily event
    // count, in its PREFIX closed form — the textbook recursion
    // S⁺_t = max(0, S⁺_{t-1} + x_t − μ − slack) is exactly
    // S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    // (x − μ − slack), so the whole chart is two cumsum windows + two
    // prefix-extreme windows over the calendar-bounded daily frame —
    // no sequential fold, no recursion, twin-able verbatim. μ = the
    // global mean daily count, slack = μ div 20 (the 5% allowance),
    // threshold h = μ div 2; all exact integers. Windows run over the
    // ≤ calendar-days frame (the e_seasonality allowlist class).
    "e_changepoint" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .select((epochS($"ts") / 86400L).cast(LongType).as("day"))
          .groupBy($"day").agg(count(lit(1)).as("n"))
        val stats = daily.agg(
          expr("sum(n) div count(1)").as("mu"))
        val w = Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(stats))
          .withColumn("slack", expr("mu div 20"))
          .withColumn("pp", sum($"n" - $"mu" - $"slack").over(w))
          .withColumn("pm", sum($"n" - $"mu" + $"slack").over(w))
          .withColumn("cusum_pos", $"pp" - least(lit(0L), min($"pp").over(w)))
          .withColumn("cusum_neg",
            greatest(lit(0L), max($"pm").over(w)) - $"pm")
          .withColumn("h", expr("mu div 2"))
          .withColumn("flag", $"cusum_pos" > $"h" || $"cusum_neg" > $"h")
          .select($"day", $"n", $"mu", $"cusum_pos", $"cusum_neg",
            $"flag")
          .orderBy($"day")
      },
      oracle = Some("""
        WITH cp_d AS (
          SELECT (epoch_us(ts)//1000000)//86400 AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        cp_s AS (
          SELECT CAST(sum(n) AS BIGINT) // count(*) AS mu FROM cp_d),
        cp_p AS (
          SELECT d.day, d.n, s.mu,
                 CAST(sum(d.n - s.mu - s.mu // 20) OVER w AS BIGINT) AS pp,
                 CAST(sum(d.n - s.mu + s.mu // 20) OVER w AS BIGINT) AS pm
          FROM cp_d d CROSS JOIN cp_s s
          WINDOW w AS (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)),
        cp_c AS (
          SELECT day, n, mu,
                 pp - least(CAST(0 AS BIGINT),
                   CAST(min(pp) OVER w AS BIGINT)) AS cusum_pos,
                 greatest(CAST(0 AS BIGINT),
                   CAST(max(pm) OVER w AS BIGINT)) - pm AS cusum_neg
          FROM cp_p
          WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW))
        SELECT day, n, mu, cusum_pos, cusum_neg,
               cusum_pos > mu // 2 OR cusum_neg > mu // 2 AS flag
        FROM cp_c ORDER BY day"""),
      desc = "CUSUM change-point chart in prefix closed form over the daily count")
  )
}
