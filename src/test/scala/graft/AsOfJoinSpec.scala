package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** Native AsOfJoinExec vs the composed union+window form, plus edge
  * semantics (no prior match → nulls; at-tie match counts). */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("native as-of join matches the composed formulation on testdata") {
    val native = SparkEntry.queries("j_asof_native")(spark, sf()).collect()
    val composed = SparkEntry.queries("j_asof")(spark, sf()).collect()
    assert(native.length === composed.length)
    assert(native.map(_.toSeq).toSet === composed.map(_.toSeq).toSet)
  }

  test("edge semantics: unmatched rows null, ties at equal time match") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, "c_at_10"), (1L, 15L, "c_at_15"),
      (3L, 1L, "other_key")).toDF("rk", "rt", "rname")
    val out = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt")
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p1") === "c_at_10") // tie at equal time matches
    assert(out("p2") === "c_at_15") // latest at-or-before
    assert(out("p3") === null)      // no right rows for key 2
  }

  test("tolerance rejects stale matches but keeps fresh ones") {
    val left = Seq((1L, 100L, "fresh"), (1L, 200L, "stale"),
      (1L, 105L, "at_edge")).toDF("k", "t", "name")
    val right = Seq((1L, 95L, "c95")).toDF("rk", "rt", "rname")
    val out = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        tolerance = Some(10L))
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("fresh") === "c95")    // gap 5 ≤ 10
    assert(out("at_edge") === "c95")  // gap 10 ≤ 10 (inclusive)
    assert(out("stale") === null)     // gap 105 > 10 → rejected
  }

  test("NULL keys never match (SQL equi-join semantics)") {
    val left = Seq(
      (Option(1L), 10L, "k1"),
      (Option.empty[Long], 10L, "lnull"),
      (Option(2L), 10L, "k2_nomatch"))
      .toDF("k", "t", "name")
    val right = Seq(
      (Option(1L), 5L, "r_k1"),
      (Option.empty[Long], 5L, "r_null"),
      (Option(3L), 5L, "r_k3"))
      .toDF("rk", "rt", "rname")
    val out = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt")
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("k1") === "r_k1")        // normal match unaffected
    assert(out("lnull") === null)       // left NULL key → no match
    assert(out("k2_nomatch") === null)  // right NULL key never a candidate
  }

  test("NULL in one field of a composite key never matches") {
    val left = Seq(
      (Option(1L), Option(1L), 10L, "both"),
      (Option(1L), Option.empty[Long], 10L, "partial_null"))
      .toDF("k1", "k2", "t", "name")
    val right = Seq(
      (Option(1L), Option(1L), 5L, "r_both"),
      (Option(1L), Option.empty[Long], 5L, "r_partial"))
      .toDF("rk1", "rk2", "rt", "rname")
    val out = AsOf.join(left, right,
      Seq(("k1", "rk1"), ("k2", "rk2")), "t", "rt")
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("both") === "r_both")
    assert(out("partial_null") === null) // null field blocks the match
  }

  test("plan contains the custom AsOfJoinExec") {
    val e = graft.sources.Sources.table(spark, sf(), "events")
      .withColumn("es", unix_timestamp($"ts"))
    val l = e.filter($"event_type" === "purchase")
      .select($"user_id", $"es", $"event_id")
    val r = e.filter($"event_type" === "click")
      .select($"user_id".as("ru"), $"es".as("res"), $"event_id".as("rid"))
    val joined = AsOf.join(l, r, Seq(("user_id", "ru")), "es", "res")
    // SparkPlan.nodeName strips the Exec suffix → prints as "AsOfJoin"
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"custom exec not planned:\n$p")
    assert(joined.count() === l.count()) // left outer: one row per left
  }

  test("column pruning pushes through the as-of join to the scan") {
    // join full-schema scans, then select a narrow projection — the
    // PruneAsOfJoinColumns rule must narrow both children so the
    // parquet ReadSchema excludes untouched columns (props, value)
    val e = graft.sources.Sources.table(spark, sf(), "events")
      .withColumn("es", unix_timestamp($"ts"))
    val l = e.filter($"event_type" === "purchase")
    val r = e.select($"user_id".as("ru"), $"es".as("res"),
      $"event_id".as("rid"), $"props".as("rprops"), $"value".as("rvalue"))
    val joined = AsOf.join(l, r, Seq(("user_id", "ru")), "es", "res")
      .select($"event_id", $"rid")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("props"), s"props not pruned from scans:\n$p")
    assert(joined.count() === l.count())
  }

  test("left-side filters push below the as-of join (custom Rule)") {
    val e = graft.sources.Sources.table(spark, sf(), "events")
      .withColumn("es", unix_timestamp($"ts"))
    val l = e.filter($"event_type" === "purchase")
      .select($"user_id", $"es", $"event_id")
    val r = e.filter($"event_type" === "click")
      .select($"user_id".as("ru"), $"es".as("res"), $"event_id".as("rid"))
    val joined = AsOf.join(l, r, Seq(("user_id", "ru")), "es", "res")
      .filter($"user_id" < 5) // left-side predicate above the join
    val opt = joined.queryExecution.optimizedPlan
    // after PushFilterThroughAsOfJoin the AsOfJoin node must not have a
    // Filter PARENT carrying the user_id predicate
    val stillAbove = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[graft.plans.AsOfJoin] &&
          f.condition.toString.contains("user_id") => f
    }
    assert(stillAbove.isEmpty, s"filter not pushed:\n$opt")
    // and correctness: same as filtering the left input directly
    val direct = AsOf.join(l.filter($"user_id" < 5), r,
      Seq(("user_id", "ru")), "es", "res")
    assert(joined.count() === direct.count())
  }
}
