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

  test("native nearest direction matches the composed j_asof_nearest") {
    val native = SparkEntry.queries("j_asof_native_nearest")(spark, sf())
      .collect()
    val composed = SparkEntry.queries("j_asof_nearest")(spark, sf())
      .collect()
    assert(native.length === composed.length)
    assert(native.map(_.toSeq).toSet === composed.map(_.toSeq).toSet)
  }

  test("forward direction: first at-or-after, equal time matches, tolerance") {
    val left = Seq((1L, 10L, "p_before"), (1L, 15L, "p_at"),
      (1L, 40L, "p_far"), (2L, 5L, "p_nomatch"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 15L, "c15"), (1L, 30L, "c30"))
      .toDF("rk", "rt", "rname")
    val out = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        direction = "forward")
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p_before") === "c15")  // first at-or-after 10
    assert(out("p_at") === "c15")      // equal time IS a forward match
    assert(out("p_far") === null)      // nothing at-or-after 40
    assert(out("p_nomatch") === null)  // no right rows for key 2
    val tol = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        direction = "forward", tolerance = Some(3L))
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tol("p_before") === null)   // gap 5 > 3 → rejected
    assert(tol("p_at") === "c15")      // gap 0 ≤ 3
  }

  test("nearest direction: smaller |delta| wins, ties backward, tolerance") {
    val left = Seq((1L, 10L, "closer_behind"), (1L, 18L, "closer_ahead"),
      (1L, 15L, "tie"), (1L, 100L, "behind_only"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 9L, "c9"), (1L, 21L, "c21"))
      .toDF("rk", "rt", "rname")
    val out = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        direction = "nearest")
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("closer_behind") === "c9")   // |1| < |11|
    assert(out("closer_ahead") === "c21")   // |3| < |9|
    assert(out("tie") === "c9")             // |6| = |6| → backward
    assert(out("behind_only") === "c21")    // only a backward candidate
    val tol = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        direction = "nearest", tolerance = Some(5L))
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tol("closer_behind") === "c9")  // |1| ≤ 5
    assert(tol("closer_ahead") === "c21")  // |3| ≤ 5
    assert(tol("tie") === null)            // both |6| > 5 → no match
    assert(tol("behind_only") === null)    // |79| > 5
  }

  test("nearest falls forward when the backward candidate breaks tolerance") {
    // backward at |8| fails tol=5, forward at |7| passes — the pick
    // must consider per-candidate tolerance, not pick-then-filter
    val left = Seq((1L, 20L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 12L, "c12"), (1L, 27L, "c27"))
      .toDF("rk", "rt", "rname")
    val out = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        direction = "nearest", tolerance = Some(7L))
      .select($"name", $"rname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p") === "c27")
  }

  test("all directions match a brute-force reference on random data") {
    // the merge pass is hand-written execution code — drive it with
    // randomized fixtures (duplicate keys, clustered times, nulls on
    // keys and times, keys present on only one side) against an
    // O(n·m) in-memory reference for every (direction, tolerance)
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val leftRows = (1 to 120).map { i =>
        (if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(5).toLong),
          if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(50).toLong),
          i.toLong)
      }
      // right times deduped per (key, time) — the operator's
      // documented determinism precondition
      val rightRows = (1 to 100).map { j =>
        (if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(5).toLong),
          if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(50).toLong),
          (1000 + j).toLong)
      }.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val left = leftRows.toDF("k", "t", "lid")
      val right = rightRows.toDF("rk", "rt", "rid")
      def brute(dir: String, tol: Option[Long]): Map[Long, Option[Long]] =
        leftRows.map { case (k, t, lid) =>
          val pick: Option[Long] = (k, t) match {
            case (Some(kk), Some(tt)) =>
              val cands = rightRows.filter(r =>
                r._1.contains(kk) && r._2.isDefined)
              val back = cands.filter(_._2.get <= tt)
                .filter(r => tol.forall(tt - r._2.get <= _))
                .sortBy(r => (r._2.get, r._3)).lastOption
              val fwd = cands.filter(_._2.get >= tt)
                .filter(r => tol.forall(r._2.get - tt <= _))
                .sortBy(r => (r._2.get, r._3)).headOption
              dir match {
                case "backward" => back.map(_._3)
                case "forward" =>
                  // equal-time: the operator picks the consumed run's
                  // last row — with deduped (key, time) it is THE row
                  if (back.exists(_._2.get == tt)) back.map(_._3)
                  else fwd.map(_._3)
                case _ =>
                  (back, fwd) match {
                    case (Some(b), Some(f)) =>
                      Some(if (tt - b._2.get <= f._2.get - tt) b._3
                        else f._3)
                    case (b, f) => b.orElse(f).map(_._3)
                  }
              }
            case _ => None
          }
          lid -> pick
        }.toMap
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(7L))) {
        val got = AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
            tolerance = tol, direction = dir)
          .select($"lid", $"rid").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val want = brute(dir, tol)
        assert(got.size === leftRows.size)
        val diff = want.keys.filter(k => got(k) != want(k))
        assert(diff.isEmpty,
          s"trial $trial dir=$dir tol=$tol mismatches: " +
            diff.take(5).map(k => s"lid=$k got=${got(k)} want=${want(k)}")
              .mkString(", "))
      }
    }
  }

  test("unknown direction fails fast") {
    val left = Seq((1L, 10L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, "c")).toDF("rk", "rt", "rname")
    intercept[IllegalArgumentException] {
      AsOf.join(left, right, Seq(("k", "rk")), "t", "rt",
        direction = "sideways")
    }
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
    for (dir <- Seq("backward", "nearest")) {
      val joined = AsOf.join(l, r, Seq(("user_id", "ru")), "es", "res",
          direction = dir)
        .select($"event_id", $"rid")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("props"), s"props not pruned ($dir):\n$p")
      assert(joined.count() === l.count())
    }
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
