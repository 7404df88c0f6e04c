package graft

import graft.operators.ExtendedQueries
import org.apache.spark.sql.functions._

/** Hand-computable domination laws for the banded Pareto skyline —
  * the oracle proves decomposition ≡ definition at corpus scale; this
  * pins the edge semantics (ties, duplicates, strictness) on a
  * constructed frame. */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  test("skyline keeps the frontier: strictness, same-cost ties, exact dups") {
    // minimize cents, maximize size
    val df = Seq(
      ("A", 90L, 3L),   // cheapest of all → kept (nothing ≤ cost & ≥ gain)
      ("B", 100L, 5L),  // kept; exact duplicate of C — neither strictly
      ("C", 100L, 5L),  //   dominates, BOTH stay
      ("D", 100L, 4L),  // same cost as B/C, smaller size → dominated
      ("E", 110L, 6L),  // kept (bigger than anything cheaper)
      ("F", 120L, 6L),  // E is strictly cheaper at equal size → dominated
      ("G", 130L, 1L)   // dominated by everything cheaper and bigger
    ).toDF("id", "cents", "size")
    val got = ExtendedQueries.skyline(df, "cents", "size")
      .select($"id").collect().map(_.getString(0)).sorted.toSeq
    assert(got === Seq("A", "B", "C", "E"))
  }

  test("skyline of a single row and of identical rows is the input") {
    val one = Seq(("X", 5L, 5L)).toDF("id", "cents", "size")
    assert(ExtendedQueries.skyline(one, "cents", "size").count() === 1)
    val same = Seq(("X", 5L, 5L), ("Y", 5L, 5L), ("Z", 5L, 5L))
      .toDF("id", "cents", "size")
    assert(ExtendedQueries.skyline(same, "cents", "size").count() === 3)
  }

  test("skyline agrees with the naive NOT-EXISTS definition on random-ish data") {
    // deterministic pseudo-random points from hashes — cross-check
    // the banded decomposition against a definitional anti-join
    val pts = spark.range(200).select($"id",
      expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 4), 16, 10) AS BIGINT)").as("cents"),
      expr("CAST(conv(substring(md5(CAST(id AS STRING)), 5, 4), 16, 10) AS BIGINT)").as("size"))
    val banded = ExtendedQueries.skyline(pts, "cents", "size")
      .select($"id").collect().map(_.getLong(0)).toSet
    val naive = pts.as("a").join(pts.as("b"),
        $"b.cents" <= $"a.cents" && $"b.size" >= $"a.size" &&
          ($"b.cents" < $"a.cents" || $"b.size" > $"a.size"),
        "left_anti")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(banded === naive)
  }
}
