package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Exact-integer PageRank: hand-computed fixture, mass conservation,
  * and partition invariance (the determinism the oracle relies on). */
class GraphsSpec extends SparkSuite {
  import spark.implicits._

  // path graph 1—2—3 fed undirected: deg(1)=deg(3)=1, deg(2)=2
  private def path3 = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")

  test("pageRank reproduces the hand-computed 3-node fixpoint round") {
    val r = Graphs.pageRank(path3, rounds = 1, scale = 3000L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0 = 3000/3 = 1000 each; base = 15*1000/100 = 150
    // contrib(1) = contrib(3) = r0(2)/deg(2) = 500 → 150 + 85*500/100 = 575
    // contrib(2) = r0(1)/1 + r0(3)/1 = 2000     → 150 + 85*2000/100 = 1850
    assert(r === Map(1L -> 575L, 2L -> 1850L, 3L -> 575L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_")
  }

  test("rank mass is conserved up to div rounding and the center dominates") {
    val r = Graphs.pageRank(path3, rounds = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val total = r.values.sum
    // each round loses < 1 unit per node per div (three divs/round)
    assert(math.abs(total - 1000000000000L) < 100L,
      s"mass leak: $total")
    assert(r(2L) > r(1L) && r(1L) === r(3L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_")
  }

  test("personalizedPageRank restarts at the seeds and decays with distance") {
    val r = graft.operators.Graphs.personalizedPageRank(
        path3, Seq(Tuple1(1L)).toDF("node"), rounds = 1, scale = 1000L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0 = (1000, 0, 0); base(seed) = 150
    // contrib(2) = r0(1)/deg(1) = 1000 → r(2) = 0 + 85*1000/100 = 850
    // contrib(1) = r0(2)/2 = 0 → r(1) = 150; r(3) = 0
    assert(r === Map(1L -> 150L, 2L -> 850L, 3L -> 0L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_"); purgeMatTables("ppr_")
  }

  test("triangles counts K4 and ignores the square") {
    // K4 on 1-4 (4 triangles, each node in 3) + square 5-6-7-8 (none)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val square = Seq((5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L))
    val out = graft.operators.Graphs.triangles(
        (k4 ++ square).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("tri_")
  }

  test("bfs layers the path graph and drops nodes beyond the round budget") {
    // path 1—2—3—4—5 undirected, seed {1}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r2 = Graphs.bfs(e, seeds, rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_"); purgeMatTables("bfs_")
    val r4 = Graphs.bfs(e, seeds, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r4 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_"); purgeMatTables("bfs_")
  }

  test("bfs takes the shorter of two routes to the same node") {
    // cycle 1-2-3-4-1 plus chord 1-3, seeds {1}: dist(3) = 1 via chord
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r = Graphs.bfs(e, Seq(Tuple1(1L)).toDF("node"), rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_"); purgeMatTables("bfs_")
  }

  test("labelPropagation converges two disjoint triangles to their min labels") {
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val e = (tri1 ++ tri2)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r = Graphs.labelPropagation(e, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: 1→2, 2→1, 3→1 / 4→5, 5→4, 6→4; round 2 pulls everyone
    // onto the minimum; round 3 is stable
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("pr_"); purgeMatTables("lpa_")
  }

  test("linkPredict closes the square and a hub stays capped out") {
    // square a-b-c-d-a: the two diagonals are the only predictions,
    // each with both off-diagonal nodes as common neighbors —
    // jaccard = 2/(2+2-2) = 1e6 exactly
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val got = Graphs.linkPredict(sq, maxDegree = 64L, minCommon = 2L,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5)))
    assert(got.toSet === Set((1L, 3L, 2L, 1000000L),
      (2L, 4L, 2L, 1000000L)), s"got ${got.toSeq}")
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("lp_")
    // star: center 100 with 5 leaves. With the center capped out
    // (maxDegree = 4 < 5) no wedge survives — a celebrity node
    // testifies for no candidate pair; leaves (deg 1) center no wedge
    val star = (1L to 5L).map(i => (i, 100L)).toDF("a", "b")
    val capped = Graphs.linkPredict(star, maxDegree = 4L,
      minCommon = 1L, topK = 10).count()
    assert(capped === 0L)
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("lp_")
    // same star uncapped: all C(5,2) leaf pairs predicted with 1
    // common neighbor; jaccard = 1/(1+1-1) = 1e6
    val open = Graphs.linkPredict(star, maxDegree = 64L,
      minCommon = 1L, topK = 100).collect()
    assert(open.length === 10 && open.forall(_.getLong(5) === 1000000L))
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("lp_")
  }

  test("ranks are identical under different input partitioning") {
    val e = (1L to 40L).flatMap { i =>
      val j = i % 20 + 1
      if (i == j) Nil else Seq((i, j), (j, i))
    }.distinct.toDF("src", "dst")
    def run(parts: Int): Map[Long, Long] = {
      val out = Graphs.pageRank(e.repartition(parts), rounds = 2)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      graft.Engine.dropAllMaterialized(spark)
      purgeMatTables("pr_")
      out
    }
    assert(run(1) === run(7))
  }
}
