package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over edge frames — the Pregel-style sibling
  * of [[Corpus.connectedComponents]]. The reference has no graph
  * operators (its lineage is star-schema SQL), but a training-data
  * pipeline ranks pages/documents by link structure constantly; this
  * is the fixed-round, oracle-replayable form.
  */
object Graphs {

  /** Fixed-round PageRank over a directed edge frame (src, dst) in
    * EXACT integer arithmetic, so the result is independent of
    * partitioning and replayable by an unrolled SQL oracle:
    *
    *  - ranks are longs scaled by `scale` (default 1e12);
    *  - r0(v)    = scale div N            (N = node count);
    *  - contrib  = sum over in-edges of rank(src) div deg(src) —
    *    long division then an exact long sum, associative under any
    *    aggregation order (the double-sum form is not);
    *  - r_i+1(v) = (15·(scale div N)) div 100
    *             + (85·contrib(v)) div 100.
    *
    * Nodes are all edge SOURCES (an undirected graph fed as both
    * directions has no dangling nodes, so no mass-leak correction is
    * needed; feed directed graphs with sink nodes through a
    * both-directions union or add their self-loops upstream).
    *
    * Scale shape: the per-round plan is ONE equi-join (edges+deg,
    * materialized once, bucketed on src at cluster scale) against the
    * node-sized rank frame, then a map-side-combined sum on dst —
    * the standard distributed PR iteration. Each round's ranks
    * materialize through [[graft.Engine.materialize]] (lineage
    * truncation; the previous round's table is dropped), so `rounds`
    * is wall-clock-linear, not lineage-exponential.
    *
    * Returns (node, rank) with rank in `scale` units. */
  /** Shared iteration prep: materialize the raw edge frame FIRST
    * (deg and edgesDeg both consume it, and the caller's edge build —
    * joins + distinct — is usually the expensive part; without this
    * it runs twice, the minhashPairs recompute defect class), then
    * the degree frame and the (src, dst, deg) join frame the
    * per-round step touches. */
  private def prepGraph(edges0: DataFrame): (DataFrame, DataFrame) = {
    val edges = graft.Engine.materialize(
      edges0.select(col("src"), col("dst")),
      key = "src", name = "pr_edges_raw")
    val deg = graft.Engine.materialize(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")),
      key = "src", name = "pr_deg")
    val edgesDeg = graft.Engine.materialize(
      edges.join(deg, Seq("src")),
      key = "src", name = "pr_edges")
    (deg, edgesDeg)
  }

  def pageRank(edges0: DataFrame, rounds: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    val spark = edges0.sparkSession
    val (deg, edgesDeg) = prepGraph(edges0)
    val n = deg.count()
    require(n > 0, "pageRank: empty edge frame")
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var ranks = deg.select(col("src").as("node"), lit(r0).as("rank"))
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .withColumn("c", expr("rank div deg"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("contrib"))
      val (next, nextT) = graft.Engine.materializeTracked(
        deg.select(col("src").as("node"))
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr("(85 * coalesce(contrib, 0)) div 100")).as("rank")),
        key = "node", name = s"pr_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      ranks = next
      prevT = nextT
    }
    ranks
  }

  /** Personalized PageRank: the teleport vector is concentrated on
    * `seeds0` (one `node` column) instead of uniform — random walks
    * restart at the seed set, so rank measures proximity-weighted
    * reachability FROM the seeds (the recommendation / related-items
    * form). Same exact-integer arithmetic, same per-round plan as
    * [[pageRank]]; the node frame carries an is_seed flag so the
    * restart term is a branch, not a join, inside each round.
    * Seeds outside the graph are ignored. Returns (node, rank). */
  def personalizedPageRank(edges0: DataFrame, seeds0: DataFrame,
                           rounds: Int = 3,
                           scale: Long = 1000000000000L): DataFrame = {
    val spark = edges0.sparkSession
    val (deg, edgesDeg) = prepGraph(edges0)
    val nodes = graft.Engine.materialize(
      deg.select(col("src").as("node"))
        .join(seeds0.select(col("node")).distinct()
          .withColumn("is_seed", lit(true)), Seq("node"), "left")
        .withColumn("is_seed", coalesce(col("is_seed"), lit(false))),
      key = "node", name = "ppr_nodes")
    val s = nodes.filter(col("is_seed")).count()
    require(s > 0, "personalizedPageRank: no seed is a graph node")
    val r0 = scale / s
    val base = (15L * r0) / 100L
    var ranks = nodes.select(col("node"),
      when(col("is_seed"), r0).otherwise(0L).as("rank"))
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .withColumn("c", expr("rank div deg"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("contrib"))
      val (next, nextT) = graft.Engine.materializeTracked(
        nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (when(col("is_seed"), base).otherwise(0L) +
              expr("(85 * coalesce(contrib, 0)) div 100")).as("rank")),
        key = "node", name = s"ppr_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      ranks = next
      prevT = nextT
    }
    ranks
  }

  /** Fixed-round multi-source BFS: hop distance from a seed set over
    * a directed edge frame (src, dst) — the reachability/coverage
    * probe beside [[personalizedPageRank]]'s proximity weighting
    * (how many hops separate every entity from a seed cohort, e.g.
    * crawl frontier depth or supplier blast-radius).
    *
    * Pure min-plus integer iteration, so the fixpoint is independent
    * of partitioning and the oracle unrolls the rounds:
    * dist_0 = 0 at seeds, UNREACHED (a large sentinel) elsewhere;
    * dist_{i+1}(v) = min(dist_i(v), min over edges u→v of
    * dist_i(u) + 1). A node's distance only decreases, and after r
    * rounds every node within r hops carries its true distance.
    * The sentinel (10^6) stands in for +∞ — explicit, not NULL,
    * because engines disagree on NULL handling in least().
    *
    * Per-round plan: ONE equi-join of the materialized edge frame
    * against the node-sized distance frame + a map-side-combined min
    * — the pageRank shape; per-round materialize+drop keeps rounds
    * wall-clock-linear. Returns (node, dist) for REACHED nodes only. */
  def bfs(edges0: DataFrame, seeds0: DataFrame,
          rounds: Int = 4): DataFrame = {
    val spark = edges0.sparkSession
    val unreached = 1000000L
    val (deg, edgesDeg) = prepGraph(edges0)
    val nodes = graft.Engine.materialize(
      deg.select(col("src").as("node"))
        .join(seeds0.select(col("node")).distinct()
          .withColumn("is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"),
          when(col("is_seed"), 0L).otherwise(unreached).as("d0")),
      key = "node", name = "bfs_nodes")
    var dist = nodes.select(col("node"), col("d0").as("dist"))
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val reach = edgesDeg
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("dist") + 1L).as("reach"))
      val (next, nextT) = graft.Engine.materializeTracked(
        dist.join(reach.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            least(col("dist"),
              coalesce(col("reach"), lit(unreached))).as("dist")),
        key = "node", name = s"bfs_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      dist = next
      prevT = nextT
    }
    dist.filter(col("dist") < unreached)
  }

  /** Harmonic centrality of a SEED set under a hop budget (the
    * harmonic variant of closeness, Boldi & Vigna 2014 — Σ 1/d(s, v)
    * converges on disconnected graphs where closeness does not).
    * Per-seed multi-source BFS: state is (seed, node, dist) —
    * O(|seeds| · |reached|) — which is why the operator takes a
    * BOUNDED seed set (hubs, suspects, a new-node batch), never all
    * nodes; all-pairs harmonic at scale is the HyperBall counter
    * algorithm, a different machine. Each round is one equi-join of
    * the materialized edge frame + a union-merge grouped min (the
    * [[bfs]] cost shape per seed); terms are exact 1000000 div d.
    *
    * Returns (seed, n_reached, harmonic_x1e6) — the seed itself
    * (dist 0) is excluded from both. */
  def harmonic(edges0: DataFrame, seeds0: DataFrame,
               rounds: Int = 3): DataFrame = {
    val spark = edges0.sparkSession
    val edges = graft.Engine.materialize(
      edges0.select(col("src"), col("dst")),
      key = "src", name = "harm_edges")
    var dist = seeds0.select(col("node").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val reach = edges
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("seed"), col("dst").as("node"),
          (col("dist") + 1L).as("dist"))
      val (next, nextT) = graft.Engine.materializeTracked(
        dist.unionByName(reach).groupBy(col("seed"), col("node"))
          .agg(min(col("dist")).as("dist")),
        key = "node", name = s"harm_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      dist = next
      prevT = nextT
    }
    dist.filter(col("dist") > 0L)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_x1e6"))
  }

  /** Fixed-round weighted single-source shortest path — [[bfs]]'s
    * min-plus relaxation with an integer edge weight (Bellman-Ford
    * rounds, the distributed SSSP everyone actually runs: after r
    * rounds every node whose shortest path uses ≤ r edges carries its
    * true distance). dist_{i+1}(v) = min(dist_i(v), min over u→v of
    * dist_i(u) + w(u,v)); weights must be non-negative longs (cents —
    * never doubles, the determinism contract). The 10^15 sentinel
    * plays +∞ and cannot overflow under one relaxation (w bounded by
    * 2^62 − 10^15).
    *
    * Per-round plan and cost are exactly [[bfs]]'s: one equi-join of
    * the materialized weighted edge frame against the node-sized
    * distance frame, one map-side-combined min, per-round
    * materialize+drop. `edges0` carries (src, dst, w); returns
    * (node, dist) for reached nodes. */
  def sssp(edges0: DataFrame, seeds0: DataFrame,
           rounds: Int = 4): DataFrame = {
    val spark = edges0.sparkSession
    val unreached = 1000000000000000L
    val edges = graft.Engine.materialize(
      edges0.select(col("src"), col("dst"), col("w")),
      key = "src", name = "sssp_edges")
    val nodes = graft.Engine.materialize(
      edges.select(col("src").as("node")).distinct()
        .join(seeds0.select(col("node")).distinct()
          .withColumn("is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"),
          when(col("is_seed"), 0L).otherwise(unreached).as("d0")),
      key = "node", name = "sssp_nodes")
    var dist = nodes.select(col("node"), col("d0").as("dist"))
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val reach = edges
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("dist") + col("w")).as("reach"))
      val (next, nextT) = graft.Engine.materializeTracked(
        dist.join(reach.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            least(col("dist"),
              coalesce(col("reach"), lit(unreached))).as("dist")),
        key = "node", name = s"sssp_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      dist = next
      prevT = nextT
    }
    dist.filter(col("dist") < unreached)
  }

  /** Fixed-round synchronous label propagation (LPA community
    * detection, Raghavan et al. 2007) over a directed edge frame:
    * every node starts as its own label; each round it adopts the
    * most frequent label among its in-neighbors, ties broken by the
    * SMALLEST label — exact integer counts + explicit tie order make
    * the fixed-round fixpoint partitioning-independent, so the
    * oracle unrolls the rounds (the pageRank contract). Synchronous
    * updates (all nodes flip on the previous round's labels), so no
    * sequential-scan order enters.
    *
    * Per-round plan: one equi-join of the materialized edge frame
    * against the node-sized label frame, a map-side-combined
    * (node, label) count, then a max_by argmax — no window sort.
    * Returns (node, community). */
  def labelPropagation(edges0: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = edges0.sparkSession
    val (deg, edgesDeg) = prepGraph(edges0)
    var labels = deg.select(col("src").as("node"), col("src").as("lbl"))
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val gathered = edgesDeg.select(col("src"), col("dst"))
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      val (next, nextT) = graft.Engine.materializeTracked(
        gathered.groupBy(col("dst"))
          // argmax by (count DESC, label ASC): labels are unique
          // within a group, so (c, -lbl) has no ties and max_by is
          // deterministic
          .agg(max_by(col("lbl"),
            struct(col("c"), (-col("lbl")).as("neg"))).as("lbl"))
          .select(col("dst").as("node"), col("lbl")),
        key = "node", name = s"lpa_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      labels = next
      prevT = nextT
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Fixed-round k-core peel (Seidman, Social Networks 1983): per
    * round, drop every node whose degree in the SURVIVING subgraph is
    * < k, then drop edges touching dropped nodes; repeat. After
    * enough rounds the fixpoint is the k-core — the standard
    * "dense enough to matter" subgraph filter ahead of community /
    * embedding passes. Fixed `rounds` keeps the plan finite and the
    * oracle replayable round-for-round (the probeFit contract); the
    * peel is monotone, so results after r rounds are a deterministic
    * over-approximation of the core that both engines compute
    * identically whether or not r reached the fixpoint. At cluster
    * scale run extra rounds until a round deletes nothing — one
    * driver-side count per round, every heavy frame stays
    * distributed.
    *
    * Per-round plan: one hash aggregate on src (degree — the input
    * carries BOTH directions of each edge, so src-degree IS
    * node-degree) + two semi-joins (endpoint survival), materialize,
    * drop the superseded round. Input: undirected edge list (src,
    * dst) with both directions present. Returns (node, core_deg) =
    * surviving nodes with their in-core degree. */
  def kCore(edges0: DataFrame, k: Int, rounds: Int = 4): DataFrame = {
    val spark = edges0.sparkSession
    var edges = graft.Engine.materialize(
      edges0.select(col("src"), col("dst")),
      key = "src", name = "kcore_edges")
    var prevT: Option[String] = None
    for (i <- 0 until rounds) {
      val alive = edges.groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src"))
      val (next, nextT) = graft.Engine.materializeTracked(
        edges
          .join(alive, Seq("src"), "left_semi")
          .join(alive.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst")),
        key = "src", name = s"kcore_round_${i % 2}")
      graft.Engine.dropMaterialized(spark, prevT)
      edges = next
      prevT = nextT
    }
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_deg"))
  }

  /** Per-node triangle participation counts over an undirected graph
    * given as distinct (a, b) pairs with a < b.
    *
    * Uses the DEGREE-ORIENTED join (the classic skew armor): every
    * edge is directed from its lower-(degree, id) endpoint to the
    * higher one, so each node's out-degree is O(√m) even at a hub of
    * degree n — the wedge join (A⋈A on the middle node) is bounded by
    * Σ outdeg² = O(m^1.5) instead of the naive Σ deg² which a single
    * celebrity node turns quadratic. Wedges close against the oriented
    * edge list by a hash semi-join; all frames are ids-only.
    *
    * Returns (node, n_tri), every node of ≥1 triangle. */
  def triangles(pairs0: DataFrame): DataFrame = {
    val pairs = graft.Engine.materialize(
      pairs0.select(col("a"), col("b")),
      key = "a", name = "tri_pairs")
    val deg = pairs.select(col("a").as("node"))
      .union(pairs.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u → v iff (deg(u), u) < (deg(v), v)
    val withDeg = pairs
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = graft.Engine.materialize(
      withDeg.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("v")),
      key = "u", name = "tri_oriented")
    // wedges u→v, u→w (v < w by oriented order of the second hop) close
    // iff v→w is an oriented edge
    val wedges = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") =!= col("w"))
      // each unordered wedge once: close against BOTH v→w and w→v is
      // redundant since exactly one orientation exists — normalize by
      // joining on the pair as-is and as swapped via least/greatest
      .select(col("u"), least(col("v"), col("w")).as("x"),
        greatest(col("v"), col("w")).as("y"))
      .distinct()
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y"))
        .union(oriented.select(col("v").as("x"), col("u").as("y"))),
      Seq("x", "y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Common-neighbor link prediction (the Liben-Nowell/Kleinberg 2003
    * baseline): for every NON-adjacent pair (a, b) sharing at least
    * `minCommon` neighbors, the common-neighbor count and the
    * neighbor-set Jaccard in exact ppm — the "who should be
    * connected" scoring a recommender or graph-completion pipeline
    * runs. Input is the distinct undirected edge set as (a, b) pairs
    * with a < b; returns the `topK` candidates by (jaccard_ppm desc,
    * a, b).
    *
    * Skew armor: candidate pairs are generated through wedge CENTERS
    * only, and centers with degree > `maxDegree` are excluded from
    * wedge generation (the winnowPairs absolute-cap posture) — a hub
    * of degree d would otherwise emit d² candidate pairs, and at
    * 100 TB a celebrity node turns the wedge join quadratic. A
    * capped hub still contributes to both endpoints' DEGREES (the
    * Jaccard denominator stays exact); only its testimony as a
    * shared neighbor is dropped, which is the standard trade — a
    * neighbor shared with everyone carries no signal. The wedge join
    * is bounded by Σ_capped deg² ≤ maxDegree·m; everything else is
    * ids-only hash joins and one TakeOrderedAndProject. */
  def linkPredict(pairs0: DataFrame, maxDegree: Long = 64L,
                  minCommon: Long = 2L, topK: Int = 100): DataFrame = {
    val pairs = graft.Engine.materialize(
      pairs0.select(col("a"), col("b")),
      key = "a", name = "lp_pairs")
    val adj = pairs.select(col("a").as("node"), col("b").as("nb"))
      .union(pairs.select(col("b").as("node"), col("a").as("nb")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val adjCapped = adj.join(
      deg.filter(col("deg") <= maxDegree).select(col("node")), Seq("node"))
    val wedges = adjCapped.select(col("node"), col("nb").as("x"))
      .join(adjCapped.select(col("node"), col("nb").as("y")), Seq("node"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .select(col("x").as("a"), col("y").as("b"), col("n_common"))
    wedges
      .join(pairs, Seq("a", "b"), "left_anti") // predicted, not present
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")),
        Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")),
        Seq("b"))
      .withColumn("jaccard_ppm",
        expr("n_common * 1000000L div (deg_a + deg_b - n_common)"))
      .select(col("a"), col("b"), col("n_common"), col("deg_a"),
        col("deg_b"), col("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("a"), col("b"))
      .limit(topK)
  }
}
