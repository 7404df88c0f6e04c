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
  def pageRank(edges0: DataFrame, rounds: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    val spark = edges0.sparkSession
    // materialize the raw edge frame FIRST: deg and edgesDeg both
    // consume it, and the caller's edge build (joins + distinct) is
    // usually the expensive part — without this it runs twice (the
    // minhashPairs recompute defect class)
    val edges = graft.Engine.materialize(
      edges0.select(col("src"), col("dst")),
      key = "src", name = "pr_edges_raw")
    val deg = graft.Engine.materialize(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")),
      key = "src", name = "pr_deg")
    // one frame carries (src, dst, deg): the per-round join touches
    // exactly one materialized input plus the small rank frame
    val edgesDeg = graft.Engine.materialize(
      edges.join(deg, Seq("src")),
      key = "src", name = "pr_edges")
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
}
