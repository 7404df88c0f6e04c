package graft

import graft.operators.Vectors
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** The public Vectors API must reproduce the oracle-checked queries'
  * results when pointed at the same data. */
class VectorsApiSpec extends SparkSuite {
  import spark.implicits._

  private lazy val base = Vectors
    .quantize(Sources.table(spark, sf(), "embeddings"))
    .withColumn("id", $"vec_id")

  test("knnBrute matches the oracle-checked knn_brute query") {
    val api = Vectors.knnBrute(base.filter($"id" < 10), base, k = 5)
      .select($"query_id", $"rank", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oracle = SparkEntry.queries("knn_brute")(spark, sf())
      .select($"query_id", $"rank", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(api === oracle)
  }

  test("semanticDedupIncremental: all-new ≡ full edges, none-new ≡ empty") {
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = edges(Vectors.semanticDedupIncremental(base, lit(true)))
    // the full backfill's edge set must reach the same components the
    // batch API computes
    val comps = Vectors.semanticDedup(base).collect()
    assert(full.nonEmpty && comps.nonEmpty)
    val inc = edges(Vectors.semanticDedupIncremental(base,
      isNew = $"vec_id" % 10 < 2))
    assert(inc === full.filter(p => p._1 % 10 < 2 || p._2 % 10 < 2),
      "incremental must equal the backfill restricted to new sides")
    assert(edges(Vectors.semanticDedupIncremental(base, lit(false))).isEmpty,
      "nothing-new must yield nothing")
  }

  test("clusterSample: per-cell quota, exact two-phase top-m, deterministic") {
    val got = Vectors.clusterSample(base, kCells = 8, iters = 3,
        perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // quota respected per cell
    val perCell = got.groupBy(_._1).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 5), s"quota violated: ${perCell.toMap}")
    assert(perCell.size > 1, "sample must cover multiple cells")
    // the salted two-phase must equal a naive single-window reference
    val cent = Vectors.kmeansFit(base, 8, 3)
    val naive = base.crossJoin(broadcast(cent))
      .withColumn("score", expr("long_dot(sv, cvec)").cast("double") /
        sqrt($"nrm".cast("double") * $"cnrm".cast("double")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"id")
          .orderBy($"score".desc, $"cluster_id".asc)))
      .filter($"rn" === 1)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"cluster_id")
          .orderBy($"score".desc, $"id")))
      .filter($"rk" <= 5)
      .select($"cluster_id", $"rk", $"id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet === naive.toSet,
      "salted two-phase must equal the single-window reference")
    val again = Vectors.clusterSample(base, 8, 3, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSet === got.toSet, "sample must be reproducible")
  }

  test("ivfSearch nprobe=2 matches the ivf_multiprobe query") {
    val api = Vectors.ivfSearch(base, queryFilter = $"id" < 10,
        k = 3, nprobe = 2)
      .select($"query_id", $"rank", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oracle = SparkEntry.queries("ivf_multiprobe")(spark, sf())
      .select($"query_id", $"rank", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(api === oracle)
  }

  test("text_topics: 1-3 ranked terms per cluster, lift ordered, lift > 1 distinguishes") {
    val out = SparkEntry.queries("text_topics")(spark, sf()).cache()
    val byCluster = out.collect().groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rows.length), s"cluster $c ranks: ${ranks.mkString(",")}")
      val lifts = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("lift_x100"))
      assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
        s"cluster $c lifts not descending: ${lifts.mkString(",")}")
    }
    // a rank-1 label term is over-represented vs the corpus (lift > 1×)
    assert(out.filter($"rank" === 1 && $"lift_x100" <= 100L).count() === 0)
    out.unpersist()
  }
}
