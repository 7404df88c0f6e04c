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

  test("kmeansAssignIncremental: backfill ≡ full assignment, none-new ≡ empty, batch-split invariant") {
    def asgSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // all-new backfill law: assigning the training corpus against its
    // own frozen codebook IS the batch path's final assignment step
    val full = asgSet(Vectors.kmeansAssign(base, kCells = 8, iters = 3,
      nprobe = 1))
    val backfill = asgSet(Vectors.kmeansAssignIncremental(base, base,
      kCells = 8, iters = 3))
    assert(backfill === full, "newBatch = oldBase must equal kmeansAssign")
    // none-new law
    assert(Vectors.kmeansAssignIncremental(base, base.filter(lit(false)),
      kCells = 8, iters = 3).isEmpty, "empty batch must assign nothing")
    // batch-split invariance: frozen-codebook assignment has no
    // cross-row state, so daily batching merges exactly
    val b1 = Vectors.kmeansAssignIncremental(base,
      base.filter($"id" % 2 === 0), kCells = 8, iters = 3)
    val b2 = Vectors.kmeansAssignIncremental(base,
      base.filter($"id" % 2 === 1), kCells = 8, iters = 3)
    assert((asgSet(b1) union asgSet(b2)) === backfill,
      "split batches must union to the full backfill assignment")
  }

  test("kmeansDriftStats: zero drift on empty batch, counts conserve, ppm bounded") {
    val cells = Vectors.kmeansFit(base, 8, 3).count()
    val none = Vectors.kmeansDriftStats(base, base.filter(lit(false)),
      kCells = 8, iters = 3).collect()
    assert(none.length === cells, "one drift row per frozen codebook cell")
    assert(none.forall(r => r.getLong(2) === 0L && r.getLong(3) === 0L &&
      r.getLong(4) === 0L), "no new vectors → zero drift everywhere")
    val half = Vectors.kmeansDriftStats(base.filter($"id" < 250),
      base.filter($"id" >= 250), kCells = 8, iters = 3).collect()
    val nBase = half.map(_.getLong(1)).sum
    val nNew = half.map(_.getLong(2)).sum
    assert(nBase === base.filter($"id" < 250).count(),
      "n_base must conserve the old corpus")
    assert(nNew === base.filter($"id" >= 250).count(),
      "n_new must conserve the new batch")
    assert(half.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000000L),
      "new_share_ppm must stay in [0, 1e6]")
  }

  test("ivfCellSplit: membership conserves, only oversized cells split, seeds separate") {
    val asg = Vectors.kmeansAssign(base, 8, 3, nprobe = 1)
      .filter($"rn" === 1).select($"id", $"cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val split = Vectors.ivfCellSplit(base, kCells = 8, iters = 3,
        factor = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every vector appears exactly once, with its shared-frame cell
    assert(split.length === asg.size)
    split.foreach { case (id, old, _) => assert(asg(id) === old) }
    // new ids are the stable arithmetic: old*2 or old*2+1, and the
    // +1 form only appears for cells that actually split in two
    val byOld = split.groupBy(_._2)
    byOld.foreach { case (old, rows) =>
      val newCells = rows.map(_._3).toSet
      assert(newCells.subsetOf(Set(old * 2, old * 2 + 1)),
        s"cell $old produced foreign ids $newCells")
      if (newCells.size == 2) {
        // a split cell: both seeds exist and land in DIFFERENT
        // subcells (lo seeds old*2 by the tie rule; hi goes to +1
        // unless parallel to lo)
        val ids = rows.map(_._1)
        val lo = ids.min; val hi = ids.max
        val loCell = rows.find(_._1 == lo).get._3
        assert(loCell === old * 2, s"min-id seed must anchor old*2")
      }
    }
    // the mean-threshold rule: a cell splits only if oversized
    val sizes = split.groupBy(_._2).map { case (k, v) => k -> v.length }
    val mean = split.length / 8
    byOld.foreach { case (old, rows) =>
      if (rows.map(_._3).toSet.size == 2)
        assert(sizes(old) > 2 * mean,
          s"cell $old split at size ${sizes(old)} ≤ 2×mean $mean")
    }
    graft.Engine.dropAllMaterialized(spark)
  }

  test("ivfCellMerge: membership conserves, only underfull cells move, targets retained") {
    val asg = Vectors.kmeansAssign(base, 8, 3, nprobe = 1)
      .filter($"rn" === 1).select($"id", $"cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nt = asg.size.toLong
    val sizes = asg.values.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    def lawCheck(factor: Long): Unit = {
      val merged = Vectors.ivfCellMerge(base, kCells = 8, iters = 3,
          factor = factor)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every vector appears exactly once, with its shared-frame cell
      assert(merged.length.toLong === nt, s"factor=$factor lost vectors")
      merged.foreach { case (id, old, _) => assert(asg(id) === old) }
      val under: Set[Long] = sizes.collect {
        case (c, n) if n * factor < nt / 8 => c }.toSet
      val retained = sizes.keySet.diff(under)
      merged.groupBy(_._2).foreach { case (old, rows) =>
        val newCells = rows.map(_._3).toSet
        assert(newCells.size === 1,
          s"factor=$factor: cell $old scattered to $newCells")
        val nc = newCells.head
        if (nc != old) {
          assert(under.contains(old),
            s"factor=$factor: retained cell $old moved to $nc")
          assert(retained.contains(nc),
            s"factor=$factor: cell $old merged into non-retained $nc")
        } else {
          assert(!under.contains(old) || retained.isEmpty,
            s"factor=$factor: underfull cell $old failed to merge")
        }
      }
      // production factor on balanced synthetic cells: merge ≡ identity
      if (under.isEmpty)
        assert(merged.forall(r => r._2 == r._3),
          s"factor=$factor: no underfull cells but vectors moved")
    }
    lawCheck(4L) // production posture (identity on this balanced base)
    lawCheck(1L) // below-mean dissolves — the registered-query setting
    graft.Engine.dropAllMaterialized(spark)
  }

  test("ivfPqEncodeIncremental: backfill ≡ batch codes, none-new ≡ empty, split invariant") {
    def codeSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"cluster", $"sub", $"cw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val batch = codeSet(Vectors.ivfPqCodes(base))
    val backfill = codeSet(Vectors.ivfPqEncodeIncremental(base, base))
    assert(backfill === batch,
      "encoding the corpus against its own frozen codebooks must " +
        "reproduce the batch codes")
    assert(Vectors.ivfPqEncodeIncremental(base,
      base.filter(lit(false))).isEmpty)
    val b1 = codeSet(Vectors.ivfPqEncodeIncremental(base,
      base.filter($"id" % 2 === 0)))
    val b2 = codeSet(Vectors.ivfPqEncodeIncremental(base,
      base.filter($"id" % 2 === 1)))
    assert((b1 union b2) === batch,
      "split batches must union to the full backfill codes")
  }

  test("ivfPqSearch output is shortlist-bounded, cell-consistent, rerank-exact") {
    val got = Vectors.ivfPqSearch(base, queryFilter = $"id" < 10,
      k = 5, shortlist = 8, nprobe = 2).collect()
    assert(got.nonEmpty)
    // rank ≤ k per query, strictly ordered
    val perQ = got.groupBy(_.getLong(0))
    perQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq === (1 to rows.length), s"ranks broken for $q")
    }
    // every returned candidate's cluster is its own rn=1 cell
    val own = Vectors.kmeansAssign(base, 8, 3, nprobe = 2)
      .filter($"rn" === 1).select($"id", $"cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.forall(r => own(r.getLong(2)) === r.getLong(3)),
      "candidate cluster must be its own coarse cell")
    // the rerank cosine is the exact quantized cosine (spot-check via
    // knnBrute scores on the same pairs)
    val brute = Vectors.knnBrute(base.filter($"id" < 10), base, k = 499)
      .select($"query_id", $"cand_id", $"cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.forall(r =>
      brute((r.getLong(0), r.getLong(2))) === r.getDouble(5)),
      "rerank cosine must equal the exact brute-force cosine")
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

  test("knnGraphIncremental: ≡ full rebuild, none-new ≡ graph, backfill from empty ≡ batch") {
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select($"src", $"rank", $"dst").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oldBase = base.filter($"id" < 400)
    val newBatch = base.filter($"id" >= 400)
    val oldGraph = Vectors.knnGraph(oldBase, k = 5)
    // the top-k merge law: incremental ≡ the full rebuild, row-for-row
    assert(edges(Vectors.knnGraphIncremental(oldBase, newBatch,
        oldGraph, k = 5)) === edges(Vectors.knnGraph(base, k = 5)),
      "incremental refresh must equal the batch rebuild")
    // none-new law: an empty batch leaves the graph unchanged
    assert(edges(Vectors.knnGraphIncremental(oldBase,
        newBatch.filter(lit(false)), oldGraph, k = 5)) ===
      edges(oldGraph), "empty batch must be a no-op")
    // backfill law: everything-new from an empty base is the batch path
    assert(edges(Vectors.knnGraphIncremental(base.filter(lit(false)),
        base, oldGraph.filter(lit(false)), k = 5)) ===
      edges(Vectors.knnGraph(base, k = 5)),
      "all-new backfill must equal the batch build")
  }

  /** A flood bucket: identical vectors share every (band, bv) bucket,
    * so occupancy = corpus size by construction — the adversarial
    * near-duplicate-rich workload the bucketCap exists for. */
  private def flood(ids: Long*) =
    Vectors.quantize(ids.map(i => (i, Seq.fill(64)(1.0)))
      .toDF("id", "embedding"))

  test("knnGraph bucketCap: over-full bucket truncates to its cap smallest ids") {
    val g = Vectors.knnGraph(flood(0L to 9L: _*), k = 5, bucketCap = 4)
    val rows = g.select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // kept members = 4 smallest ids; everyone else is truncated OUT
    // of every bucket and emits no rows on either side
    assert(rows.map(_._1).toSet === Set(0L, 1L, 2L, 3L),
      "only kept members get neighbor lists")
    assert(rows.forall(_._2 <= 3L), "no candidate may come from a truncated id")
    // each kept member sees exactly the other kept members
    assert(rows.groupBy(_._1).forall(_._2.length === 3))
  }

  test("knnGraphIncremental bucketCap: law survives a bucket crossing the cap") {
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select($"src", $"rank", $"dst").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // old bucket occupancy 6 (UNDER cap 8); the batch floods it to 16
    // (OVER the cap): whole-bucket drop would keep the old edges in
    // the incremental while the rebuild loses them — smallest-id
    // truncation keeps the old kept-subset invariant instead, so the
    // merge law holds row-for-row THROUGH the cap boundary
    val oldBase = flood(0L to 5L: _*)
    val newBatch = flood(10L to 19L: _*)
    val all = flood((0L to 5L) ++ (10L to 19L): _*)
    val oldGraph = Vectors.knnGraph(oldBase, k = 5, bucketCap = 8)
    val inc = edges(Vectors.knnGraphIncremental(oldBase, newBatch,
      oldGraph, k = 5, bucketCap = 8))
    assert(inc === edges(Vectors.knnGraph(all, k = 5, bucketCap = 8)),
      "capped incremental must equal the capped rebuild")
    // and the cap really bit: ids beyond the 8 smallest appear nowhere
    assert(inc.forall { case (s, _, d) => s <= 11L && d <= 11L })
  }

  test("knnGraphIncremental bucketCap: interleaved ids raise (append-only guard)") {
    val oldBase = base.filter($"id" % 2 === 0)
    val newBatch = base.filter($"id" % 2 === 1) // ids interleave: law would drift
    val e = intercept[Exception] {
      Vectors.knnGraphIncremental(oldBase, newBatch,
        Vectors.knnGraph(oldBase, k = 5), k = 5).collect()
    }
    assert(e.getMessage.contains("append-only") ||
      e.getCause != null && e.getCause.getMessage.contains("append-only"))
  }

  test("lshSearchMultiprobe: candidates are a strict superset of lshSearch at the same banding") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // compare CANDIDATE coverage, not top-k lists: rerank can swap
    // ranks once extra candidates arrive, so probe with a k larger
    // than any candidate count (every surfaced candidate ranks)
    val single = pairs(Vectors.lshSearch(base, $"id" < 10, k = 1000))
    val multi = pairs(Vectors.lshSearchMultiprobe(base, $"id" < 10,
      k = 1000))
    assert(single.subsetOf(multi),
      "flip probes must never lose the exact-bucket candidates")
    assert(multi.size > single.size,
      "1-bit flips must surface additional candidates on this corpus")
  }

  test("filteredSearch bucketCap: truncation keys on the effective (band, bv, label) bucket") {
    // ten identical vectors, labels split 6 "a" / 4 "b"; cap 3 per
    // effective bucket: label-a queries see only the 3 smallest a-ids
    val ten = Vectors.quantize((0L to 9L)
      .map(i => (i, Seq.fill(64)(1.0), if (i < 6) "a" else "b"))
      .toDF("id", "embedding", "label"))
    val out = Vectors.filteredSearch(ten, queryFilter = $"id" === 0L,
        filterCol = "label", k = 5, bucketCap = 3)
      .select($"cand_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L), "query 0 sees the kept a-members only " +
      s"(got $out)")
  }
}
