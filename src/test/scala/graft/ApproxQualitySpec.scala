package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quality bounds for the approximate operators: the 100 TB swap-ins
  * must stay close to their exact twins, and the LSH index must
  * actually recall true neighbors. */
class ApproxQualitySpec extends SparkSuite {
  import spark.implicits._

  test("approx sketches stay within tolerance of exact aggregates") {
    val e = Sources.table(spark, sf("sf0.01"), "events")
      .withColumn("cents", round($"value" * 100).cast(LongType))
    val rows = e.groupBy($"event_type").agg(
      countDistinct($"user_id").as("exact_users"),
      approx_count_distinct($"user_id").as("approx_users"),
      percentile($"cents", lit(0.5)).as("exact_p50"),
      percentile_approx($"cents", lit(0.5), lit(10000)).as("approx_p50"))
      .collect()
    rows.foreach { r =>
      val (eu, au) = (r.getLong(1), r.getLong(2))
      assert(math.abs(au - eu) <= math.max(1L, (eu * 0.05).toLong),
        s"HLL off by >5%: exact=$eu approx=$au")
      val (ep, ap) = (r.getDouble(3), r.getLong(4).toDouble)
      assert(math.abs(ap - ep) <= math.max(1.0, ep * 0.05),
        s"approx p50 off by >5%: exact=$ep approx=$ap")
    }
  }

  test("matryoshka prefix recall: full prefix is exact, shorter prefixes bounded") {
    val rows = SparkEntry.queries("vector_matryoshka")(spark, sf())
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(rows.keySet === Set(16, 32, 64))
    // the full-dimension row is the eval's self-check: top-5 vs
    // itself, recall exactly 1e6 by construction
    assert(rows(64) === 1000000L, s"full-dim recall must be exact: $rows")
    // truncated prefixes are a valid recall in [0, 1e6]
    assert(rows(16) >= 0L && rows(16) <= 1000000L)
    assert(rows(32) >= 0L && rows(32) <= 1000000L)
  }

  test("ann_recall_curve: scan cost and recall both rise monotonically " +
       "with nprobe, and the ratios are exact") {
    val rows = SparkEntry.queries("ann_recall_curve")(spark, sf("sf0.01"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L))
    // candidate sets nest by q_rn, so scanned pairs are monotone; and
    // a displacing candidate scoring above a global-top-5 member is
    // itself global-top-5, so overlap (hence recall) is monotone too
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted,
      s"n_scanned must rise with nprobe: $rows")
    assert(rows.map(_._4).toSeq === rows.map(_._4).toSeq.sorted,
      s"n_overlap must rise with nprobe: $rows")
    rows.foreach { case (np, _, nb, ov, ppm) =>
      assert(nb === 50L, s"10 queries x k=5 brute rows, got $nb")
      assert(ppm === ov * 1000000L / nb, s"recall_ppm drift at np=$np")
      assert(ov >= 0L && ov <= nb)
    }
  }

  test("multi-probe IVF recalls at least as much as single-probe") {
    def hits(q: String) = SparkEntry.queries(q)(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .filter($"rank" <= 3).select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = hits("ivf_search")
    val multi = hits("ivf_multiprobe")
    val rSingle = (brute intersect single).size.toDouble / brute.size
    val rMulti = (brute intersect multi).size.toDouble / brute.size
    info(f"IVF recall@3: nprobe=1 $rSingle%.2f, nprobe=2 $rMulti%.2f")
    assert(rMulti >= rSingle,
      f"multi-probe lost recall: $rMulti%.2f < $rSingle%.2f")
  }

  test("k-means IVF recalls a usable share of true top-3 neighbors") {
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .filter($"rank" <= 3).select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val km = SparkEntry.queries("ivf_kmeans")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect km).size.toDouble / brute.size
    info(f"k-means IVF recall@3 = $recall%.2f")
    // single-probe over an 8-cell codebook: random assignment would
    // land ≈ 1/8 of neighbors in the query's cell; require clearly
    // better (the label-trained IVF single-probe measures ~0.23).
    assert(recall >= 0.2, f"k-means IVF recall collapsed: $recall%.2f")
    val mp = SparkEntry.queries("ivf_kmeans_mp")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rMp = (brute intersect mp).size.toDouble / brute.size
    info(f"k-means IVF recall@3 nprobe=2 = $rMp%.2f")
    assert(rMp >= recall,
      f"multi-probe lost recall: $rMp%.2f < $recall%.2f")
  }

  test("int8 two-stage search recalls most true top-5 neighbors") {
    // quantization error can demote a true neighbor past the
    // shortlist cut; with a 4× shortlist (20 for k=5) the coarse
    // int8 ordering should preserve nearly all of the exact top-5
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = SparkEntry.queries("vector_sq8")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect sq8).size.toDouble / brute.size
    info(f"sq8 two-stage recall@5 = $recall%.2f")
    assert(recall >= 0.8, f"int8 rerank recall collapsed: $recall%.2f")
  }

  test("binary-quantized search recalls a usable share and widens with shortlist") {
    // 1 bit/dim keeps only angular structure (E[hamming]/dim = θ/π);
    // with a 4× shortlist the Hamming coarse stage should still
    // surface a solid share of the exact top-5, and widening the
    // shortlist can only help (monotone property).
    val base = operators.Vectors.quantize(
      Sources.table(spark, sf("sf0.01"), "embeddings"))
      .withColumn("id", $"vec_id")
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(shortlist: Int): Double = {
      val bq = operators.Vectors.bqSearch(base, queryFilter = $"id" < 10,
          k = 5, shortlist = shortlist)
        .select($"query_id", $"cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect bq).size.toDouble / brute.size
    }
    val r20 = recall(20)
    val r80 = recall(80)
    info(f"BQ recall@5: shortlist=20 $r20%.2f, 80 $r80%.2f")
    assert(r20 >= 0.4, f"BQ recall collapsed: $r20%.2f")
    assert(r80 >= r20, f"wider shortlist lost recall: $r80%.2f < $r20%.2f")
  }

  test("PQ ADC search recalls a usable share and improves with shortlist") {
    val base = operators.Vectors.quantize(
      Sources.table(spark, sf("sf0.01"), "embeddings"))
      .withColumn("id", $"vec_id")
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(shortlist: Int): Double = {
      val pq = operators.Vectors.pqSearch(base, queryFilter = $"id" < 10,
          k = 5, m = 4, kCode = 8, iters = 2, shortlist = shortlist)
        .select($"query_id", $"cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect pq).size.toDouble / brute.size
    }
    val r64 = recall(64)
    val r128 = recall(128)
    info(f"PQ recall@5: shortlist=64 $r64%.2f, 128 $r128%.2f")
    assert(r64 >= 0.5, f"PQ recall collapsed: $r64%.2f")
    assert(r128 >= r64, f"wider shortlist lost recall: $r128%.2f < $r64%.2f")
  }

  test("IVF-PQ residual codes beat whole-vector PQ at an equal tight shortlist") {
    val base = operators.Vectors.quantize(
      Sources.table(spark, sf("sf0.01"), "embeddings"))
      .withColumn("id", $"vec_id")
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // equal bits, equal shortlist: the only difference is WHAT the m×8
    // codebooks quantize — whole vectors vs per-cell residuals
    val pq = hits(operators.Vectors.pqSearch(base, queryFilter = $"id" < 10,
      k = 5, m = 4, kCode = 8, iters = 2, shortlist = 8))
    val ivfpq = hits(operators.Vectors.ivfPqSearch(base,
      queryFilter = $"id" < 10, k = 5, m = 4, kCode = 8, pqIters = 2,
      shortlist = 8, nprobe = 2))
    val rPq = (brute intersect pq).size.toDouble / brute.size
    val rIvfPq = (brute intersect ivfpq).size.toDouble / brute.size
    info(f"recall@5 at shortlist=8: PQ $rPq%.2f, IVF-PQ $rIvfPq%.2f")
    assert(rIvfPq >= rPq,
      f"residual quantization lost recall: $rIvfPq%.2f < $rPq%.2f")
    assert(rIvfPq >= 0.3, f"IVF-PQ recall collapsed: $rIvfPq%.2f")
  }

  test("IVF-PQ codes reconstruct better than the coarse centroid alone") {
    import operators.Vectors
    val base = Vectors.quantize(
      Sources.table(spark, sf("sf0.01"), "embeddings"))
      .withColumn("id", $"vec_id")
    val rep = Vectors.ivfPqReconError(base).collect()
    assert(rep.map(_.getLong(1)).sum === base.count(),
      "every vector must be accounted to exactly one cell")
    val pqErr = rep.map(r => r.getLong(1) * r.getLong(2)).sum.toDouble /
      rep.map(_.getLong(1)).sum
    // coarse-only reconstruction = the cell centroid: its error is the
    // residual norm itself — the PQ codes must recover part of it
    val cent = Vectors.kmeansFit(base, 8, 3)
      .select($"cluster_id".as("cluster"), $"cvec")
    val coarse = Vectors.kmeansAssign(base, 8, 3, nprobe = 1)
      .filter($"rn" === 1)
      .join(broadcast(cent), Seq("cluster"))
      .withColumn("rn2", expr(
        "aggregate(zip_with(sv, cvec, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, x) -> acc + x)"))
      .withColumn("err_ppm", expr("rn2 * 1000000L div greatest(nrm, 1L)"))
      .agg(expr("sum(err_ppm) div count(1)")).head.getLong(0)
    info(f"recon err ppm: coarse-only $coarse%d, IVF-PQ ${pqErr}%.0f")
    assert(pqErr < coarse,
      f"PQ codes must beat the bare centroid: $pqErr%.0f >= $coarse%d")
  }

  test("bucketed semantic dedup recalls most all-pairs cosine edges") {
    // dedup_embedding is the exact all-pairs ≥0.4 pair set; the
    // bucketed operator must be a SUBSET (it never invents an edge —
    // every candidate is exact-verified) and clusters must cover a
    // usable share of the vectors the baseline pairs touch.
    val exact = SparkEntry.queries("dedup_embedding")(spark, sf("sf0.01"))
      .select($"id_a", $"id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clustered = SparkEntry.queries("dedup_semantic")(spark, sf("sf0.01"))
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(clustered.subsetOf(exact),
      "semantic clusters contain a vector with no exact ≥τ neighbor")
    val recall = (exact intersect clustered).size.toDouble / exact.size
    info(f"semantic-dedup vector recall = $recall%.2f " +
      f"(${clustered.size}/${exact.size})")
    assert(recall >= 0.2, f"semantic dedup recall collapsed: $recall%.2f")
  }

  test("wider LSH bands keep semantic-dedup recall while shrinking buckets") {
    // the 100 TB scaling knob (Vectors.semanticDedup scaladoc): the
    // 4-bit default gives 16 buckets per band — bucket size n/16
    // saturates at modest n. 48 planes / 6 bands = 8 bits ≈ 256
    // buckets per band; candidate work per bucket must drop sharply
    // while the verified-edge recall stays usable.
    import graft.operators.Vectors
    val base = Vectors.quantize(
        Sources.table(spark, sf("sf0.01"), "embeddings"))
      .withColumn("id", $"vec_id")
    val exact = SparkEntry.queries("dedup_embedding")(spark, sf("sf0.01"))
      .select($"id_a", $"id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    def run(nPlanes: Int, bands: Int): (Double, Long, Long) = {
      val ids = Vectors.semanticDedup(base, tau = 0.4,
          nPlanes = nPlanes, bands = bands)
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(ids.subsetOf(exact), "bucketed dedup invented an edge")
      val sizes = Vectors.bandedSig(base, 64, nPlanes, bands)
        .groupBy($"band", $"bv").count()
        .agg(max($"count"), sum(expr("`count` * (`count` - 1) DIV 2")))
        .collect()(0)
      ((exact intersect ids).size.toDouble / exact.size,
        sizes.getLong(0), sizes.getLong(1))
    }
    val (rNarrow, mxNarrow, pairsNarrow) = run(16, 4)
    val (rWide, mxWide, pairsWide) = run(48, 6)
    info(f"4-bit bands: recall $rNarrow%.2f, max bucket $mxNarrow, " +
      f"cand pairs $pairsNarrow; 8-bit bands: recall $rWide%.2f, " +
      f"max bucket $mxWide, cand pairs $pairsWide")
    // the scale contract: candidate WORK (sum of per-bucket pair
    // counts — what the verify join actually pays) drops sharply
    // (≥4x measured at this n; the gap widens with n since bucket
    // pair counts grow quadratically in bucket size), the hottest
    // bucket shrinks ≥3x, and recall degrades gracefully, not to
    // zero. Recall lost to narrower buckets is recovered by adding
    // BANDS at fixed bits (the scaladoc knob), not by re-widening
    // buckets.
    assert(pairsWide * 4 <= pairsNarrow,
      s"8-bit bands must cut candidate pairs ≥4x: $pairsNarrow -> $pairsWide")
    assert(mxWide * 3 <= mxNarrow,
      s"8-bit bands must shrink the max bucket ≥3x: $mxNarrow -> $mxWide")
    assert(rWide >= 0.15 && rWide * 4 >= rNarrow,
      f"wide-band recall collapsed: $rNarrow%.2f -> $rWide%.2f")
  }

  test("sign-LSH candidates recall a usable share of true top-5 neighbors") {
    val brute = SparkEntry.queries("knn_brute")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("knn_lsh")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f (${lsh.size} LSH pairs)")
    // 4 bands × 4 bits is a deliberately cheap index; it must still
    // beat random cell assignment by a wide margin (random ≈ 4/500).
    assert(recall >= 0.2, f"LSH recall collapsed: $recall%.2f")
  }

  test("MIPS ALSH recalls a usable share of true inner-product top-5") {
    val brute = SparkEntry.queries("knn_mips")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val alsh = SparkEntry.queries("knn_mips_alsh")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect alsh).size.toDouble / brute.size
    info(f"MIPS ALSH recall@5 = $recall%.2f (${alsh.size} ALSH pairs)")
    assert(recall >= 0.2, f"MIPS ALSH recall collapsed: $recall%.2f")
    // scores agree wherever both sides return the same pair: the
    // rerank is the EXACT integer dot, so any shared (query, cand)
    // must carry an identical score in both results
    val bs = SparkEntry.queries("knn_mips")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id", $"dot").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mism = SparkEntry.queries("knn_mips_alsh")(spark, sf("sf0.01"))
      .select($"query_id", $"cand_id", $"dot").collect()
      .filter(r => bs.get((r.getLong(0), r.getLong(1)))
        .exists(_ != r.getLong(2)))
    assert(mism.isEmpty, "ALSH rerank dot diverged from brute dot")
  }
}
