package graft

import graft.models.{MtaModels, MtaSynthetic}
import graft.sources.Sources
import org.apache.spark.sql.DataFrame

/** Models must degrade cleanly on empty inputs (a fresh deployment or
  * an empty feed window): empty outputs, correct schemas, no errors. */
class EmptyInputSpec extends SparkSuite {
  import spark.implicits._

  private def empty(df: DataFrame): DataFrame = df.limit(0)

  test("round-8 public APIs degrade cleanly on empty inputs") {
    import org.apache.spark.sql.functions._
    val noRows = Seq((1L, 2L, 3L)).toDF("id", "cents", "size").limit(0)
    // skyline: empty in → empty out (the extent guard's null branch
    // passes through; no raise, no NPE)
    val sky = graft.operators.ExtendedQueries.skyline(noRows, "cents", "size")
    assert(sky.count() === 0 && sky.columns.sameElements(noRows.columns))
    // hilbert keying: empty in → empty keyed frame with the key column
    val hk = graft.operators.Layout.withHilbertKey(
      noRows, col("cents"), col("size"), bits = 8)
    assert(hk.count() === 0 && hk.columns.contains("_hkey"))
    // sssp: empty edges → empty distances
    val noEdges = Seq((1L, 2L, 3L)).toDF("src", "dst", "w").limit(0)
    val d = graft.operators.Graphs.sssp(noEdges,
      spark.range(1).select(lit(0L).as("node")), rounds = 2)
    assert(d.count() === 0)
    // shardWrite: empty corpus → zero shards, empty manifest, no throw
    val noDocs = Seq((1L, "a b c")).toDF("doc_id", "text").limit(0)
    val dir = java.nio.file.Files.createTempDirectory("shard_empty").toString
    val mf = graft.operators.Corpus.shardWrite(noDocs, nShards = 2, dir)
    assert(mf.count() === 0)
    // minhash estimator: no docs → no candidate pairs
    assert(graft.operators.Corpus.minhashEstimate(noDocs).count() === 0)
  }

  test("round-9 public APIs degrade cleanly on empty inputs") {
    import org.apache.spark.sql.functions._
    val base = graft.operators.Vectors
      .quantize(Sources.table(spark, sf(), "embeddings"))
      .withColumn("id", $"vec_id")
    // frozen-codebook incremental: empty batch → empty assignment,
    // all-zero drift (already spec'd in VectorsApiSpec; pinned here
    // beside the family's other empty laws)
    assert(graft.operators.Vectors
      .kmeansAssignIncremental(base, empty(base)).isEmpty)
    // ivf-pq: empty QUERY side → no results, no throw (the coarse and
    // PQ fits still run over the corpus)
    assert(graft.operators.Vectors
      .ivfPqSearch(base, queryFilter = lit(false)).count() === 0)
    // minhash band index: empty corpus → empty index; the streaming
    // probe against it emits nothing
    val noDocs = Sources.table(spark, sf(), "documents").limit(0)
    val idx = graft.operators.Corpus.minhashBandIndex(noDocs)
    assert(idx.count() === 0)
    val probe = graft.streaming.StreamingModels.contaminationStream(
      Sources.table(spark, sf(), "documents")
        .withColumn("ts", lit("2024-01-05").cast("timestamp")), idx)
    assert(probe.count() === 0)
    // snapshot: an EMPTY first source still creates a valid (empty)
    // history table, and a later run over it opens version-1 records
    val root = java.nio.file.Files.createTempDirectory("snap_e").toString
    val src0 = Seq(("A", "x", 1L)).toDF("k", "v", "u").limit(0)
    assert(graft.Engine.snapshot(spark, src0, "snap_e", "k", "u",
      Seq("v"), root).count() === 0)
    val h = graft.Engine.snapshot(spark,
      Seq(("A", "x", 1L)).toDF("k", "v", "u"), "snap_e", "k", "u",
      Seq("v"), root).collect()
    assert(h.length === 1 && h.head.getLong(4) === 1L)
  }

  test("round-10 public APIs degrade cleanly on empty inputs") {
    import org.apache.spark.sql.functions._
    val docs = Sources.table(spark, sf(), "documents")
    // retrieval eval: empty corpus → empty ranking → empty curve (the
    // n_rel=0 floor-div never evaluates because no ranked row exists)
    assert(graft.operators.Corpus.searchEval(empty(docs),
      Seq("hash", "vector")).isEmpty)
    // rankEval with an empty RELEVANT set: the curve still emits one
    // row per ranked doc, and the n_rel=0 / idcg=0 divisions yield
    // NULL (the integer-form try_divide/NULLIF twin), never an ANSI
    // DIVIDE_BY_ZERO throw
    val noRel = graft.operators.Corpus.rankEval(
      Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank"),
      Seq.empty[Long].toDF("doc_id")).orderBy($"k").collect()
    assert(noRel.length === 2 &&
      noRel.forall(r => r.isNullAt(r.fieldIndex("recall_ppm")) &&
        r.isNullAt(r.fieldIndex("ndcg_ppm")) &&
        r.getLong(r.fieldIndex("hits")) === 0L))
    assert(graft.operators.Corpus.rankEval(
      Seq.empty[(Long, Int)].toDF("doc_id", "rank"),
      Seq(1L).toDF("doc_id")).isEmpty)
    // curriculum: empty corpus → empty layout, no null-threshold throw
    assert(graft.operators.Corpus.curriculumOrder(empty(docs),
      size(split($"text", " ")).cast("long")).isEmpty)
    // single-doc corpus: one phase-1 row, ord 1
    val one = graft.operators.Corpus.curriculumOrder(docs.limit(1),
      size(split($"text", " ")).cast("long")).collect()
    assert(one.length === 1 && one.head.getLong(2) === 1L &&
      one.head.getLong(4) === 1L)
  }

  test("round-14 web/container/packing APIs degrade cleanly on empty input") {
    import org.apache.spark.sql.functions._
    val docs = Sources.table(spark, sf(), "documents")
    val e = empty(docs)
    // URL pipeline: empty in → empty out, schema intact (the regex
    // parser and the small-array HOFs must not choke on zero rows)
    val canonE = graft.operators.WebQueries.canonicalized(
      graft.operators.WebQueries.withRawUrl(e))
    assert(canonE.isEmpty &&
      canonE.columns.contains("url_canon") &&
      canonE.columns.contains("domain"))
    // HTML wrap + zip round trip: per-row synthesizers over zero rows
    assert(graft.operators.WebQueries.htmlWrapped(e).isEmpty)
    assert(graft.operators.MultimodalQueries.zipRoundtrip(e).isEmpty)
    // single-doc forms stay well-formed (the 1-row edge where every
    // window/groupBy has exactly one member)
    val one = graft.operators.MultimodalQueries
      .zipRoundtrip(docs.limit(1)).collect()
    assert(one.length === 1 &&
      one.head.getBoolean(one.head.fieldIndex("crc_ok")))
  }

  test("fact views on empty realtime inputs are empty but well-formed") {
    val e = MtaSynthetic.ev(spark, sf())
    val stops = MtaSynthetic.stops(spark)
    val fts = MtaModels.factTripsStops(
      empty(MtaSynthetic.tripUpdates(e)),
      empty(MtaSynthetic.stopTimeUpdates(e)),
      stops, MtaSynthetic.trips(e))
    assert(fts.count() === 0)
    assert(fts.columns.contains("trip_uid"))
    assert(MtaModels.factTrips(fts, stops).count() === 0)
    assert(MtaModels.factDelays(fts).count() === 0)
  }

  test("metrics over empty facts return empty (or zero-row aggregates)") {
    val e = MtaSynthetic.ev(spark, sf())
    val stops = MtaSynthetic.stops(spark)
    val fts = MtaModels.factTripsStops(
      empty(MtaSynthetic.tripUpdates(e)),
      empty(MtaSynthetic.stopTimeUpdates(e)),
      stops, MtaSynthetic.trips(e))
    assert(graft.models.MtaMetrics.tripsPerMinute(fts,
      "2024-01-01 00:00:00", "2024-02-01 00:00:00").count() === 0)
    assert(graft.models.MtaMetrics.dwellTimes(fts).count() === 0)
    // global aggregate yields one row of zero counts
    val c = graft.models.MtaMetrics.tripCompleteness(fts).collect().head
    assert(c.getLong(0) === 0L)
  }

  test("dedup and similarity operators handle empty tables") {
    val emptyDocs = Sources.table(spark, sf(), "documents").limit(0)
    emptyDocs.createOrReplaceTempView("documents_empty")
    // exact dedup over nothing → nothing
    import org.apache.spark.sql.functions._
    val canon = emptyDocs
      .groupBy(sha2($"text", 256)).agg(count(lit(1)).as("n"))
    assert(canon.count() === 0)
  }

  test("vector operators handle empty and tiny embedding tables") {
    import org.apache.spark.sql.functions._
    val base = graft.operators.Vectors.quantize(
      Sources.table(spark, sf(), "embeddings"))
      .withColumn("id", col("vec_id"))
    val none = base.limit(0)
    assert(graft.operators.Vectors.semanticDedup(none, tau = 0.4)
      .count() === 0)
    // k-means with fewer vectors than cells: codebook shrinks to n,
    // search still answers
    val tiny = base.filter(col("id") < 3)
    val cent = graft.operators.Vectors.kmeansFit(tiny, k = 8, iters = 2)
    assert(cent.count() === 3)
    val hits = graft.operators.Vectors.ivfKmeansSearch(
      tiny, queryFilter = col("id") < 1, k = 2, kCells = 8, iters = 2)
    assert(hits.count() <= 2)
    // empty fit yields an empty codebook without erroring
    assert(graft.operators.Vectors.kmeansFit(none, k = 4, iters = 1)
      .count() === 0)
  }

  test("graph and overlap operators degrade cleanly on empty input") {
    import org.apache.spark.sql.functions._
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Graphs.triangles(noEdges).count() === 0)
    // pageRank on an empty graph is a caller error, reported as one
    intercept[IllegalArgumentException] {
      graft.operators.Graphs.pageRank(
        noEdges.select($"a".as("src"), $"b".as("dst")))
    }
    val noDocs = Sources.table(spark, sf(), "documents").limit(0)
    val row = graft.operators.Corpus.corpusOverlap(noDocs, lit(0))
      .collect().head
    assert(row.getAs[Long]("n_sh_a") === 0L &&
      row.getAs[Long]("n_inter") === 0L)
    assert(row.isNullAt(row.fieldIndex("jaccard_ppm")),
      "empty-set Jaccard must be NULL, not fabricated")
    assert(graft.operators.Corpus.winnowPairsIncremental(
      noDocs, lit(true)).count() === 0)
    graft.Engine.dropAllMaterialized(spark)
  }

  test("bfs, label propagation, mixture sampling, and dq degrade cleanly") {
    import org.apache.spark.sql.functions._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val noSeeds = Seq.empty[Tuple1[Long]].toDF("node")
    // no seeds: every node stays at the sentinel → empty result
    assert(graft.operators.Graphs.bfs(edges, noSeeds, rounds = 2)
      .count() === 0)
    graft.Engine.dropAllMaterialized(spark)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graphs.bfs(noEdges,
      Seq(Tuple1(1L)).toDF("node"), rounds = 1).count() === 0)
    graft.Engine.dropAllMaterialized(spark)
    assert(graft.operators.Graphs.labelPropagation(noEdges, rounds = 1)
      .count() === 0)
    graft.Engine.dropAllMaterialized(spark)
    // mixture: no declared weights → nothing sampled; empty corpus → empty
    val docs = Seq((1L, "en", 10L), (2L, "fr", 20L))
      .toDF("doc_id", "lang", "n_chars")
    assert(graft.operators.Corpus.mixtureSample(docs, col("lang"),
      col("n_chars"), Map.empty, budgetTokens = 100L).count() === 0)
    assert(graft.operators.Corpus.mixtureSample(docs.limit(0), col("lang"),
      col("n_chars"), Map("en" -> 1000000L), 100L).count() === 0)
    // dq checks over an empty frame: one zero-violation row each
    val none = docs.limit(0)
    val rep = graft.operators.Dq.expectations(Seq(
      graft.operators.Dq.unique("d", none, Seq("doc_id")),
      graft.operators.Dq.notNull("d", none, "lang"),
      graft.operators.Dq.acceptedValues("d", none, "lang", Seq("en")),
      graft.operators.Dq.relationship("d", none, "doc_id", none, "doc_id")))
      .collect()
    assert(rep.length === 4 && rep.forall(_.getAs[Boolean]("pass")),
      s"empty-input dq must pass all checks: ${rep.mkString(";")}")
  }

  test("k-core and z-order compaction degrade cleanly on empty input") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Graphs, Layout}
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.kCore(noEdges, k = 2, rounds = 2).count() === 0)
    graft.Engine.dropAllMaterialized(spark)
    // a graph below the threshold peels to nothing
    val path2 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(Graphs.kCore(path2, k = 2, rounds = 2).count() === 0)
    graft.Engine.dropAllMaterialized(spark)
    // empty delta: compaction is a no-op reporting every file untouched
    val out = java.nio.file.Files.createTempDirectory("zc_empty").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    Layout.zorderWrite(li, $"l_partkey", $"l_suppkey", 16, 4, out)
    val (rw, unt) = Layout.zorderCompact(spark, out, li.limit(0),
      $"l_partkey", $"l_suppkey")
    assert(rw === 0 && unt === 4, s"($rw, $unt)")
    assert(spark.read.parquet(out).count() === li.count())
  }

  test("round-11 public APIs degrade cleanly on empty inputs") {
    import org.apache.spark.sql.functions._
    val noDocs = Seq((1L, "a b c")).toDF("doc_id", "text").limit(0)
    // textrank: no docs → no sentences → no summary rows
    assert(graft.operators.Corpus.textrank(noDocs).count() === 0)
    // CDC chunking: no docs → no chunks
    assert(graft.operators.Corpus.cdcChunks(noDocs).count() === 0)
    // priority sampling: empty corpus has no (k+1)-th threshold →
    // empty sample (documented estimator-undefined case)
    assert(graft.operators.Corpus.prioritySample(noDocs, k = 8)
      .count() === 0)
    val base = graft.operators.Vectors
      .quantize(Sources.table(spark, sf(), "embeddings"))
      .withColumn("id", $"vec_id")
    // knn graph: empty corpus → empty graph; empty batch against a
    // real graph is already law-pinned in VectorsApiSpec
    assert(graft.operators.Vectors.knnGraph(empty(base)).count() === 0)
    // filtered ANN: empty QUERY side → no results, no throw
    assert(graft.operators.Vectors.filteredSearch(base,
      queryFilter = lit(false), filterCol = "label").count() === 0)
  }

  test("round-14 public APIs degrade cleanly on empty inputs") {
    import org.apache.spark.sql.functions._
    Engine.clearShared() // allPairs indexes are corpus-keyed shared frames
    val noDocs = Seq((1L, "a b c")).toDF("doc_id", "text").limit(0)
    // exact similarity join: empty corpus -> no pairs (full + inc)
    assert(graft.operators.Corpus.allPairsJoin(noDocs).count() === 0)
    assert(graft.operators.Corpus.allPairsJoin(noDocs,
      isNew = Some($"doc_id" >= 0L)).count() === 0)
    // additive df merge: both sides empty -> empty index
    val noSh = Seq((1L, 2L)).toDF("doc_id", "h").limit(0)
    val noDf = Seq((1L, 2L)).toDF("h", "df").limit(0)
    assert(graft.operators.Corpus.allPairsDfMerge(noDf, noSh).count() === 0)
    // bloom prefilter: EMPTY small side -> empty bitmap -> no row can
    // pass (zero keys means zero possible matches, and the filter
    // must say so rather than pass everything)
    val big = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    assert(Engine.bloomPrefilter(big, "k",
      big.limit(0).select($"k".as("sk")), "sk").count() === 0)
    Engine.clearShared()
  }
}
