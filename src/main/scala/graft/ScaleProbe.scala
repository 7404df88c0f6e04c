package graft

import graft.operators.{Corpus, Vectors}
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling-curve probe for the pair-generating operators (the ones
  * whose naive forms are quadratic): run each at 1/4, 1/2, and full
  * corpus size (`doc_id % k` subsets of SPARK_GRAFT_SF_DIR — real data
  * distribution, not synthetic duplication, which would distort the
  * near-dup structure the operators key on) and report wall seconds
  * plus the fitted growth exponent `log4(t(1x) / t(0.25x))` —
  * 1.0 = linear in corpus size, 2.0 = quadratic (all-pairs).
  *
  * Caveats for reading the numbers: each timing carries a fixed
  * per-query overhead (session, materialize checkpoints) that biases
  * exponents DOWN at small fractions, and pair OUTPUT volume depends
  * on the dup structure of the subset, which biases UP ops on
  * near-dup-saturated corpora. It is a trend check ("is anything
  * secretly all-pairs?"), not a microbenchmark.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Sources.table(spark, sfDir, "documents")
    val emb = Vectors.quantize(Sources.table(spark, sfDir, "embeddings"))
      .withColumn("id", col("vec_id"))
    def docFrac(k: Int): DataFrame = docs.filter(col("doc_id") % k === 0)
    def embFrac(k: Int): DataFrame = emb.filter(col("vec_id") % k === 0)

    // fraction-independent BPE rules for the apply probe, fit once up
    // front and REBUILT from collected rows: the fit's result frame
    // reads its internal localCheckpoints, which the per-run
    // unpersistStale sweep would truncate mid-probe. 8 rows — the
    // collect is the merge table, not data.
    val bpeRules: DataFrame = {
      val fit = Corpus.bpeFit(docs, merges = 8)
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(fit.collect(): _*)),
        fit.schema)
    }

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "minhash_pairs" -> (k => Corpus.minhashPairs(docFrac(k))),
      "simhash_pairs" -> (k => Corpus.simhashPairs(docFrac(k))),
      "ngram_pairs" -> (k => Corpus.ngramPairs(docFrac(k))),
      "containment_pairs" -> (k => Corpus.containmentPairs(docFrac(k))),
      "exact_dup_edges" -> (k => Corpus.exactDupEdges(docFrac(k))),
      "semantic_dedup" -> (k => Vectors.semanticDedup(embFrac(k), tau = 0.4)),
      "span_dedup" -> (k => Corpus.spanDedup(docFrac(k))),
      "span_dedup_inc" -> (k =>
        Corpus.spanDedupIncremental(docFrac(k), isNew = col("doc_id") >= 400)),
      "bm25" -> (k => Corpus.bm25Rank(docFrac(k),
        Seq("hash", "join", "scan", "vector"), topK = 10)),
      "pq_search" -> (k => Vectors.pqSearch(embFrac(k),
        queryFilter = col("id") < 10 * k, k = 5)),
      "corpus_overlap" -> (k => Corpus.corpusOverlap(docFrac(k),
        side = col("doc_id") % 2)),
      "winnow_pairs" -> (k => Corpus.winnowPairs(docFrac(k))),
      "item_sim_pairs" -> { k =>
        // the registered query's pair stage: per-customer basket
        // self-join with the 256-degree flood guard, scaled by
        // customer count
        val li = Sources.table(spark, sfDir, "lineitem")
        val cs0 = li
          .join(Sources.table(spark, sfDir, "orders")
              .filter(col("o_custkey") % k === 0),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_suppkey").as("sk"))
          .distinct()
        val keep = cs0.groupBy(col("cust"))
          .agg(count(lit(1)).as("cdeg"))
          .filter(col("cdeg") <= 256).select(col("cust"))
        val cs = cs0.join(keep, Seq("cust"))
        cs.select(col("cust"), col("sk").as("a"))
          .join(cs.select(col("cust"), col("sk").as("b")), Seq("cust"))
          .filter(col("a") =!= col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("co_n"))
      },
      "attribution_join" -> { k =>
        // the registered query's purchase×touch stage, scaled by users
        val e = Sources.table(spark, sfDir, "events")
          .filter(col("user_id") % k === 0)
          .withColumn("es", unix_timestamp(col("ts")))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            col("es").as("p_es"))
        val touch = e.filter(col("event_type")
            .isin("click", "view", "signup"))
          .select(col("user_id"), col("event_type").as("channel"),
            col("es").as("t_es"))
        purch.join(touch, Seq("user_id"))
          .filter(col("t_es") <= col("p_es") &&
            col("t_es") > col("p_es") - 86400L)
          .groupBy(col("channel")).agg(count(lit(1)).as("n"))
      },
      "bpe_fit" -> (k => Corpus.bpeFit(docFrac(k), merges = 8)),
      "bpe_apply" -> { k =>
        // rules are fraction-independent (fit once, outside the ops
        // loop, detached from checkpoint blocks — see `bpeRules`), so
        // this isolates the APPLY half: distinct-word segmentation +
        // the per-doc count join
        Corpus.bpeApply(docFrac(k), bpeRules, nMerges = 8)
      },
      "shard_assign" -> (k => Corpus.shardAssign(docFrac(k), nShards = 8)),
      "pack_sequences" -> (k => Corpus.packSequences(docFrac(k),
        seqTokens = 512L)),
      "scd2" -> { k =>
        graft.operators.Events.scd2(
          Sources.table(spark, sfDir, "events")
            .filter(col("user_id") % k === 0),
          key = "user_id", tsSec = unix_timestamp(col("ts")),
          attr = "event_type", tiebreak = "event_id")
      },
      "funnel" -> { k =>
        // the registered query's iterated conditional-min chain,
        // scaled by users (all stages shuffle on user_id only —
        // pinned by PlanAuditSpec)
        val e = Sources.table(spark, sfDir, "events")
          .filter(col("user_id") % k === 0)
          .select(col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("es"))
        val fv = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("es")).as("t_view"))
        val fc = e.filter(col("event_type") === "click")
          .join(fv, Seq("user_id")).filter(col("es") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("es")).as("t_click"))
        val fp = e.filter(col("event_type") === "purchase")
          .join(fc, Seq("user_id")).filter(col("es") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("es")).as("t_purchase"))
        fv.join(fc, Seq("user_id"), "left").join(fp, Seq("user_id"), "left")
      },
      "triangles" -> { k =>
        // the registered query's shape scaled by orders: co-supply
        // pairs (w ≥ 5) then degree-oriented wedge counting
        val ls = Sources.table(spark, sfDir, "lineitem")
          .filter(col("l_orderkey") % k === 0)
          .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
          .distinct()
        val pairs = ls.select(col("o"), col("sk").as("a"))
          .join(ls.select(col("o"), col("sk").as("b")), Seq("o"))
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 5)
          .select(col("a"), col("b"))
        graft.operators.Graphs.triangles(pairs)
      },
      "kcore" -> { k =>
        // the registered query's shape scaled by orders: co-supply
        // pairs (w ≥ 5) fed undirected into the 4-round k=3 peel
        val ls = Sources.table(spark, sfDir, "lineitem")
          .filter(col("l_orderkey") % k === 0)
          .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
          .distinct()
        val pairs = ls.select(col("o"), col("sk").as("a"))
          .join(ls.select(col("o"), col("sk").as("b")), Seq("o"))
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 5)
        val und = pairs.select(col("a").as("src"), col("b").as("dst"))
          .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        graft.operators.Graphs.kCore(und, k = 3, rounds = 4)
      },
      "pagerank" -> { k =>
        // doc co-membership graph stand-in: link doc i ↔ i%97 hub —
        // size-linear edge count, same per-round join shape as the
        // registered trade-graph query
        val e0 = docFrac(k).select(col("doc_id").as("src"),
          (col("doc_id") % 97).as("dst")).filter(col("src") =!= col("dst"))
        graft.operators.Graphs.pageRank(
          e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))),
          rounds = 3)
      },
      "bfs" -> { k =>
        // same stand-in graph, seeded at hub 0: per-round min-plus
        // join is edges-linear like the pagerank round
        val e0 = docFrac(k).select(col("doc_id").as("src"),
          (col("doc_id") % 97).as("dst")).filter(col("src") =!= col("dst"))
        graft.operators.Graphs.bfs(
          e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))),
          spark.range(1).select(lit(0L).as("node")), rounds = 3)
      },
      "bloom_probe" -> { k =>
        // gram-linear: ×3 position explode over distinct grams, bit
        // frames bounded by mBits
        val h = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), " +
          "1, 2), 16, 10) AS BIGINT) % 10")
        Corpus.bloomMembership(docFrac(k), isEval = h >= 8)
      })

    // warmup: absorb session/codegen/footer costs outside the timings
    docs.count(); emb.count()

    // SPARK_GRAFT_PROBES=a,b — iterate-locally subset filter (the
    // Bench SPARK_GRAFT_QUERIES convention); unset = all probes
    val only = sys.env.get("SPARK_GRAFT_PROBES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    ops.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, build) =>
      // per-op prewarm at the smallest fraction: codegen/JIT for this
      // op's operators would otherwise land entirely on the first
      // timed point and push the fitted exponent negative
      build(4).queryExecution.toRdd.count()
      val times = Seq(4, 2, 1).map { k =>
        // drop shared frames + dead checkpoint blocks so a prewarm or
        // smaller fraction can't serve a timed run from cache
        Engine.clearShared()
        Engine.unpersistStale(spark)
        val t0 = System.nanoTime()
        val rows = build(k).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        (k, sec, rows)
      }
      val t25 = times.head._2
      val t100 = times.last._2
      val exponent = math.log(t100 / t25) / math.log(4.0)
      val pts = times.map { case (k, s, r) =>
        s""""x${4 / k}":{"sec":${"%.2f".format(s)},"rows":$r}"""
      }.mkString(",")
      println(s"""{"op":"$name",$pts,"exponent":${"%.2f".format(exponent)}}""")
    }
    spark.stop()
  }
}
