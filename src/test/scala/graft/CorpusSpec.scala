package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** The public DataFrame-level corpus API must work on arbitrary
  * user-supplied documents, not just the registry tables. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "beta alpha gamma delta epsilon zeta eta theta"), // near-dup of 1
    (3L, "theta eta zeta epsilon delta gamma beta alpha"), // exact canon dup
    (4L, "one two three four five six seven eight nine ten"),
    (5L, "spam spam spam spam spam spam spam spam spam ok"))
    .toDF("doc_id", "text")

  test("minhashPairs finds the shuffled near-duplicates") {
    val pairs = Corpus.minhashPairs(docs)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1/2/3 share the same token set (jaccard 1.0 pairwise)
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 3L)),
      s"near-dups missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "doc 4 shares no tokens; must not pair")
  }

  test("normalizeText recovers a near-dup pair that raw minhash misses") {
    // doc 11 is doc 10 re-formatted the way scraped pages really
    // vary: fullwidth punctuation/letters, control bytes, newline +
    // run-of-space layout, case — every whitespace-delimited token
    // differs, so raw shingles share nothing
    val raw = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "Alpha BETA　gamma\n delta   epsilon\tZETA eta " +
        "theta ｉｏｔａ ｋａｐｐａ"),
      (12L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Corpus.minhashPairs(df).select($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs(raw).contains((10L, 11L)),
      "raw variants should defeat shingling (else the test is vacuous)")
    val norm = raw.withColumn("text", Corpus.normalizeText($"text"))
    assert(pairs(norm).contains((10L, 11L)),
      "normalized variants must pair as near-dups")
    // normalization is idempotent
    val twice = norm.withColumn("t2", Corpus.normalizeText($"text"))
      .filter($"t2" =!= $"text").count()
    assert(twice === 0L)
  }

  test("budgetSample takes the best-quality prefix under the token budget") {
    val corpus = Seq(
      (1L, "s1", "the a of and to the a of"),          // 8 toks, q=1e6
      (2L, "s1", "the a of and to junk junk junk"),    // 8 toks, q=625000
      (3L, "s1", "junk junk junk junk junk junk"),     // 6 toks, q=0
      (4L, "s2", "the the the the"),                   // 4 toks, q=1e6
      (5L, "s2", "junk junk"))                         // 2 toks, q=0
      .toDF("doc_id", "source", "text")
    val got = Corpus.budgetSample(corpus, $"source", budget = 16L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    // s1: docs 1 (cum 8) + 2 (cum 16) fit; doc 3 would cross. s2: all.
    assert(got.map(_._1).toSet === Set(1L, 2L, 4L, 5L))
    // budget respected per stratum
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).max <= 16L)
    }
    // prefix property: an unselected doc never outranks a selected one
    // (doc 3 has the stratum's worst quality)
    assert(!got.map(_._1).contains(3L))
  }

  test("normalizeText properties on random unicode soup: idempotent, canonical, bounded") {
    // raw ScalaCheck Gen with fixed seeds (offline cache has no
    // scalatestplus bridge) over strings mixing ASCII, fullwidth
    // forms, controls, and whitespace runs
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      5 -> Gen.choose('a', 'z'),
      2 -> Gen.choose('A', 'Z'),
      2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f'),
      1 -> Gen.choose(0.toChar, 31.toChar),
      1 -> Gen.choose(0xFF01.toChar, 0xFF5E.toChar),
      1 -> Gen.const(0x3000.toChar))
    val strGen = Gen.listOf(charGen).map(_.mkString).map(_.take(60))
    val samples = (1 to 60).flatMap(i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = samples.toDF("text")
      .withColumn("n1", Corpus.normalizeText($"text"))
      .withColumn("n2", Corpus.normalizeText(Corpus.normalizeText($"text")))
    val rows = df.collect()
    rows.foreach { r =>
      val (n1, n2) = (r.getString(1), r.getString(2))
      assert(n1 == n2, s"not idempotent on ${r.getString(0)}")
      // canonical: lowercase ASCII + single spaces, never edge spaces
      assert(n1.forall(c => c == ' ' || (c >= '!' && c <= '~' &&
        !(c >= 'A' && c <= 'Z'))), s"non-canonical char in '$n1'")
      assert(!n1.contains("  ") && n1 == n1.trim, s"ws not collapsed: '$n1'")
      // bounded: normalization never grows the string
      assert(n1.length <= r.getString(0).length)
    }
  }

  test("dedupComponents clusters the duplicate family to min doc_id") {
    val comps = Corpus.dedupComponents(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(2L) === 1L && comps(3L) === 1L,
      s"cluster not rooted at min id: $comps")
    assert(!comps.contains(4L), "singleton doc must not appear")
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val strat = docs.withColumn("lang",
      when($"doc_id" <= 3, "en").otherwise("xx"))
    val s1 = Corpus.stratifiedSample(strat, col("lang"),
      Map("en" -> 100L), default = 0L)
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 === Set(1L, 2L, 3L), s"rate 100/0 must keep exactly en: $s1")
    val s2 = Corpus.stratifiedSample(strat, col("lang"),
      Map("en" -> 100L), default = 0L)
      .select($"doc_id").as[Long].collect().toSet
    assert(s2 === s1, "sample must be reproducible")
  }

  test("winnowPairs surfaces a short shared passage Jaccard would dilute") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val tiny = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta eta theta iota"),
      (2L, s"one two three four five $shared six seven eight nine ten"),
      (3L, "nothing in common here zzz qqq www eee rrr ttt yyy uuu iii"))
      .toDF("doc_id", "text")
    val pairs = Corpus.winnowPairs(tiny, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a 44-char shared run guarantees many common window-min
    // fingerprints (any run ≥ w+k-1 = 8 chars leaves ≥1)
    assert(pairs === Set((1L, 2L)), s"expected only the quoting pair: $pairs")
    // the same pair is INVISIBLE to 3-gram set Jaccard at 0.5 — the
    // shared passage is small relative to both docs
    assert(Corpus.ngramPairs(tiny, blockCols = Nil, minJaccard = 0.5)
      .count() === 0L)
  }

  test("bpeFit learns the hand-computed merge sequence") {
    // words: aa×3, ab×2, aaaa×1.
    // round 0 pairs: (a,a): 3 (from aa) + 3 (adjacent positions in
    //   aaaa) = 6; (a,b): 2 → best (a,a,6).
    // greedy merge in aaaa: [a a a a] → [aa aa] (positions 1-2 then
    //   3-4; the merged token cannot chain this round).
    // round 1 pairs: (a,b): 2 (ab); (aa,aa): 1 (aaaa) → best (a,b,2).
    // round 2 pairs: (aa,aa): 1 → best (aa,aa,1).
    val tiny = Seq((1L, "aa ab aa aaaa"), (2L, "aa ab"))
      .toDF("doc_id", "text")
    val m = Corpus.bpeFit(tiny, merges = 3)
      .orderBy($"merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m.toSeq === Seq((0, "a", "a", 6L), (1, "a", "b", 2L),
      (2, "aa", "aa", 1L)), s"unexpected merges: ${m.toSeq}")
  }

  test("bpeApply segments with the learned rules (fit-apply round trip)") {
    // same fixture as the fit test; learned merges (a,a),(a,b),(aa,aa)
    // segment aa→[aa], ab→[ab], aaaa→[aaaa] — every word one token.
    val tiny = Seq((1L, "aa ab aa aaaa"), (2L, "aa ab"), (3L, "! 7 !"))
      .toDF("doc_id", "text")
    val rules = Corpus.bpeFit(tiny, merges = 3)
    val got = Corpus.bpeApply(tiny, rules, nMerges = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 4L, 4L), (2L, 2L, 2L), (3L, 0L, 0L)),
      s"unexpected segmentation stats: ${got.toSeq}")
    // fewer rules → coarser merges only: 1 rule (a,a) leaves ab as
    // 2 subwords and aaaa as 2, so doc1 = 1+2+1+2 = 6
    val got1 = Corpus.bpeApply(tiny, rules, nMerges = 1)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got1.toSeq === Seq((1L, 4L, 6L), (2L, 2L, 3L), (3L, 0L, 0L)),
      s"prefix-of-rules stats wrong: ${got1.toSeq}")
  }

  test("bpeSegments fails loudly on a merge table missing ranks") {
    // a degenerate training corpus fits fewer rules than requested;
    // silently crossJoining an empty per-round broadcast would empty
    // the whole segmentation (n_subwords = 0 everywhere) — the guard
    // must raise instead.
    val tiny = Seq((1L, "aa ab aa aaaa")).toDF("doc_id", "text")
    val rules = Corpus.bpeFit(tiny, merges = 2)
    val ex = intercept[IllegalArgumentException] {
      Corpus.bpeSegments(tiny, rules, nMerges = 5)
    }
    assert(ex.getMessage.contains("2 of the 5"), ex.getMessage)
  }

  test("connectedComponentsIncremental equals the full run under any edge split") {
    // star-compression equality, including the hard case: a NEW edge
    // merging two OLD components must relabel the loser's members
    def cc(e: org.apache.spark.sql.DataFrame) =
      Corpus.connectedComponents(e).orderBy($"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = Seq((1L, 2L), (3L, 4L), (2L, 3L), (6L, 7L), (8L, 9L),
      (9L, 10L)).toDF("src", "dst")
    val full = cc(edges)
    Seq(
      lit(false),       // none old (pure full run through the inc path)
      lit(true),        // all old (pure star re-propagation)
      $"src" % 2 === 1  // old = (1,2),(3,4),(9,10); NEW (2,3) merges
                        // the two old comps, NEW (8,9) extends (9,10)
    ).zipWithIndex.foreach { case (oldPred, i) =>
      val oldE = edges.filter(oldPred)
      val newE = edges.exceptAll(oldE)
      val inc = Corpus.connectedComponentsIncremental(
          Corpus.connectedComponents(oldE), newE)
        .orderBy($"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(inc === full, s"split #$i diverges from the full run")
    }
  }

  test("bm25RankIncremental equals the direct form under any batch split") {
    // lossless-partial claim: ranks/scores bit-identical to bm25Rank
    // for an interior split, all-new, and none-new — no monotonicity
    // precondition (sums commute with any split)
    val d = graft.sources.Sources.table(spark, sf(), "documents")
    val terms = Seq("hash", "join", "scan", "vector")
    val direct = Corpus.bm25Rank(d, terms, topK = 10)
      .orderBy($"rank").collect().toSeq
    Seq($"doc_id" >= 250, $"doc_id" % 3 === 0, lit(true), lit(false))
      .foreach { isNew =>
        val inc = Corpus.bm25RankIncremental(d, isNew, terms, topK = 10)
          .orderBy($"rank").collect().toSeq
        assert(inc === direct, s"split $isNew diverges from direct")
      }
  }

  test("shardAssign balances token counts and ignores input partitioning") {
    val many = spark.range(1, 401)
      .selectExpr("id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 5 + CAST(id % 37 AS INT)), x -> 'w')) AS text")
    val a = Corpus.shardAssign(many, nShards = 4)
    val sums = a.groupBy($"shard_id").agg(sum($"ntok").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sums.keySet === Set(0, 1, 2, 3), s"missing shards: $sums")
    // contiguous token-budget cut: shard sums differ by at most the
    // largest single document (41 tokens here)
    assert(sums.values.max - sums.values.min <= 41,
      s"shards unbalanced: $sums")
    // deterministic under ANY input partitioning
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    assert(key(Corpus.shardAssign(many.repartition(7), 4)) === key(a))
    // ranks are a dense 1..n sequence per shard
    val badRank = a.groupBy($"shard_id")
      .agg(count(lit(1)).as("n"), max($"shard_rank").as("mx"),
        min($"shard_rank").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1L).count()
    assert(badRank === 0L, "shard_rank must be dense 1..n per shard")
  }

  test("shardExport re-runs produce identical per-shard content") {
    val many = spark.range(1, 101)
      .selectExpr("id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 3 + CAST(id % 11 AS INT)), x -> 'w')) AS text")
    val out1 = java.nio.file.Files.createTempDirectory("shard1").toString
    val out2 = java.nio.file.Files.createTempDirectory("shard2").toString
    Corpus.shardExport(many, out1, nShards = 3)
    Corpus.shardExport(many.repartition(5), out2, nShards = 3)
    def content(p: String) = spark.read.parquet(p)
      .select($"shard_id", $"shard_rank", $"doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val c1 = content(out1)
    assert(c1 === content(out2), "export content must be partition-invariant")
    assert(c1.size === 100)
  }

  test("minhashPairsIncremental equals the backfill restricted to new sides") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(Corpus.minhashPairs(docs))
    val inc = pairs(Corpus.minhashPairsIncremental(docs,
      isNew = $"doc_id" >= 3))
    assert(inc === full.filter(p => p._1 >= 3 || p._2 >= 3),
      s"incremental $inc != restricted backfill of $full")
    // everything-new degenerates to the full backfill
    assert(pairs(Corpus.minhashPairsIncremental(docs, lit(true))) === full)
    // nothing-new yields nothing
    assert(pairs(Corpus.minhashPairsIncremental(docs, lit(false))).isEmpty)
  }

  test("containmentPairs catches a doc quoted inside a longer one") {
    // doc 21 is a verbatim substring of doc 20 (containment 1.0) but
    // the size imbalance keeps jaccard far below any dedup threshold
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val long = ("padding words alpha beta gamma delta " * 8) + quote +
      (" epsilon zeta eta theta iota kappa more tail" * 8)
    // filler docs keep the block big enough that the pair's shared
    // grams stay under the 50% document-frequency candidate cap (in a
    // 2-doc block EVERY shared gram is at 100% df and capped away)
    val filler = (30L to 37L).map(i =>
      (i, s"unrelated filler number $i with its own distinct wording zz$i",
        "en", "web"))
    val pair = (Seq((20L, long, "en", "web"), (21L, quote, "en", "web")) ++
      filler).toDF("doc_id", "text", "lang", "source")
    val cont = Corpus.containmentPairs(pair, minContainment = 0.9)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont === Set((20L, 21L)),
      s"quoted doc not caught by containment: $cont")
    val jac = Corpus.ngramPairs(pair, minJaccard = 0.5).count()
    assert(jac === 0, "jaccard should NOT fire on this size imbalance")
  }

  test("ngramPairs absolute df cap bounds a boilerplate flood; scores stay exact") {
    // 20 docs share one boilerplate passage whose grams sit at df≈22
    // — UNDER the relative n/2 guard (block has 102 docs) but over an
    // absolute cap of 8. Without the absolute cap these docs alone
    // generate 20*19/2 = 190 candidate pairs from grams carrying zero
    // near-dup signal; at 100 TB a df~10^6 gram is 10^12 pairs. Tails
    // are one repeated per-doc-unique letter so every gram touching a
    // tail is unique (even the junction gram "e $c") — flood docs
    // share ONLY over-cap grams.
    val boiler = "standard legal disclaimer text appears on every page"
    def tail(i: Int): String = { val c = ('a' + i).toChar; s" $c$c$c$c$c" }
    val flood = (0 until 20).map(i => (1000L + i, boiler + tail(i), "en", "web"))
    val filler = (0 until 60).map(i =>
      (2000L + i, f"totally unrelated filler number$i%02d piece", "en", "web"))
    // two extra boilerplate docs ALSO share a rare phrase (df=2 ->
    // candidate): their pair must be generated AND scored exactly,
    // capped boilerplate grams included via the hot-set arrays.
    // Digit endings collide with nothing in the flood tails.
    val marker = " xqzjvkwpf rare marker"
    val ta = marker + " 00"; val tb = marker + " 11"
    val pairDocs = Seq(
      (3000L, boiler + ta, "en", "web"),
      (3001L, boiler + tb, "en", "web"))
    val corpus = (flood ++ filler ++ pairDocs)
      .toDF("doc_id", "text", "lang", "source")
    def pairsAt(cap: Long) = Corpus.ngramPairs(corpus, minJaccard = 0.1,
        maxDocFreq = cap)
      .select($"doc_a", $"doc_b", $"jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val capped = pairsAt(8L)
    val uncapped = pairsAt(1000000L)
    // flood pairs exist uncapped (the quadratic blowup)…
    assert(uncapped.keys.count { case (a, b) =>
      a >= 1000L && a < 2000L && b >= 1000L && b < 2000L } === 20 * 19 / 2)
    // …and are fully suppressed from candidate generation by the cap
    assert(!capped.keys.exists { case (a, b) =>
      a >= 1000L && a < 2000L && b >= 1000L && b < 2000L },
      s"flood pairs leaked past the absolute cap: ${capped.keys}")
    // the marker pair survives (rare gram under the cap) and its score
    // is EXACT — identical to the uncapped run and to brute force
    assert(capped.contains((3000L, 3001L)))
    assert(capped((3000L, 3001L)) === uncapped((3000L, 3001L)))
    def grams(t: String): Set[String] =
      (1 to math.max(t.length - 2, 1)).map(i => t.substring(i - 1, i + 2)).toSet
    val ga = grams(boiler + ta); val gb = grams(boiler + tb)
    val brute = (ga & gb).size.toDouble / (ga | gb).size
    assert(math.abs(capped((3000L, 3001L)) - brute) < 1e-12,
      s"capped score ${capped((3000L, 3001L))} != brute $brute")
  }

  test("pipeline composes the release chain with honest per-stage accounting") {
    // one deliberate drop per stage: 3 too short (quality), 2 an
    // exact dup of 1 (dedup; same token set -> q_ppm tie -> min id
    // survives), 4 shares a 7-token passage with eval doc 100
    // (decontamination: 3 shared 5-grams >= minShared), 5 falls over
    // the token budget (lower q_ppm than 1, cum 15+10 > 20)
    val passage = "secret eval benchmark answer key here now"
    val fixture = Seq(
      (1L, "The a of and to alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web"),
      (2L, "kappa iota theta eta zeta epsilon delta gamma beta alpha to and of a the", "en", "web"),
      (3L, "tiny", "en", "web"),
      (4L, s"unrelated filler begins $passage ends with more filler", "en", "web"),
      (5L, "clean content words one two three four five six seven", "en", "web"),
      (100L, s"completely different eval frame $passage surrounded by other words", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft_release").toString
    val rel = Corpus.pipeline(fixture, isEval = $"doc_id" >= 100L,
      stratum = $"source", budgetTokens = 20L,
      minChars = 10L, minTokens = 3L, maxRepetition = 0.5,
      contaminationN = 5, contaminationMinShared = 3L,
      shards = Some((2, shardDir)))
    val byStage = rel.report.map(s => s.stage -> s).toMap
    assert(rel.report.map(_.stage) === Seq("normalize", "quality",
      "dedup", "decontaminate", "sample", "shard"))
    assert(byStage("normalize").docsIn === 6L &&
      byStage("normalize").docsOut === 5L) // eval doc leaves the train side
    assert(byStage("quality").docsOut === 4L &&
      byStage("quality").drops === Seq("too_short" -> 1L))
    assert(byStage("dedup").docsOut === 3L &&
      byStage("dedup").drops === Seq("duplicate_member" -> 1L))
    assert(byStage("decontaminate").docsOut === 2L &&
      byStage("decontaminate").drops === Seq("contaminated" -> 1L))
    assert(byStage("sample").docsOut === 1L &&
      byStage("sample").drops === Seq("over_budget" -> 1L))
    // the released selection is the canonical best-quality survivor
    val released = rel.released.collect()
    assert(released.map(_.getLong(0)).toSeq === Seq(1L))
    // normalization fed downstream: "The" counted as a stopword
    assert(released.head.getLong(3) === 5L * 1000000L / 15L) // q_ppm
    // the shard manifest covers exactly the released docs
    val manifest = rel.manifest.get.collect()
    assert(manifest.map(_.getLong(1)).sum === 1L, // n_docs
      s"manifest mismatch: ${manifest.mkString(",")}")
  }

  test("batchAssign: aligned buckets, dense full batches, partition-stable") {
    val corpus = (1L to 200L).map(i =>
      (i, Seq.fill((i % 90 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val asg = Corpus.batchAssign(corpus, maxBatchTokens = 256L,
      padMultiple = 32L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // every doc assigned exactly once; bucket covers the doc, aligned
    assert(asg.length === 200 && asg.map(_._1).distinct.length === 200)
    asg.foreach { case (id, ntok, bl, _, _) =>
      assert(bl >= ntok && bl % 32 === 0 && bl <= 256, s"doc $id: $ntok/$bl")
    }
    // within each (bucket, batch): slots dense from 0; every batch
    // except the last per bucket holds exactly 256/bucket_len seqs
    asg.groupBy(t => (t._3, t._4)).foreach { case ((bl, bid), rows) =>
      val slots = rows.map(_._5).sorted
      assert(slots.toSeq === (0L until rows.length).toSeq,
        s"non-dense slots in ($bl, $bid)")
      val maxBid = asg.filter(_._3 == bl).map(_._4).max
      if (bid < maxBid)
        assert(rows.length === (256L / bl).toInt,
          s"non-final batch ($bl, $bid) not full: ${rows.length}")
    }
    // assignment ignores input partitioning (deterministic h order)
    val re = Corpus.batchAssign(corpus.repartition(7), 256L, 32L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(re.sortBy(_._1).toSeq === asg.sortBy(_._1).toSeq)
  }

  test("spanMaskPlan: merge laws, degenerate rates, and clip at doc end") {
    val tiny = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"))
      .toDF("doc_id", "text")
    // rateDen = 1: every position starts a span — everything masks,
    // one merged run, ratio exactly 1e6
    val all = Corpus.spanMaskPlan(tiny, rateDen = 1L, spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(all(1L) === ((30L, 30L, 30L, 1L, 1000000L)), s"got $all")
    assert(all(2L) === ((3L, 3L, 3L, 1L, 1000000L)))
    // structural laws at the real rate: every start masks its own
    // position (n_masked >= n_starts), a span masks at most spanLen
    // (n_masked <= 3*n_starts), merged runs never exceed starts
    val real = Corpus.spanMaskPlan(tiny, rateDen = 3L, spanLen = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    real.foreach { case (st, mk, sp) =>
      assert(mk >= st && mk <= 3 * st && sp <= st,
        s"span laws violated: starts=$st masked=$mk spans=$sp")
    }
    // a start on the LAST position clips: fixture where only pos 3 of
    // 3 draws (scan rateDen space for a one-token doc split) — covered
    // structurally by n_masked <= n_tokens in the rateDen=1 case above
  }

  test("maxsimSearch: exact-term evidence wins and is monotone in tokens") {
    val tiny = Seq(
      (1L, "hash merge vector"),
      (2L, "apple banana pear"),
      (3L, "apple banana pear hash merge vector"))
      .toDF("doc_id", "text")
    val r = Corpus.maxsimSearch(tiny, Seq("hash", "merge", "vector"),
        topK = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // each term's max over doc 1 is at least its self-dot; doc 3 is a
    // token superset of doc 1, so adding tokens can only raise a max
    assert(r(3) >= r(1), s"superset must not lose evidence: $r")
    // the exact-match doc beats the unrelated one (self-dot ≈ 2.7M
    // per term vs near-orthogonal hash vectors)
    assert(r(1) > r(2), s"exact term match must dominate: $r")
    // self-dot lower bound, computed with the same hash embedding
    val selfDot = spark.sql(
      """SELECT aggregate(transform(sequence(0, 7), d ->
        |  md5_prefix_long(concat(t.term, ':', CAST(d AS STRING)), 8)
        |    % 2001 - 1000), 0L, (a, x) -> a + x * x) AS sd
        |FROM VALUES ('hash'), ('merge'), ('vector') AS t(term)
        |""".stripMargin)
      .collect().map(_.getLong(0)).sum
    assert(r(1) === selfDot,
      s"doc of exactly the query terms scores the self-dot sum: $r vs $selfDot")
  }

  test("systematicSample delivers exact PPS picks, certainty for big docs") {
    // one stratum, known token weights: doc i has i tokens, i = 1..16
    // (total 136); k = 4 -> step = 34, cuts at 34/68/102/136
    val corpus = (1L to 16L)
      .map(i => (i, Seq.fill(i.toInt)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "src")
    val got = Corpus.systematicSample(corpus, col("src"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    // exact count: sum of multiplicities = k whenever k*step <= total
    assert(got.map(_._3).sum === 4L, s"got ${got.toSeq}")
    // pick indexes are the cut labels 1..k, disjoint across docs
    assert(got.flatMap(x => x._2 until (x._2 + x._3)).sorted.toSeq
      === Seq(1L, 2L, 3L, 4L))
    // certainty inclusion: any doc spanning a whole step MUST be hit
    // (none here is >= 34 tokens, so instead verify via a heavy doc)
    val heavy = corpus.unionByName(
      Seq((99L, Seq.fill(500)("w").mkString(" "), "s"))
        .toDF("doc_id", "text", "src"))
    val hv = Corpus.systematicSample(heavy, col("src"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(5))).toMap
    assert(hv.contains(99L) && hv(99L) >= 2L,
      s"500-token doc must absorb multiple of the 159-token steps: $hv")
    // deterministic under any input partitioning
    val a = Corpus.systematicSample(corpus.repartition(7), col("src"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(a === got.map(x => (x._1, x._2)).toSet)
    // degenerate stratum smaller than k: every doc picked at step 1
    val tiny = Seq((1L, "a b", "t"), (2L, "c", "t"))
      .toDF("doc_id", "text", "src")
    val tv = Corpus.systematicSample(tiny, col("src"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(5)))
    assert(tv.map(_._2).sum === 3L, s"step=1 keeps every token cut: $tv")
  }

  test("ingestGate assigns every admission status, first-failing order") {
    val passage = "hidden benchmark answer string leaks here today"
    val corpus = Seq(
      // existing curated corpus
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "totally separate existing content about other things"),
      // the eval split (old side)
      (50L, s"evaluation prompt contains $passage and more context"),
      // the new batch
      (100L, "tiny"),
      (101L, "spam spam spam spam ok"),
      (102L, "iota theta eta zeta epsilon delta gamma beta alpha"), // dup of 1
      (103L, "fresh pair content words one two three four five"),
      (104L, "five four three two one words content pair fresh"),   // dup of 103
      (105L, s"new doc quoting $passage in the middle of text"),    // contaminated
      (106L, "clean novel writing with entirely original wording"),
      // cluster whose EARLIEST member fails quality: the keeper must
      // be the min-id quality-PASSING member, so the cluster still
      // admits one copy (the releasePlan dedup-after-quality order)
      (107L, "junk junk junk junk junk junk seven eight nine ten"),
      (108L, "ten nine eight seven junk")) // dup of 107's token set
      .toDF("doc_id", "text")
    val got = Corpus.ingestGate(corpus,
        isNew = $"doc_id" >= 100L, isEval = $"doc_id" === 50L,
        minChars = 4L, minTokens = 3L, maxRepetition = 0.5,
        contaminationN = 5, contaminationMinShared = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(
      100L -> "too_few_tokens", // 1 token; chars pass at minChars=4
      101L -> "repetitive",     // top token 4/5 > 0.5
      102L -> "dup_of_corpus",  // exact shuffle of old doc 1
      103L -> "accepted",       // first seen wins its batch cluster
      104L -> "dup_in_batch",
      105L -> "contaminated",   // 3 shared 5-grams vs eval doc 50
      106L -> "accepted",
      107L -> "repetitive",     // top token 6/10 > 0.5
      108L -> "accepted"),      // keeper = min QUALITY-PASSING member
      s"got $got")
  }

  test("lmScore separates shared-phrasing prose from all-novel gibberish") {
    val tiny = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "zzq qxv vbn mkl pqr"), // no bigram shared with anyone
      (4L, "one")) // sub-2-token: no bigrams at all
      .toDF("doc_id", "text")
    val r = Corpus.lmScore(tiny).orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        Option(x.get(4)).map(_.asInstanceOf[Double]), x.getBoolean(6)))
    // doc1: 5 bigrams, only "the mat" is unseen elsewhere → 1/5 novel
    assert(r(0) === ((1L, 5L, 1L, Some(0.2), true)), s"doc1: ${r(0)}")
    // doc3: every bigram unique to it → novelty 1.0, dropped
    assert(r(2)._4 === Some(1.0) && !r(2)._5, s"doc3: ${r(2)}")
    // doc4: no bigrams → null ratio, dropped
    assert(r(3) === ((4L, 0L, 0L, None, false)), s"doc4: ${r(3)}")
  }

  test("contamination catches a pasted passage an unrelated doc avoids") {
    val passage = "a b c d e f g h"
    val tiny = Seq(
      (1L, s"q r $passage"), // train doc carrying the passage
      (2L, "totally different training material with many plain words"),
      (10L, s"x y z $passage"), // eval doc quoting it: 4 shared 5-grams
      (11L, "nothing here overlaps the training corpus at all today"))
      .toDF("doc_id", "text")
    val r = Corpus.contamination(tiny, isEval = $"doc_id" >= 10L,
        n = 5, minShared = 3L)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(4)))
    assert(r.toSeq === Seq((10L, 7L, 4L, true), (11L, 5L, 0L, false)),
      s"contamination stats: ${r.toSeq}")
  }

  test("stratifiedSample empirical keep-rate tracks the requested rate") {
    // 20k ids, one stratum at 10%: the 8-hex-char hash draw makes the
    // residue bias ~2e-8, so the empirical rate is binomial around
    // 0.10 (sd ≈ 0.2 pt at n=20k) — assert within 1 pt. The old
    // 2-hex draw delivered 11.7% in expectation and fails this.
    val n = 20000L
    val ids = spark.range(0L, n).select($"id".as("doc_id"))
      .withColumn("lang", lit("en"))
    val kept = Corpus.stratifiedSample(ids, col("lang"),
      Map("en" -> 10L), default = 0L).count()
    val rate = kept.toDouble / n
    assert(math.abs(rate - 0.10) < 0.01,
      s"keep-rate $rate drifted >1pt from requested 10%")
  }

  test("temperatureSample flattens a skewed mixture deterministically") {
    // 900 en / 100 fr, target 400. Integer weights: floor(sqrt(c·1e6))
    // = 30000 / 10000 → targets 300 / 100. fr's target equals its size
    // so EVERY fr row passes the draw (threshold = 2^32); en keeps
    // ~300 of 900 binomially (sd ≈ 14 — assert ±60).
    val mix = spark.range(0L, 1000L).select($"id".as("doc_id"))
      .withColumn("lang", when($"doc_id" < 900L, "en").otherwise("fr"))
    val kept = Corpus.temperatureSample(mix, col("lang"), targetTotal = 400L)
    val m = kept.groupBy($"stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("fr") === 100L, s"fr target == size must keep all: $m")
    assert(math.abs(m("en") - 300L) < 60L,
      s"en must flatten to ~300 of 900: $m")
    val targets = kept.select($"stratum", $"target").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(targets === Map("en" -> 300L, "fr" -> 100L),
      s"integer targets must be exact: $targets")
    val again = Corpus.temperatureSample(mix, col("lang"), 400L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === kept.select($"doc_id").as[Long].collect().toSet,
      "sample must be reproducible")
  }

  test("rankEval matches the hand-computed metric curve") {
    // ranked d1..d5; relevant {d2, d4, d9} (d9 unretrieved, n_rel=3).
    // D = 232792560 = lcm(1..20). Hand-computed: at k=2 ndcg =
    // (D/2)·1e6 div (D + D/2) = 333333; at k=3 idcg = 11D/6 so ndcg
    // = (3/11)·1e6 = 272727; at k=4 dcg = 3D/4, idcg frozen (k >
    // n_rel) → ndcg = (9/22)·1e6 = 409090; k=5 adds nothing.
    val ranked = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4), (5L, 5))
      .toDF("doc_id", "rank")
    val rel = Seq(2L, 4L, 9L).toDF("doc_id")
    val r = Corpus.rankEval(ranked, rel, topK = 5).orderBy($"k")
      .select($"k", $"hits", $"prec_ppm", $"recall_ppm", $"rr_d",
        $"dcg_d", $"idcg_d", $"ndcg_ppm")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6),
        x.getLong(7)))
    val D = 232792560L
    assert(r.toSeq === Seq(
      (1L, 0L, 0L, 0L, 0L, 0L, D, 0L),
      (2L, 1L, 500000L, 333333L, D / 2, D / 2, D + D / 2, 333333L),
      (3L, 1L, 333333L, 333333L, D / 2, D / 2, D * 11 / 6, 272727L),
      (4L, 2L, 500000L, 666666L, D / 2, D * 3 / 4, D * 11 / 6, 409090L),
      (5L, 2L, 400000L, 666666L, D / 2, D * 3 / 4, D * 11 / 6, 409090L)),
      s"metric curve: ${r.toSeq}")
    // the hybrid ranking plugs straight in (rrfFuse id → doc_id)
    val lex = Seq((10L, 1), (11L, 2)).toDF("id", "rank")
    val vec = Seq((11L, 1), (12L, 2)).toDF("id", "rank")
    val fused = Corpus.rrfFuse(lex, vec, topK = 3)
      .select($"id".as("doc_id"), $"rank")
    val h = Corpus.rankEval(fused, Seq(11L).toDF("doc_id"), topK = 3)
      .orderBy($"k").select($"k", $"hits").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(h.head === (1L, 1L),
      s"doc 11 tops the fused list and is relevant: ${h.toSeq}")
  }

  test("curriculumOrder phases by exact quartiles with dense sharded order") {
    // 1000 distinct difficulties → exact 250-doc quartile phases,
    // phases strictly difficulty-ordered (easy first), and ord dense
    // 1..n within every (phase, shard).
    val d = spark.range(0L, 1000L).select($"id".as("doc_id"))
    val out = Corpus.curriculumOrder(d, $"doc_id", nShards = 4)
    val sizes = out.groupBy($"phase").count().orderBy($"phase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(sizes === Seq(1L -> 250L, 2L -> 250L, 3L -> 250L,
      4L -> 250L), s"quartile phases must be exact: $sizes")
    val ranges = out.groupBy($"phase")
      .agg(min($"difficulty").as("lo"), max($"difficulty").as("hi"))
      .orderBy($"phase").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.sliding(2).forall(p => p(0)._2 < p(1)._1),
      s"phases must be difficulty-ordered: ${ranges.toSeq}")
    val dense = out.groupBy($"phase", $"shard")
      .agg(count(lit(1)).as("n"), min($"ord").as("mn"),
        max($"ord").as("mx"), sum($"ord").as("s"))
      .collect()
    assert(dense.forall { r =>
      val (n, mn, mx, s2) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      mn == 1L && mx == n && s2 == n * (n + 1) / 2
    }, "ord must be dense 1..n per (phase, shard)")
    // equal difficulty never splits across phases
    val flat = Corpus.curriculumOrder(d, lit(7L), nShards = 4)
      .select($"phase").distinct().collect().map(_.getLong(0)).toSeq
    assert(flat === Seq(1L), s"constant difficulty must be one phase: $flat")
  }

  test("mixtureSample repeats small strata whole epochs and drops unweighted ones") {
    // a: 4 docs × 10 tokens = 40 avail, weight 750000, budget 160
    //    → target 120, ratio exactly 3.0 → every doc exactly 3 epochs
    // b: 4 × 10 = 40 avail, weight 250000 → target 40, ratio exactly
    //    1.0 → every doc exactly once
    // c: no declared weight → absent entirely
    val docs = spark.range(0L, 12L).select($"id".as("doc_id"))
      .withColumn("lang", element_at(array(lit("a"), lit("b"), lit("c")),
        ($"doc_id" % 3 + 1).cast("int")))
      .withColumn("n_chars", lit(10L))
    val out = Corpus.mixtureSample(docs, col("lang"), col("n_chars"),
      Map("a" -> 750000L, "b" -> 250000L), budgetTokens = 160L)
    val reps = out.groupBy($"stratum")
      .agg(min($"n_repeats").as("lo"), max($"n_repeats").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(reps === Map("a" -> ((3L, 3L, 4L)), "b" -> ((1L, 1L, 4L))),
      s"integer-epoch strata must repeat exactly: $reps")
    // fractional ratio: one stratum, target half its size → every kept
    // doc runs once and the draw is reproducible
    val half = Corpus.mixtureSample(docs.filter($"lang" === "a"),
      col("lang"), col("n_chars"), Map("a" -> 1000000L),
      budgetTokens = 20L)
    assert(half.select($"n_repeats").distinct().collect()
      .forall(_.getLong(0) === 1L), "sub-1 ratio must never repeat")
    val again = Corpus.mixtureSample(docs.filter($"lang" === "a"),
      col("lang"), col("n_chars"), Map("a" -> 1000000L), 20L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again === half.select($"doc_id").as[Long].collect().toSet,
      "mixture draw must be reproducible")
  }

  test("packSequences matches a single-window reference and is partition-stable") {
    // 200 docs, 1–7 tokens each: the two-level cumsum must equal a
    // naive driver-side cumsum over the same (h, doc_id) order, and
    // must not depend on the input partitioning.
    val corpus = spark.range(0L, 200L).select($"id".as("doc_id"))
      .withColumn("text", expr(
        "array_join(transform(sequence(1, CAST(doc_id % 7 + 1 AS INT))," +
          " i -> 'tok'), ' ')"))
    val got = Corpus.packSequences(corpus, seqTokens = 32L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // driver-side reference: same hash, same order, plain cumsum
    val base = corpus.select($"doc_id",
        size(split($"text", " ")).cast("long").as("ntok"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14)," +
          " 16, 10) AS BIGINT)").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var cum = 0L
    val want = base.sortBy(t => (t._3, t._1)).map { case (id, ntok, _) =>
      val res = (id, ntok, cum / 32L, cum % 32L)
      cum += ntok
      res
    }.sortBy(_._1)
    assert(got.toSeq === want.toSeq, "two-level cumsum must equal reference")
    assert(got.forall(t => t._4 >= 0L && t._4 < 32L),
      "seq_off must be within the budget")
    val repart = Corpus.packSequences(corpus.repartition(7), 32L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(repart.toSeq === got.map(t => (t._1, t._3, t._4)).toSeq,
      "packing must be partition-invariant")
  }

  test("connectedComponents resolves a deep chain in O(log n) rounds") {
    // a 512-node path graph has diameter 511: plain min-label
    // propagation needs 511 rounds (and would hit maxIter=50);
    // pointer jumping doubles label travel each round → ~log2(512)=9,
    // plus a couple of settle/convergence-check rounds.
    val n = 512
    val chain = spark.range(0L, (n - 1).toLong)
      .select($"id".as("src"), ($"id" + 1L).as("dst"))
    val (labels, rounds) = Corpus.connectedComponentsStats(chain, maxIter = 50)
    val comps = labels.select(countDistinct($"component_id")).as[Long].head()
    assert(comps === 1L, s"chain must collapse to one component, got $comps")
    val maxLabel = labels.select(max($"component_id")).as[Long].head()
    assert(maxLabel === 0L, "component label must be the min node id")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 2
    assert(rounds <= bound,
      s"deep chain took $rounds rounds; pointer jumping should need ≤ $bound")
  }

  test("connectedComponents matches union-find on random graphs") {
    // the pointer-jumping shortcut is the subtle part — verify the
    // fixpoint against a plain in-memory union-find over random edge
    // lists (raw ScalaCheck Gen with fixed seeds, as in
    // ArgMinPropertySpec)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      a <- Gen.choose(0L, 24L)
      d <- Gen.choose(1L, 24L) // b != a by construction (no Gen filter)
    } yield (a, (a + d) % 25L)
    val graphGen = Gen.nonEmptyListOf(edgeGen).map(_.take(40))
    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    (1 to 8).foreach { i =>
      val edges = graphGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val expected = unionFind(edges)
      val got = Corpus.connectedComponents(
        edges.toDF("src", "dst"), maxIter = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed $i: $got != $expected (edges $edges)")
    }
  }

  test("connectedComponents table mode leaves only the final round table") {
    def ccTables() = spark.catalog.listTables().collect().map(_.name)
      .filter(t => t.startsWith("graft_mat_cc_round_") ||
        t.startsWith("graft_mat_corpus_cc_edges_"))
    ccTables().foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    spark.conf.set("graft.materialize.mode", "table")
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
      val comps = Corpus.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps(3L) === 1L && comps(11L) === 10L,
        s"table-mode labels wrong: $comps")
      // the loop must drop every superseded round's table and the
      // edges table — only the FINAL labels table (which the returned
      // frame reads) may remain
      val left = ccTables()
      assert(left.length === 1 && left.head.startsWith("graft_mat_cc_round_"),
        s"connectedComponents leaked tables: ${left.mkString(", ")}")
    } finally {
      spark.conf.unset("graft.materialize.mode")
      ccTables().foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("empty and dup-free corpora terminate with empty results") {
    val empty = docs.filter($"doc_id" < 0)
    assert(Corpus.minhashPairs(empty).count() === 0)
    assert(Corpus.dedupComponents(empty).count() === 0)
    // all-unique corpus: no edges → no components, loop exits round 1
    val unique = Seq((10L, "aa bb cc"), (11L, "dd ee ff"))
      .toDF("doc_id", "text")
    assert(Corpus.dedupComponents(unique).count() === 0)
  }

  test("spanDedup flags every later copy of a duplicated substring as one maximal span") {
    val P = "the quick brown fox jumps" // 25 chars, no internal repeat
    val Q = "0123456789ABCDEFG"         // 17 chars, all distinct
    val d = Seq(
      (10L, "ab" + P + "cdefghijkl"),   // P at pos 3 — first occurrence
      (20L, "mnop" + P + "qrst"),       // P at pos 5 — removable copy
      (30L, Q + Q)                      // within-doc repeat: 2nd Q removable
    ).toDF("doc_id", "text")
    val out = Corpus.spanDedup(d, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 20: the 16 windows fully inside P merge to one span of len(P)
    // starting where P starts; doc 10 keeps everything (first occurrence);
    // doc 30: windows 18..25 (the second Q) merge to one span of len(Q).
    assert(out === Set((20L, 5L, 25L, 16L), (30L, 18L, 17L, 8L)),
      s"unexpected spans: $out")
  }

  test("spanDedupIncremental: all-new ≡ full run, none-new ≡ empty, old side untouched") {
    val P = "the quick brown fox jumps"
    val d = Seq(
      (10L, "ab" + P + "cdefghijkl"),
      (20L, "mnop" + P + "qrst"),
      (30L, "wxyz" + P + "uv99")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = rows(Corpus.spanDedup(d, k = 10))
    assert(rows(Corpus.spanDedupIncremental(d, lit(true), k = 10)) === full,
      "all-new must equal the full run")
    assert(rows(Corpus.spanDedupIncremental(d, lit(false), k = 10)) === Set(),
      "none-new must be empty")
    // docs 10+20 old, 30 new: only doc 30 gets spans, and they match
    // the full run's doc-30 spans (old-first order ≡ doc_id order here)
    val inc = rows(Corpus.spanDedupIncremental(d, col("doc_id") >= 30, k = 10))
    assert(inc === full.filter(_._1 >= 30L), s"got $inc vs $full")
  }

  test("winnowPairsIncremental: all-new ≡ full run, none-new ≡ empty, restriction law") {
    val shared = "the quick brown fox jumps over the lazy dog again "
    val d = Seq(
      (10L, shared + "alpha beta gamma delta epsilon"),
      (20L, shared + "zeta eta theta iota kappa"),
      (30L, shared + "one two three four five six")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = rows(Corpus.winnowPairs(d, minShared = 2L))
    assert(full.nonEmpty, "fixture must produce shared-fingerprint pairs")
    assert(rows(Corpus.winnowPairsIncremental(d, lit(true), minShared = 2L))
      === full, "all-new must equal the full run")
    assert(rows(Corpus.winnowPairsIncremental(d, lit(false), minShared = 2L))
      === Set(), "none-new must be empty")
    val inc = rows(Corpus.winnowPairsIncremental(d, col("doc_id") >= 30,
      minShared = 2L))
    assert(inc === full.filter(p => p._1 >= 30L || p._2 >= 30L),
      s"restriction law: $inc vs $full")
  }

  test("spanClean excises exactly the removable spans and passes clean docs through") {
    val P = "the quick brown fox jumps"
    val Q = "0123456789ABCDEFG"
    val d = Seq(
      (10L, "ab" + P + "cdefghijkl"),
      (20L, "mnop" + P + "qrst"),
      (30L, Q + Q)
    ).toDF("doc_id", "text")
    val out = Corpus.spanClean(d, k = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(10L) === ((0L, "ab" + P + "cdefghijkl")),
      "first-occurrence doc must pass through unchanged")
    assert(out(20L) === ((25L, "mnopqrst")), s"got ${out(20L)}")
    assert(out(30L) === ((17L, Q)), s"got ${out(30L)}")
  }

  test("probeFit separates a separable corpus and is partition-independent") {
    // 6 keepers (>=100 chars, >=18 distinct tokens) vs 6 rejects
    val long = (0 until 6).map { i =>
      (100L + i, (0 until 20).map(j => f"tok${i}_$j%02d").mkString(" "))
    }
    val short = (0 until 6).map(i => (200L + i, s"aa bb c$i"))
    val d = (long ++ short).toDF("doc_id", "text")
    val out = Corpus.probeFit(d, rounds = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getBoolean(4)))
    val acc = out.count(_._2._3)
    assert(acc === 12, s"separable fixture must fit perfectly: $acc/12")
    // integer sums are order-independent: any partitioning, same fit
    val out2 = Corpus.probeFit(d.repartition(7), rounds = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(out2.toMap === out.toMap, "fit must not depend on partitioning")
  }

  test("probeApply over probeWeights reproduces probeFit, and frozen " +
       "weights score an unseen batch") {
    val long = (0 until 6).map { i =>
      (100L + i, (0 until 20).map(j => f"tok${i}_$j%02d").mkString(" "))
    }
    val short = (0 until 6).map(i => (200L + i, s"aa bb c$i"))
    val d = (long ++ short).toDF("doc_id", "text")
    // law: fit-then-score-in-place ≡ probeFit (same frame, same rounds)
    val fit = Corpus.probeFit(d, rounds = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val applied = Corpus.probeApply(d, Corpus.probeWeights(d, rounds = 8))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(applied === fit, "probeApply(probeWeights(d)) must ≡ probeFit(d)")
    // frozen weights generalize: a disjoint batch drawn from the same
    // two modes scores per-row (no refit) and classifies both modes
    val batch = Seq(
      (900L, (0 until 20).map(j => f"new_$j%02d").mkString(" ")),
      (901L, "aa bb zz")).toDF("doc_id", "text")
    val scored = Corpus.probeApply(batch, Corpus.probeWeights(d, rounds = 8))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(scored(900L) && scored(901L),
      s"frozen probe must classify both held-out modes: $scored")
  }

  test("probeCalibration bands are equal-width, exhaustive, and ppm-exact") {
    // 100 docs, scores 0..99, labels split at 50, all predictions
    // correct: width = (99-0) div 10 + 1 = 10, so bands 0..9 hold 10
    // docs each, pos_ppm is 0 below the split and 1e6 above it
    val scored = (0 until 100).map { i =>
      (i.toLong, if (i >= 50) 1L else -1L, i.toLong,
        if (i >= 50) 1L else -1L, true)
    }.toDF("doc_id", "y", "score", "pred", "correct")
    val out = Corpus.probeCalibration(scored).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.keySet === (0L until 10L).toSet, s"bands: ${out.keySet}")
    assert(out.values.map(_._1).sum === 100L, "band counts must partition")
    (0L until 10L).foreach { b =>
      assert(out(b)._1 === 10L, s"equal-width band $b holds ${out(b)._1}")
      assert(out(b)._2 === (if (b >= 5) 1000000L else 0L),
        s"pos_ppm at band $b: ${out(b)._2}")
      assert(out(b)._3 === 1000000L, s"all-correct fixture, band $b")
    }
    // constant-score degenerate: width = 1, single band 0
    val const = Seq((1L, 1L, 7L, 1L, true), (2L, -1L, 7L, -1L, false))
      .toDF("doc_id", "y", "score", "pred", "correct")
    val cOut = Corpus.probeCalibration(const).collect()
    assert(cOut.length === 1 && cOut.head.getLong(0) === 0L,
      "constant scores must land in band 0 only")
    assert(cOut.head.getLong(5) === 500000L, "1-of-2 correct = 500000 ppm")
  }

  test("bm25Rank orders by term density and rrfFuse rewards presence in both lists") {
    val d = Seq(
      (1L, "cat cat cat dog filler filler filler filler"),
      (2L, "cat dog filler filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler filler filler"),
      (4L, "cat filler filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val lex = Corpus.bm25Rank(d, Seq("cat", "dog"), topK = 3)
    val ranks = lex.collect().map(r => r.getInt(1) -> r.getLong(0)).toMap
    assert(ranks(1) === 1L, s"3x cat + dog must rank first: $ranks")
    assert(ranks(2) === 2L, s"cat + dog must beat lone cat: $ranks")
    assert(ranks(3) === 4L, s"doc with no query terms must not outrank: $ranks")
    // fusion: doc 9 is rank 1 lexically but absent from the vector
    // list; doc 2 is rank 2 in BOTH lists and must fuse above it
    // (1/62 + 1/62 > 1/61 + 0)
    val lexR = Seq((9L, 1), (2L, 2)).toDF("id", "rank")
    val vecR = Seq((7L, 1), (2L, 2)).toDF("id", "rank")
    val fused = Corpus.rrfFuse(lexR, vecR, topK = 3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fused(1) === 2L, s"doc in both lists must fuse to the top: $fused")
  }

  test("qualityFilter assigns first-failing reasons") {
    val out = Corpus.qualityFilter(docs, minChars = 10L, minTokens = 9L,
        maxRepetition = 0.5)
      .select($"doc_id", $"keep", $"drop_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(4L) === ((true, null)))           // 10 tokens, low repetition
    assert(out(5L) === ((false, "repetitive")))  // 9/10 same token
    assert(out(1L)._2 === "too_few_tokens")      // 8 tokens < 9
  }

  test("keyphrases: stopword-split islands, RAKE scoring, deterministic ranks") {
    val kd = Seq(
      (1L, "deep learning of the deep learning stack and a cat"),
      (2L, "deep learning beats the cat"),
      (3L, "the of and a to")) // all stopwords → no candidates
      .toDF("doc_id", "text")
    val got = Corpus.keyphrases(kd, maxLen = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // no phrase contains a stopword; all-stopword doc emits nothing
    val stop = Set("the", "a", "of", "and", "to")
    assert(got.forall(g => g._3.split(" ").forall(w => !stop(w))))
    assert(!got.exists(_._1 == 3L))
    // ranks are 1..k per doc, scores non-increasing within a doc
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rows.length))
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._5 >= y._5
        case _ => true
      })
    }
    // RAKE favors the co-occurring multi-word run: "deep learning
    // stack" (each word rides high degrees) outranks the lone "cat"
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.head._3.contains("deep learning"),
      s"expected the co-occurrence run first, got ${d1.toSeq}")
    // deterministic: a second run is identical
    val again = Corpus.keyphrases(kd, maxLen = 4, topK = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    assert(got.sortBy(x => (x._1, x._2)).toSeq ===
      again.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("dedupCanonical keeps the best-quality member, one row per cluster") {
    val cd = Seq(
      (1L, "alpha beta gamma the the the"),   // q_ppm = 500000
      (2L, "the gamma beta alpha"),           // exact canon dup, q 250000
      (4L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = Corpus.dedupCanonical(cd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly the 1-2 cluster; the singleton doc 4 is no cluster
    assert(got.length === 1)
    val (comp, canon, n, q) = got.head
    assert(comp === 1L && n === 2L)
    assert(canon === 1L && q === 500000L,
      s"higher-quality member must survive, got canon=$canon q=$q")
  }

  test("corpusOverlap: identical sides → jaccard 1, disjoint sides → 0") {
    // two copies of every doc, one per side: shingle sets identical
    val both = docs.withColumn("side", lit(0))
      .union(docs.withColumn("side", lit(1)))
    val same = Corpus.corpusOverlap(both, col("side")).collect().head
    assert(same.getAs[Long]("jaccard_ppm") === 1000000L)
    assert(same.getAs[Long]("kmv_ppm") === 1000000L)
    graft.Engine.dropAllMaterialized(spark)
    // doc 4 shares no tokens with docs 1-3: zero overlap
    val disj = Corpus.corpusOverlap(
      docs.filter($"doc_id" <= 4),
      when($"doc_id" === 4, 1).otherwise(0)).collect().head
    assert(disj.getAs[Long]("n_inter") === 0L)
    assert(disj.getAs[Long]("jaccard_ppm") === 0L)
    graft.Engine.dropAllMaterialized(spark)
    purgeMatTables("overlap_")
  }

  test("text_chunk tiles every document: no gaps, full coverage, standard window count") {
    val out = SparkEntry.queries("text_chunk")(spark, sf())
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_toks")
    val toks = graft.sources.Sources.table(spark, sf(), "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    // per doc: first chunk starts at 0, last chunk ends exactly at n,
    // and chunk i+1 starts before chunk i ends (no token uncovered)
    val agg = out.groupBy($"doc_id").agg(
      min($"start_tok").as("first_start"),
      max($"start_tok" + $"n_toks").as("max_end"),
      count(lit(1)).as("n_chunks"))
      .join(toks, "doc_id")
    val bad = agg.filter($"first_start" =!= 0L || $"max_end" =!= $"n" ||
      $"n_chunks" =!= lit(1L) +
        ceil(greatest($"n" - 64L, lit(0L)).cast("double") / 48.0).cast("long"))
    assert(bad.count() === 0)
    // adjacency: every interior boundary overlaps (stride < window)
    val gaps = out.as("a").join(out.as("b"),
      $"a.doc_id" === $"b.doc_id" && $"a.chunk_idx" + 1L === $"b.chunk_idx" &&
        $"b.start_tok" > $"a.start_tok" + $"a.n_toks")
    assert(gaps.count() === 0)
  }

  test("shardWrite: lossless shards, honest manifest, deterministic, prunable") {
    val corpus = graft.sources.Sources.table(spark, sf(), "documents")
    val dir = java.nio.file.Files.createTempDirectory("shardw").toString
    val manifest = Corpus.shardWrite(corpus, nShards = 4, dir).collect()
    assert(manifest.map(_.getAs[Int]("shard_id")).sorted
      .sameElements(0 until 4))
    // lossless: every doc lands in exactly one shard
    val back = spark.read.parquet(dir)
    assert(back.count() === corpus.count())
    assert(back.select($"doc_id").distinct().count() === corpus.count())
    // manifest matches an independent recompute from the read-back
    val re = back.groupBy($"shard_id")
      .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"),
        sum(expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), " +
          "1, 14), 16, 10) AS BIGINT) % 2147483648L")).as("id_checksum"))
      .collect().map(r => r.getAs[Int]("shard_id") ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    manifest.foreach { m =>
      assert(re(m.getAs[Int]("shard_id")) ===
        ((m.getAs[Long]("n_docs"), m.getAs[Long]("n_tokens"),
          m.getAs[Long]("id_checksum"))))
    }
    // token balance: every shard within budget + one max doc
    val budget = manifest.map(_.getAs[Long]("n_tokens")).sum / 4 + 1
    val maxDoc = back.agg(max($"ntok")).collect().head.getLong(0)
    assert(manifest.forall(_.getAs[Long]("n_tokens") <= budget + maxDoc))
    // a dataloader reads ONE shard directory without touching the rest
    val one = spark.read.parquet(s"$dir/shard_id=2")
    assert(one.count() ===
      manifest.find(_.getAs[Int]("shard_id") == 2).get.getAs[Long]("n_docs"))
    // rewrite is deterministic: same manifest bytes
    val again = Corpus.shardWrite(corpus, nShards = 4, dir).collect()
    assert(again.map(_.toSeq).toSeq === manifest.map(_.toSeq).toSeq)
  }

  test("cdcChunks: boundaries are edit-stable — an early insertion re-aligns") {
    // distinct tokens so no chunk repeats by accident; doc 2 is doc 1
    // with ONE token inserted at the front (the edit fixed-width
    // chunking cannot absorb: every downstream window shifts)
    val a = (1 to 300).map(i => s"w$i").mkString(" ")
    val two = Seq((1L, a), (2L, "zzz " + a)).toDF("doc_id", "text")
    val out = Corpus.cdcChunks(two).collect()
    def shas(id: Long) = out.filter(_.getLong(0) == id)
      .map(_.getString(4)).toSet
    val shared = shas(1L) intersect shas(2L)
    assert(shared.nonEmpty,
      "CDC boundaries must re-align after an early insertion")
    // the shared passages are visible as cross-doc duplicates
    assert(out.filter(r => shared.contains(r.getString(4)))
      .forall(_.getLong(5) === 2L))
    // the un-shared head exists on both sides (the one lost chunk)
    assert((shas(1L) diff shas(2L)).nonEmpty &&
      (shas(2L) diff shas(1L)).nonEmpty)
    // fixed-width windows share NOTHING under the same edit — the
    // contrast that motivates CDC
    val fixedA = a.split(" ").grouped(16).map(_.mkString(" ")).toSet
    val fixedB = ("zzz " + a).split(" ").grouped(16)
      .map(_.mkString(" ")).toSet
    assert((fixedA intersect fixedB).isEmpty)
  }

  test("prioritySample matches an exact scalar reimplementation (top-k, tau, estimator)") {
    val items = spark.range(1L, 201L)
      .select($"id".as("doc_id"), ($"id" % 100L + 1L).as("wt"))
    val got = Corpus.prioritySample(items, k = 16, tokens = col("wt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // reference: the same integer arithmetic, scalar Scala (positive
    // Long `/` truncates exactly like Spark's `div`)
    def h32(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)
    val qs = (1L until 201L).map { id =>
      val w = id % 100L + 1L
      (id, w, w * 4294967296L / (h32(id) + 1L))
    }
    val ranked = qs.sortBy { case (id, _, q) => (-q, id) }
    val tau = ranked(16)._3
    val expect = ranked.take(16)
      .map { case (id, w, q) => (id, w, q, math.max(w, tau)) }
      .sortBy(_._1)
    assert(got === expect)
    // the DLT guarantee on this draw: every item with w > tau is kept
    assert(qs.filter(_._2 > tau).forall(t => expect.exists(_._1 == t._1)))
    assert(got.forall(r => r._4 >= r._2), "estimator max(w, tau) >= w")
    // fewer than k+1 items -> no threshold -> empty (documented)
    assert(Corpus.prioritySample(items.limit(10), k = 16,
      tokens = col("wt")).count() === 0L)
  }

  test("mmrRerank: greedy invariants — first pick is top BM25, objective non-increasing, diverse") {
    val docs = graft.sources.Sources.table(spark, sf(), "documents")
    val terms = Seq("hash", "join", "scan", "vector")
    val out = Corpus.mmrRerank(docs, terms, poolK = 20, k = 10)
      .orderBy($"sel_rank").collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === 10,
      "selected docs must be distinct")
    // pick 1 is the relevance argmax: rel_ppm = 1e6 (the pool max)
    assert(out.head.getAs[Long]("rel_ppm") === 1000000L)
    assert(out.head.getAs[Long]("max_sim_ppm") === 0L)
    // greedy objective is non-increasing in selection order: pick r's
    // mmr against MORE selected docs can only shrink, and pick r was
    // the round's argmax
    val mmr = out.map(_.getAs[Long]("mmr_x100"))
    assert(mmr.zip(mmr.tail).forall { case (a, b) => a >= b },
      s"mmr must be non-increasing: ${mmr.mkString(",")}")
    // diversification really binds: some later pick has nonzero
    // similarity penalty (near-dup-rich synthetic corpus)
    assert(out.exists(_.getAs[Long]("max_sim_ppm") > 0L))
  }

  test("isotonicCalibrate: minimax fit equals hand-computed PAVA, always monotone") {
    // one violation (bands 1,2 out of order) pools to their weighted
    // mean: [200k, 600k, 400k, 800k] -> [200k, 500k, 500k, 800k]
    val bands = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L),
      (3L, 10L, 8L)).toDF("band", "n_docs", "n_pos")
    val out = Corpus.isotonicCalibrate(bands).orderBy($"band")
      .select($"band", $"iso_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((0L, 200000L), (1L, 500000L), (2L, 500000L),
      (3L, 800000L)))
    // already-monotone input is a fixed point
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
      .toDF("band", "n_docs", "n_pos")
    val fixed = Corpus.isotonicCalibrate(mono).orderBy($"band")
      .collect().map(r => r.getAs[Long]("iso_ppm"))
    assert(fixed === Array(100000L, 500000L, 900000L))
    // monotone on the real probe curve too
    val d = graft.sources.Sources.table(spark, sf(), "documents")
    val iso = Corpus.isotonicCalibrate(Corpus.probeCalibration(
        Corpus.probeFit(d, rounds = 8)))
      .orderBy($"band").collect().map(_.getAs[Long]("iso_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"isotonic output must be monotone: ${iso.mkString(",")}")
  }

  test("prfSearch: expansion terms are mined, weighted rescore stays bounded") {
    val docs = graft.sources.Sources.table(spark, sf(), "documents")
    val plain = Corpus.bm25Rank(docs, Seq("hash", "join"), topK = 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score"))
      .toMap
    val out = Corpus.prfSearch(docs, Seq("hash", "join"), fbDocs = 10,
      fbTerms = 3, topK = 20).orderBy($"rank").collect()
    assert(out.length === 20)
    // a doc can match at most |terms| + fbTerms distinct terms
    assert(out.forall(_.getAs[Long]("n_terms") <= 5L))
    val score = out.map(_.getAs[Long]("score"))
    assert(score.zip(score.tail).forall { case (a, b) => a >= b })
    // the expansion is not a no-op: some doc's expanded score differs
    // from 2x its plain score (weight-2 originals alone would give
    // exactly 2x for docs matching no expansion term — at least one
    // top doc must have picked up expansion-term mass)
    assert(out.exists { r =>
      plain.get(r.getAs[Long]("doc_id"))
        .exists(p => r.getAs[Long]("score") != 2L * p)
    }, "expansion terms must contribute to at least one top doc")
  }

  test("allPairsJoin incremental equals full restricted to new-touching pairs") {
    // arbitrary split marker (not the registry's doc_id >= 400): the
    // frozen-order incremental path must agree with the full run on
    // every pair touching a new doc, under any append split
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "beta alpha gamma delta epsilon zeta eta theta"),
      (3L, "theta eta zeta epsilon delta gamma beta alpha"),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "one two three four five six seven eight nine eleven"),
      (6L, "alpha beta gamma delta epsilon zeta eta iota"),
      (7L, "spam spam spam spam spam spam ok"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_a", $"doc_b", $"inter", $"sz_a", $"sz_b", $"jacc_ppm")
      .collect().map(_.toSeq).toSet
    val full = rows(Corpus.allPairsJoin(corpus, tPpm = 500000L))
    for (cut <- Seq(3L, 5L, 6L)) {
      Engine.clearShared() // each cut is its own "session index"
      val inc = rows(Corpus.allPairsJoin(corpus, tPpm = 500000L,
        isNew = Some($"doc_id" >= cut)))
      val want = full.filter(r => r.head.asInstanceOf[Long] >= cut ||
        r(1).asInstanceOf[Long] >= cut)
      assert(inc === want, s"cut=$cut: inc=$inc want=$want")
    }
    Engine.clearShared()
  }

  test("allPairsDfMerge: additive df update equals the from-scratch count") {
    // the index-maintenance law: df(old u batch) = df(old) + df(batch)
    val tok = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L),   // old shingles
      (3L, 10L), (3L, 13L), (4L, 12L), (4L, 13L))   // batch shingles
      .toDF("doc_id", "h")
    val old = tok.filter($"doc_id" <= 2L)
    val batch = tok.filter($"doc_id" > 2L)
    val dfOld = old.groupBy($"h").agg(count(lit(1)).as("df"))
    val merged = Corpus.allPairsDfMerge(dfOld, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = tok.groupBy($"h").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === scratch)
  }
}
