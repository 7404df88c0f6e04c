package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: Morton-key algebra, the clustered-write plan, and
  * the thing the layout exists for — parquet footer min/max stats
  * that actually skip files on BOTH interleaved dimensions. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("mortonKey matches the reference interleave and is bijective") {
    val pairs = for (x <- 0 to 40; y <- 0 to 40) yield (x.toLong, y.toLong)
    val df = pairs.toDF("x", "y")
      .withColumn("z", Layout.mortonKey($"x", $"y", 16))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y, 16), s"($x,$y)")
      // decode: de-interleave even/odd bits back out
      var (dx, dy) = (0L, 0L)
      (0 until 16).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y, s"decode($z)")
    }
    // bijective on the sample: all z distinct
    assert(got.map(_._3).distinct.length == pairs.length)
  }

  test("mortonKeyN: n=2 degenerates to mortonKey; 3-dim layout prunes every dim") {
    // the N-dim interleave at n = 2 IS the classic Morton key
    val grid = spark.range(0, 64).select(
      ($"id" % 8).as("x"), ($"id" / 8).as("y"))
    val both = grid.select(
        Layout.mortonKey($"x", $"y", 3).as("k2"),
        Layout.mortonKeyN(Seq($"x", $"y"), 3).as("kn"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // 3 dims: every listed dimension's per-bucket min/max extent
    // tightens well below the full range (that tightness IS footer
    // skip power, scale-independent — the registered query's skip
    // literals are tuned for sf>=0.01), while natural order bounds
    // only its own sort column
    val rows = SparkEntry.queries("layout_zorder3")(spark, sf()).collect()
    def avgExtent(layout: String, lo: Int, hi: Int): Double = {
      val r = rows.filter(_.getString(0) == layout)
      r.map(x => (x.getLong(hi) - x.getLong(lo)).toDouble).sum / r.length
    }
    def fullExtent(lo: Int, hi: Int): Double = {
      val r = rows.filter(_.getString(0) == "natural")
      r.map(_.getLong(hi)).max - r.map(_.getLong(lo)).min
    }
    for ((lo, hi, dim) <- Seq((3, 4, "part"), (5, 6, "supp"), (7, 8, "ord")))
      assert(avgExtent("zorder3", lo, hi) < 0.6 * fullExtent(lo, hi),
        s"zorder3 bucket $dim extent not tight")
    // natural buckets span (almost) the full part/supp ranges
    assert(avgExtent("natural", 3, 4) > 0.8 * fullExtent(3, 4))
    assert(avgExtent("natural", 5, 6) > 0.8 * fullExtent(5, 6))
    // guard: dims*bits beyond a positive long is rejected
    intercept[IllegalArgumentException] {
      Layout.mortonKeyN(Seq($"x", $"y", $"x", $"y"), 16)
    }
  }

  test("mortonSqlDuck is the expression-for-expression twin") {
    // run the DuckDB-dialect text through Spark SQL (operators are
    // shared dialect: >>, &, <<) against the codegen Column form
    val df = Seq((3L, 5L), (1023L, 17L), (65535L, 65535L), (0L, 0L))
      .toDF("x", "y")
      .withColumn("z_col", Layout.mortonKey($"x", $"y", 16))
      .withColumn("z_sql", expr(Layout.mortonSqlDuck("x", "y", 16)))
    assert(df.filter($"z_col" =!= $"z_sql").count() == 0)
  }

  test("zorderWrite: range-partitioned plan, disjoint files, 2-D skipping") {
    val out = Files.createTempDirectory("zorder").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")

    // the write-side plan is range partitioning, never a global sort
    val planned = Layout
      .withMortonKey(li, $"l_partkey", $"l_suppkey", 16)
      .repartitionByRange(32, $"_zkey")
      .sortWithinPartitions($"_zkey")
    val physical = planned.queryExecution.executedPlan.toString
    assert(physical.contains("rangepartitioning") ||
      physical.contains("RangePartitioning") || physical.contains("REPARTITION_BY_RANGE"),
      s"expected range partitioning in:\n$physical")
    assert(!physical.contains("Sort [") ||
      !physical.contains("global=true"), "no global sort allowed")

    Layout.zorderWrite(li, $"l_partkey", $"l_suppkey", 16, 32, out)

    // per-file zkey ranges are pairwise disjoint (the range-partition
    // guarantee, re-derived from the data since _zkey is dropped; the
    // read-back re-derivation sees the same global min/max, so the
    // scaled keys are identical)
    val perFile = Layout
      .withMortonKey(spark.read.parquet(out).withColumn("f", input_file_name()),
        $"l_partkey", $"l_suppkey", 16, keyCol = "z")
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length >= 2)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlap")
      case _ =>
    }

    // 2-D skipping: under the z-order layout a selective predicate on
    // EITHER dimension is skippable (file min/max excludes it) for at
    // least half the files; under the natural (orderkey) layout
    // every file spans nearly the full range of both keys, so nothing
    // skips. This is the parquet-footer-level reality the registered
    // layout_zorder query models with ntile buckets.
    def skipRates(path: String): (Double, Double) = {
      val stats = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy($"f")
        .agg(min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"),
          min($"l_suppkey").as("min_s"), max($"l_suppkey").as("max_s"))
        .collect()
      val n = stats.length.toDouble
      // predicates sit inside one curve quadrant of their dimension —
      // a range straddling a top-bit boundary caps the skip rate at
      // 1/2 by construction regardless of layout quality
      val partLo = 155L; val partHi = 174L; val suppLo = 4L; val suppHi = 5L
      val skipP = stats.count(r =>
        r.getLong(2) < partLo || r.getLong(1) > partHi) / n
      val skipS = stats.count(r =>
        r.getLong(4) < suppLo || r.getLong(3) > suppHi) / n
      (skipP, skipS)
    }
    val natural = Files.createTempDirectory("natural").toString
    li.repartitionByRange(32, $"l_orderkey", $"l_linenumber")
      .write.mode("overwrite").parquet(natural)
    val (zp, zs) = skipRates(out)
    val (np, ns) = skipRates(natural)
    assert(zp >= 0.5, s"zorder part skip rate $zp")
    assert(zs >= 0.5, s"zorder supp skip rate $zs")
    assert(zp > np && zs > ns,
      s"zorder ($zp,$zs) must beat natural ($np,$ns)")
  }

  test("hilbert curve rides the full write/compact path: skip rates, meta, delta-local rewrite") {
    val out = Files.createTempDirectory("hilw").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    Layout.zorderWrite(li, $"l_partkey", $"l_suppkey", 16, 16, out,
      curve = "hilbert")
    // the sidecar records the curve; frozen keys mint on it
    val m = Layout.readMeta(spark, out)
    assert(m.curve === "hilbert")
    // lossless + both-dimension skipping at least matches the Morton
    // bar (the Hilbert walk has strictly better locality)
    assert(spark.read.parquet(out).count() === li.count())
    val stats = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg(min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"),
        min($"l_suppkey").as("min_s"), max($"l_suppkey").as("max_s"))
      .collect()
    val n = stats.length.toDouble
    val skipP = stats.count(r =>
      r.getLong(2) < 155L || r.getLong(1) > 174L) / n
    val skipS = stats.count(r =>
      r.getLong(4) < 4L || r.getLong(3) > 5L) / n
    assert(skipP >= 0.5, s"hilbert part skip rate $skipP")
    assert(skipS >= 0.5, s"hilbert supp skip rate $skipS")
    // a narrow delta compacts by rewriting FEW files, conserving rows
    // (delta keys mint on the table's recorded curve, so footer
    // ranges stay comparable)
    val delta = li.filter($"l_partkey".between(150, 160))
      .limit(200).withColumn("l_orderkey", $"l_orderkey" + 10000000L)
    val nDelta = delta.count()
    val (rw, un) = Layout.zorderCompact(spark, out, delta,
      $"l_partkey", $"l_suppkey")
    assert(rw >= 1 && un > rw,
      s"expected a delta-local rewrite, got rewritten=$rw untouched=$un")
    assert(spark.read.parquet(out).count() === li.count() + nDelta)
    // legacy meta without a curve field reads back as Morton
    val legacyDir = Files.createTempDirectory("legacy").toString
    Layout.zorderWrite(li.limit(100), $"l_partkey", $"l_suppkey", 16, 2,
      legacyDir)
    val metaFile = new java.io.File(legacyDir, "_zorder_meta.json")
    val txt = new String(java.nio.file.Files.readAllBytes(metaFile.toPath))
    java.nio.file.Files.write(metaFile.toPath,
      txt.replaceAll(""","curve":"\w+"""", "").getBytes)
    // the raw rewrite invalidates Hadoop LocalFS's checksum sidecar
    new java.io.File(legacyDir, "._zorder_meta.json.crc").delete()
    assert(Layout.readMeta(spark, legacyDir).curve === "morton")
  }

  test("zorderWrite edge cases: empty input writes a sentinel; all-null dims fail loudly") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("y", LongType), StructField("v", StringType)))
    // empty input: empty table + zero-extent sidecar, no error
    val out = Files.createTempDirectory("zempty").toString
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Layout.zorderWrite(empty, $"x", $"y", 16, 4, out)
    assert(spark.read.parquet(out).count() === 0L)
    assert(Layout.readMeta(spark, out) === Layout.ZorderMeta(0, 0, 0, 0, 16))
    // withMortonKey on empty input: empty frame out, no raise
    assert(Layout.withMortonKey(empty, $"x", $"y", 16).count() === 0L)
    // non-empty input whose dims are entirely null: loud failure, not
    // a silently-empty table
    val allNull = Seq(("a"), ("b")).toDF("v")
      .withColumn("x", lit(null).cast("long"))
      .withColumn("y", lit(null).cast("long"))
    val e = intercept[IllegalArgumentException] {
      Layout.zorderWrite(allNull, $"x", $"y", 16, 4,
        Files.createTempDirectory("znull").toString)
    }
    assert(e.getMessage.contains("entirely null"))
  }

  test("zorderCompact refuses files with rows but no _zkey stats (legacy layout)") {
    val out = Files.createTempDirectory("zlegacy").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    Layout.zorderWrite(li, $"l_partkey", $"l_suppkey", 16, 4, out)
    // smuggle in a non-graft data file (no _zkey column): compaction
    // must error rather than silently exempt its rows forever
    val alien = Files.createTempDirectory("zalien").toString
    li.limit(10).coalesce(1).write.mode("overwrite").parquet(alien)
    val part = new java.io.File(alien).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(out, "part-alien.parquet"))
    val e = intercept[RuntimeException] {
      Layout.zorderCompact(spark, out, li.limit(5),
        $"l_partkey", $"l_suppkey")
    }
    assert(e.getMessage.contains("no _zkey footer stats"))
  }

  test("zorderCompact plans from footer metadata: data read tracks the delta") {
    // the round-7 defect: range derivation re-keyed EVERY row of the
    // table per compaction. Now ranges come from parquet footer stats
    // of the persisted _zkey (O(files) metadata), so the only row
    // data a compaction reads is the overlapped files + the delta —
    // pinned here by summing executor inputMetrics.recordsRead across
    // the whole compact call and requiring it to stay well under the
    // table's row count.
    val out = Files.createTempDirectory("zmeta").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val isDelta = $"l_partkey".between(150, 160) && $"l_suppkey" <= 2
    val base = li.filter(!isDelta)
    // the delta arrives as its OWN input in production (a day's
    // append) — materialize it so its scans don't re-read lineitem
    val deltaDir = Files.createTempDirectory("zmeta_delta").toString
    li.filter(isDelta).write.mode("overwrite").parquet(deltaDir)
    val delta = spark.read.parquet(deltaDir)
    val baseRows = base.count()
    val deltaRows = delta.count()
    Layout.zorderWrite(base, $"l_partkey", $"l_suppkey", 16, 16, out)

    val recs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          recs.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val (rewritten, _) =
      try Layout.zorderCompact(spark, out, delta, $"l_partkey", $"l_suppkey")
      finally {
        // listener events are async: settle until the counter stops
        var prev = -1L; var n = 0
        while (recs.get != prev && n < 40) {
          prev = recs.get; Thread.sleep(250); n += 1
        }
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(rewritten >= 1)
    // budget: overlapped files (a minority of 16) + the delta read a
    // few times (isEmpty probe, range probe, rewrite). The round-7
    // implementation read >= baseRows on top of that.
    val budget = baseRows / 2 + 4 * deltaRows
    assert(recs.get <= budget,
      s"compaction read ${recs.get} records (budget $budget of " +
        s"$baseRows base rows) — range derivation is scanning the table")
  }

  test("zorderCompact rewrites only the delta's curve region") {
    val out = Files.createTempDirectory("zcompact").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    // hold back a narrow (partkey, suppkey) cell as the late delta —
    // a clustered append, the case incremental compaction exists for
    val isDelta = $"l_partkey".between(150, 160) && $"l_suppkey" <= 2
    val base = li.filter(!isDelta)
    val delta = li.filter(isDelta)
    val nDelta = delta.count()
    assert(nDelta > 0)
    Layout.zorderWrite(base, $"l_partkey", $"l_suppkey", 16, 16, out)

    // the sidecar metadata must round-trip (frozen scale bounds)
    val meta = Layout.readMeta(spark, out)
    assert(meta.bits == 16 && meta.xLo < meta.xHi && meta.yLo < meta.yHi)
    val fsDir = new java.io.File(out)
    def dataFiles() = fsDir.listFiles()
      .filter(f => f.getName.startsWith("part-"))
      .map(f => f.getName -> f.length()).toMap
    val before = dataFiles()

    val (rewritten, untouched) =
      Layout.zorderCompact(spark, out, delta,
        $"l_partkey", $"l_suppkey")
    // the delta occupies one narrow curve cell: a small minority of
    // the 16 files overlaps it
    assert(rewritten >= 1 && rewritten <= 5,
      s"expected a narrow rewrite set, got $rewritten")
    assert(untouched == 16 - rewritten)
    // row conservation: everything exactly once
    assert(spark.read.parquet(out).count() === li.count())
    // untouched files are byte-identical (same name, same length)
    val after = dataFiles()
    val kept = before.keySet.intersect(after.keySet)
    assert(kept.size == untouched)
    kept.foreach(k => assert(before(k) == after(k), s"$k changed size"))
    // the merged region still prunes: a query on the delta's cell
    // skips most files via footer min/max
    val stats = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg(min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"))
      .collect()
    val touched = stats.count(r =>
      !(r.getLong(2) < 150L || r.getLong(1) > 160L))
    assert(touched.toDouble / stats.length <= 0.5,
      s"post-compaction pruning lost: $touched/${stats.length}")
  }

  test("hilbert key is an adjacency-preserving bijection on the full grid") {
    // bits=3 over the complete 8×8 grid (extent 0..7 makes scaleDim
    // the identity): the walk must visit every cell exactly once
    // (bijection onto 0..63) and every consecutive key pair must be
    // GRID-ADJACENT (Manhattan distance 1) — the defining Hilbert
    // property Morton lacks, and the one any transcription error in
    // the 16-level unroll breaks immediately.
    val grid = spark.range(64).select(
      (col("id") / 8).cast("long").as("x"),
      (col("id") % 8).cast("long").as("y"))
    val keyed = graft.operators.Layout
      .withHilbertKey(grid, col("x"), col("y"), bits = 3, keyCol = "hk")
      .select(col("hk"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(keyed.map(_._1).toSeq === (0L until 64L).toSeq, "not a bijection")
    keyed.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Morton on the same grid DOES jump (the property is discriminating,
    // not vacuous): at least one consecutive Morton pair is non-adjacent
    val mort = graft.operators.Layout
      .withMortonKey(grid, col("x"), col("y"), bits = 3, keyCol = "zk")
      .select(col("zk"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val zJumps = mort.sliding(2).count { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1L }
    assert(zJumps > 0, "expected Morton diagonal jumps on the grid")
  }
}
