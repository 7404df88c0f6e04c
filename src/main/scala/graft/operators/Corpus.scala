package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public DataFrame-level corpus-pipeline API — the switchover surface
  * for the LLM-training-data operators, decoupled from the test-table
  * registry: every function takes any DataFrame with the documented
  * columns and returns a DataFrame, so a user can point the pipeline
  * at their own corpus.
  *
  * Expected document schema: `doc_id BIGINT, text STRING` (plus any
  * carry-through columns). All hashing is md5-prefix arithmetic —
  * deterministic across engines, partitionings, and retries, which is
  * the property that makes every step reproducible at 100 TB.
  */
object Corpus {

  /** MinHash+LSH near-duplicate pairs (`doc_a < doc_b`, jaccard ≥
    * `minJaccard`): shingle → 8 minhashes → 4 bands of 2 →
    * band-bucket equi-join → exact Jaccard verify. Candidates only
    * ever meet inside equal band buckets — no all-pairs. */
  def minhashPairs(docs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val base = docs.select(col("doc_id"),
      split(col("text"), " ").as("raw"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val sh = base
      .withColumn("i", explode(expr(
        "sequence(1, CASE WHEN size(raw) >= 3 THEN size(raw) - 2 ELSE 1 END)")))
      .select(col("doc_id"), expr(
        """CASE WHEN size(raw) >= 3 THEN
             concat_ws(' ', element_at(raw, i),
               element_at(raw, i + 1), element_at(raw, i + 2))
           ELSE concat_ws(' ', raw) END""").as("s"))
      .withColumn("hs", expr(
        "CAST(conv(substring(md5(s), 1, 14), 16, 10) AS BIGINT) % 1000003L"))
    val mhAggs = (0 until 8).map(i =>
      min(expr(s"(${37 + 101 * i}L * hs + ${17 + 1009 * i}L) % 1000033L"))
        .as(s"mh$i"))
    val mh = sh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
      .join(base.select(col("doc_id"), col("toks")), Seq("doc_id"))
    val sig = mh.select(col("doc_id"), col("toks"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), col(s"mh${2 * b}").as("k1"),
               col(s"mh${2 * b + 1}").as("k2"))): _*)).as("bk"))
      .select(col("doc_id"), col("toks"), col("bk.band"), col("bk.k1"),
        col("bk.k2"))
    val a = sig.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
      col("band"), col("k1"), col("k2"))
    val b = sig.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
      col("band"), col("k1"), col("k2"))
    a.join(b, Seq("band", "k1", "k2"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("toks_a"), col("toks_b"))
      .distinct()
      .withColumn("jaccard", try_divide(
        size(array_intersect(col("toks_a"), col("toks_b"))),
        size(array_distinct(concat(col("toks_a"), col("toks_b"))))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Star edges for exact duplicates of a canonical key: every doc in
    * a key group links to the group's min doc_id. `canonical` defaults
    * to the sorted-distinct-token normal form. */
  def exactDupEdges(docs: DataFrame,
      canonical: Column = concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " "))))): DataFrame =
    docs
      .withColumn("key", sha2(canonical, 256))
      .withColumn("keep",
        min(col("doc_id")).over(Window.partitionBy(col("key"))))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("keep").as("src"), col("doc_id").as("dst"))

  /** Connected components over undirected edges (`src`, `dst`) via
    * iterative min-label propagation (Pregel form — converges in
    * graph-diameter rounds; each round's labels materialize through
    * Engine.materialize so lineage stays bounded). Returns
    * (doc_id, component_id = min doc_id reachable). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e0 = edges.select(col("src"), col("dst")).distinct()
    val und = graft.Engine.materialize(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(),
      key = "src", name = "corpus_cc_edges")
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val nbrMin = und
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("comp")).as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") =!= col("o.comp")).limit(1).count() > 0
      labels = next
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("comp").as("component_id"))
  }

  /** Dedup clustering end-to-end: exact-dup star edges ∪ minhash
    * near-dup pairs → components. */
  def dedupComponents(docs: DataFrame): DataFrame =
    connectedComponents(
      exactDupEdges(docs).union(
        minhashPairs(docs)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))))

  /** Deterministic per-stratum sampling: keep a doc iff
    * md5(doc_id) % 100 < rate(stratum). `rates` maps stratum value →
    * percentage; `default` applies to unlisted strata. */
  def stratifiedSample(docs: DataFrame, stratum: Column,
                       rates: Map[String, Long],
                       default: Long = 10L): DataFrame = {
    val h = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT) % 100")
    val rate = rates.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    docs.filter(h < rate)
  }

  /** Quality signals + first-failing-rule cascade (C4/Gopher shape).
    * Adds n_tokens, top_tok_count, repetition_ratio, keep,
    * drop_reason to the input rows. */
  def qualityFilter(docs: DataFrame, minChars: Long = 100L,
                    minTokens: Long = 18L,
                    maxRepetition: Double = 0.125): DataFrame = {
    val stats = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_tok_count"))
    docs.join(stats, Seq("doc_id"))
      .withColumn("repetition_ratio",
        try_divide(col("top_tok_count"), col("n_tokens")))
      .withColumn("drop_reason",
        when(length(col("text")) < minChars, "too_short")
          .when(col("n_tokens") < minTokens, "too_few_tokens")
          .when(col("repetition_ratio") > maxRepetition, "repetitive")
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
  }
}
