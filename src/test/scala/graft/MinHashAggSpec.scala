package graft

import graft.functions.MinHashAggregator
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** The typed MinHash Aggregator must produce the same signatures as the
  * SQL min()-aggregate formulation used by dedup_minhash. */
class MinHashAggSpec extends SparkSuite {
  import spark.implicits._

  test("Aggregator signatures equal the SQL formulation") {
    val docs = Sources.table(spark, sf(), "documents").limit(50)
    val sh = docs
      .select($"doc_id", split($"text", " ").as("raw"))
      .withColumn("i", explode(expr(
        "sequence(1, CASE WHEN size(raw) >= 3 THEN size(raw) - 2 ELSE 1 END)")))
      .select($"doc_id", expr(
        """CASE WHEN size(raw) >= 3 THEN
             concat_ws(' ', element_at(raw, i),
               element_at(raw, i + 1), element_at(raw, i + 2))
           ELSE concat_ws(' ', raw) END""").as("s"))
      .withColumn("hs", expr(
        "CAST(conv(substring(md5(s), 1, 14), 16, 10) AS BIGINT) % 1000003L"))

    // SQL form: 8 min() aggregates
    val mhAggs = (0 until 8).map(i =>
      min(expr(s"(${37 + 101 * i}L * hs + ${17 + 1009 * i}L) % 1000033L"))
        .as(s"mh$i"))
    val viaSql = sh.groupBy($"doc_id").agg(mhAggs.head, mhAggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toVector).toMap

    // typed form: Aggregator over Dataset[(doc_id, hash)]
    val agg = new MinHashAggregator(8).toColumn
    val viaAgg = sh.select($"doc_id", $"hs").as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sig"))
      .collect()
      .map { case (id, sig) => id -> sig.toVector }.toMap

    assert(viaAgg.keySet === viaSql.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig === viaSql(id), s"doc $id")
    }
  }
}
