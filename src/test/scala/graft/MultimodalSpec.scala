package graft

import graft.multimodal.Multimodal
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Binary-column batch pipeline: schema, partition batching, and that
  * the mapPartitions decode agrees with the expression-based mm_decode
  * query on the shared fields. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("mapPartitions decode pipeline produces typed features") {
    val docs = Sources.table(spark, sf(), "documents")
    val decoded = Multimodal.decodeAssets(
      Multimodal.syntheticAssets(docs).repartition(4))
    val rows = decoded.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(_.n_bytes === 32)) // sha256 payload
    assert(rows.forall(r => r.width >= 1 && r.width <= 8))
    // agrees with the expression-based mm_decode on width/height
    val viaExpr = SparkEntry.queries("mm_decode")(spark, sf())
      .select($"doc_id", $"width", $"height").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      assert(viaExpr(r.doc_id) === (r.width.toLong, r.height.toLong),
        s"doc ${r.doc_id}")
    }
  }
}
