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
}
