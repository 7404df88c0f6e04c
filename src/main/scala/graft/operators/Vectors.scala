package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public DataFrame-level similarity-search API over an embedding
  * column (`ARRAY<FLOAT>`/`ARRAY<DOUBLE>`) — the switchover surface
  * for ANN on a user's own table.
  *
  * Determinism contract (same as the oracle-checked queries): vectors
  * quantize ONCE per row to 1e5-scaled integer arrays, dot products
  * are exact integer folds via the codegen'd `long_dot`, and the
  * final cosine is a single double division — so scores are identical
  * across partitionings, retries, and cluster sizes.
  */
object Vectors {

  /** Add quantized vector (`sv ARRAY<BIGINT>`) + scaled norm (`nrm`)
    * columns; registers `long_dot` in the session. */
  def quantize(df: DataFrame, embeddingCol: String = "embedding"): DataFrame = {
    graft.functions.LongArrayDot.register(df.sparkSession)
    df.withColumn("sv", expr(
        s"transform(CAST($embeddingCol AS ARRAY<DOUBLE>), x -> CAST(round(x * 100000.0) AS BIGINT))"))
      .withColumn("nrm", expr("long_dot(sv, sv)"))
  }

  private def cosine = expr("long_dot(qv, cv)").cast("double") /
    sqrt(col("qn").cast("double") * col("cn").cast("double"))

  /** Exact cosine top-k: broadcast the (small) query set, scan
    * candidates once. `queries`/`candidates` must both carry
    * (id, sv, nrm) — produce them with [[quantize]]. */
  def knnBrute(queries: DataFrame, candidates: DataFrame,
               k: Int = 5): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("sv").as("qv"),
      col("nrm").as("qn"))
    val c = candidates.select(col("id").as("cand_id"), col("sv").as("cv"),
      col("nrm").as("cn"))
    c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cosine", cosine)
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
  }

  /** IVF ANN: k-cell coarse quantizer from per-`labelCol` centroids,
    * every vector assigned to its best cell, queries probe their
    * `nprobe` nearest cells. `base` must carry (id, sv, nrm,
    * labelCol); `queryFilter` selects the query rows. */
  def ivfSearch(base: DataFrame, queryFilter: org.apache.spark.sql.Column,
                labelCol: String = "label", k: Int = 3,
                nprobe: Int = 1): DataFrame = {
    val cent = base
      .select(col(labelCol).as("c_label"), posexplode(col("sv")).as(Seq("d", "v")))
      .groupBy(col("c_label"), col("d"))
      .agg(sum(col("v")).as("sv_sum"), count(lit(1)).as("n"))
      .withColumn("cv", round(col("sv_sum").cast("double") / col("n")).cast("long"))
      .groupBy(col("c_label"))
      .agg(expr("transform(sort_array(collect_list(struct(d, cv))), x -> x.cv)")
        .as("cvec"))
      .withColumn("cnrm", expr("long_dot(cvec, cvec)"))
    val asg = graft.Engine.materialize(
      base.crossJoin(broadcast(cent))
        .withColumn("score", expr("long_dot(sv, cvec)").cast("double") /
          sqrt(col("nrm").cast("double") * col("cnrm").cast("double")))
        .withColumn("rn", row_number().over(Window.partitionBy(col("id"))
          .orderBy(col("score").desc, col("c_label").asc)))
        .filter(col("rn") <= nprobe)
        .select(col("id"), col("sv"), col("nrm"), col("c_label").as("cluster"),
          col("rn")),
      key = "cluster", name = "vectors_ivf_assign")
    val c = asg.filter(col("rn") === 1)
      .select(col("id").as("cand_id"), col("sv").as("cv"),
        col("nrm").as("cn"), col("cluster"))
    val q = asg.filter(queryFilter)
      .select(col("id").as("query_id"), col("sv").as("qv"),
        col("nrm").as("qn"), col("cluster"))
    q.join(c, Seq("cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", cosine)
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cluster"),
        col("cosine"))
  }
}
