package graft.operators

import graft.Q
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], 64-d)
  * — the ANN extension surface (BASELINE.json north star).
  *
  * Numeric determinism: float sums are order-dependent, so every dot
  * product / norm is computed as a sum of per-element products rounded
  * to scaled BIGINTs (exact, order-insensitive); the final cosine is a
  * single double division — bit-identical across engines. This is the
  * engine's *definition* of cosine (precision 1e-9 per element —
  * far below any ranking-relevant delta).
  *
  * Scale notes: brute-force kNN broadcasts the (small) query set and
  * scans candidates once — the right plan when queries are few. The
  * sign-LSH variant is the scale path: per-vector signatures are a
  * linear scan; candidate generation is an equi-join on (band, value)
  * buckets, never all-pairs. At 100 TB: signatures materialize as a
  * bucketed table keyed by band value; multi-probe on adjacent buckets
  * recovers recall.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))

  /** Scaled-int dot product of two double arrays (exact, portable). */
  private val dotExpr: (String, String) => String = (a, b) =>
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(round(x * y * 1000000000.0) AS BIGINT)), 0L, (acc, v) -> acc + v)"

  private val normExpr: String => String = a => dotExpr(a, a)

  private val duckDot: (String, String) => String = (a, b) =>
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(round(x[1] * x[2] * 1000000000.0) AS BIGINT)))"

  val queries: Map[String, Q] = Map(

    // ── brute-force cosine top-k (baseline ANN) ─────────────────────
    "knn_brute" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = emb(s, dir)
        val q = base.filter($"vec_id" < 10)
          .select($"vec_id".as("query_id"), $"e".as("qe"))
        val c = base.select($"vec_id".as("cand_id"), $"e".as("ce"))
        val scored = q.join(broadcast(c), $"query_id" =!= $"cand_id")
          .withColumn("dot", expr(dotExpr("qe", "ce")))
          .withColumn("qn", expr(normExpr("qe")))
          .withColumn("cn", expr(normExpr("ce")))
          .withColumn("cosine", $"dot".cast("double") /
            sqrt($"qn".cast("double") * $"cn".cast("double")))
        scored
          .withColumn("rank", row_number().over(Window.partitionBy($"query_id")
            .orderBy($"cosine".desc, $"cand_id")))
          .filter($"rank" <= 5)
          .select($"query_id", $"rank", $"cand_id", $"cosine")
          .orderBy($"query_id", $"rank")
      },
      oracle = Some(s"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
                      FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 CAST(${duckDot("q.e", "c.e")} AS DOUBLE)
                   / sqrt(CAST(${duckDot("q.e", "q.e")} AS DOUBLE)
                          * CAST(${duckDot("c.e", "c.e")} AS DOUBLE)) AS cosine
          FROM base q JOIN base c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 10),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS rank
          FROM scored)
        SELECT query_id, rank, cand_id, cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""),
      desc = "brute-force cosine top-k (broadcast query set, exact arithmetic)"),

    // ── sign-LSH (random hyperplane) bucketed ANN ───────────────────
    // 16 pseudo-random hyperplanes from integer arithmetic → 16-bit
    // signature → 4 bands of 4 bits → candidates share a band value.
    "knn_lsh" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = emb(s, dir)
        // per (vec, plane): sign of scaled-int dot with hyperplane
        val dims = base.select($"vec_id", posexplode($"e").as(Seq("d", "v")))
          .withColumn("k", explode(sequence(lit(0), lit(15))))
          .withColumn("hp",
            expr("((1 + (k * 64 + d) * 2654435761) % 1000003) - 500001"))
          .withColumn("term",
            expr("CAST(round(v * 1000000.0) AS BIGINT) * hp"))
        val sig = dims.groupBy($"vec_id", $"k")
          .agg(sum($"term").as("s"))
          .groupBy($"vec_id")
          .agg(sum(when($"s" > 0, expr("shiftleft(CAST(1 AS BIGINT), k)"))
            .otherwise(0L)).as("sig"))
        val banded = sig.select($"vec_id", explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"), expr(s"(sig >> ${4 * b}) & 15").as("bv"))): _*))
          .as("bk"))
          .select($"vec_id", $"bk.band", $"bk.bv")
        val qb = banded.filter($"vec_id" < 10)
          .select($"vec_id".as("query_id"), $"band", $"bv")
        val cands = qb.join(banded.select($"vec_id".as("cand_id"), $"band", $"bv"),
            Seq("band", "bv"))
          .filter($"query_id" =!= $"cand_id")
          .select($"query_id", $"cand_id").distinct()
        val withVec = cands
          .join(base.select($"vec_id".as("query_id"), $"e".as("qe")), Seq("query_id"))
          .join(base.select($"vec_id".as("cand_id"), $"e".as("ce")), Seq("cand_id"))
          .withColumn("cosine", expr(dotExpr("qe", "ce")).cast("double") /
            sqrt(expr(normExpr("qe")).cast("double") *
                 expr(normExpr("ce")).cast("double")))
        withVec
          .withColumn("rank", row_number().over(Window.partitionBy($"query_id")
            .orderBy($"cosine".desc, $"cand_id")))
          .filter($"rank" <= 5)
          .select($"query_id", $"rank", $"cand_id", $"cosine")
          .orderBy($"query_id", $"rank")
      },
      oracle = Some(s"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
                      FROM embeddings),
        dims AS (
          SELECT vec_id, r.i - 1 AS d, e[r.i] AS v, k.k AS k
          FROM base CROSS JOIN range(1, 65) r(i) CROSS JOIN range(0, 16) k(k)),
        terms AS (
          SELECT vec_id, k,
            CAST(round(v * 1000000.0) AS BIGINT)
              * (((1 + (k * 64 + d) * 2654435761) % 1000003) - 500001) AS term
          FROM dims),
        sums AS (SELECT vec_id, k, sum(term) AS s FROM terms GROUP BY 1, 2),
        sig AS (
          SELECT vec_id, sum(CASE WHEN s > 0
            THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS sig
          FROM sums GROUP BY 1),
        banded AS (
          ${(0 until 4).map(b =>
            s"SELECT vec_id, $b AS band, (sig >> ${4 * b}) & 15 AS bv FROM sig")
            .mkString("\nUNION ALL\n")}),
        cands AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
          FROM banded q JOIN banded c ON q.band = c.band AND q.bv = c.bv
          WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        scored AS (
          SELECT cands.query_id, cands.cand_id,
                 CAST(${duckDot("qv.e", "cv.e")} AS DOUBLE)
                   / sqrt(CAST(${duckDot("qv.e", "qv.e")} AS DOUBLE)
                          * CAST(${duckDot("cv.e", "cv.e")} AS DOUBLE)) AS cosine
          FROM cands
          JOIN base qv ON qv.vec_id = cands.query_id
          JOIN base cv ON cv.vec_id = cands.cand_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS rank
          FROM scored)
        SELECT query_id, rank, cand_id, cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""),
      desc = "sign-LSH bucketed ANN: signature bands → candidate join → rank"),

    // ── embedding-cosine near-duplicate pairs ───────────────────────
    "dedup_embedding" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = emb(s, dir)
        val a = base.select($"vec_id".as("id_a"), $"e".as("ea"))
        val b = base.select($"vec_id".as("id_b"), $"e".as("eb"))
        a.join(b, $"id_a" < $"id_b")
          .withColumn("cosine", expr(dotExpr("ea", "eb")).cast("double") /
            sqrt(expr(normExpr("ea")).cast("double") *
                 expr(normExpr("eb")).cast("double")))
          .filter($"cosine" >= 0.4)
          .select($"id_a", $"id_b", $"cosine")
          .orderBy($"id_a", $"id_b")
      },
      oracle = Some(s"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
                      FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(${duckDot("a.e", "b.e")} AS DOUBLE)
                 / sqrt(CAST(${duckDot("a.e", "a.e")} AS DOUBLE)
                        * CAST(${duckDot("b.e", "b.e")} AS DOUBLE)) AS cosine
        FROM base a JOIN base b ON a.vec_id < b.vec_id
        WHERE CAST(${duckDot("a.e", "b.e")} AS DOUBLE)
                / sqrt(CAST(${duckDot("a.e", "a.e")} AS DOUBLE)
                       * CAST(${duckDot("b.e", "b.e")} AS DOUBLE)) >= 0.4
        ORDER BY id_a, id_b"""),
      desc = "embedding-cosine near-dup pairs (threshold 0.4)"),

    // ── per-label centroid + assignment (IVF building block) ────────
    "vector_centroids" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        // exact scaled-int mean per dimension per label
        emb(s, dir)
          .select($"label", posexplode($"e").as(Seq("d", "v")))
          .groupBy($"label", $"d")
          .agg(sum(expr("CAST(round(v * 1000000000.0) AS BIGINT)")).as("sv"),
               count(lit(1)).as("n"))
          .select($"label", $"d",
            ($"sv".cast("double") / ($"n" * 1000000000.0d)).as("centroid_v"))
          .filter($"d" < 8)
          .orderBy($"label", $"d")
      },
      oracle = Some("""
        WITH dims AS (
          SELECT label, r.i - 1 AS d,
                 CAST(round(embedding[r.i]::DOUBLE * 1000000000.0) AS BIGINT) AS sv
          FROM embeddings CROSS JOIN range(1, 65) r(i))
        SELECT label, d,
               CAST(sum(sv) AS DOUBLE) / (count(*) * 1000000000.0) AS centroid_v
        FROM dims WHERE d < 8
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      desc = "per-label centroids (IVF coarse-quantizer building block)")
  )
}
