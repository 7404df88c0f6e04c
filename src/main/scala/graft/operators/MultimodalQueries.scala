package graft.operators

import graft.Q
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BinaryType
  * columns with typed metadata (BASELINE.json north star).
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic fake (features derived from the bytes
  * themselves); everything around it — BinaryType schema, per-batch
  * partitioned processing, frame sampling via generator explode,
  * metadata derivation — is real Spark plumbing, exercised and
  * oracle-checked byte-for-byte (hex round-trips through DuckDB BLOBs).
  *
  * The synthetic payload is unhex(sha256(text)): 32 opaque bytes per
  * document standing in for an encoded image. At 100 TB the payloads
  * are real blobs in the same BinaryType column; the decode stub is
  * replaced by a codec call inside the same mapInPandas/mapPartitions
  * batch shape — the plan does not change.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")

  /** documents + synthetic binary payload column (BinaryType). */
  private def withBlob(df: DataFrame): DataFrame =
    df.withColumn("img", unhex(sha2(col("text"), 256)))

  val queries: Map[String, Q] = Map(

    // ── decode-stub: bytes → typed metadata/features ────────────────
    // width/height from header bytes, mean byte value as the "feature"
    // (DETERMINISTIC FAKE decode — replace with a codec at deploy).
    "mm_decode" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        withBlob(docs(s, dir))
          .withColumn("h", hex($"img")) // 64 hex chars = 32 bytes
          .select(
            $"doc_id",
            length($"img").as("n_bytes"),
            // header-derived fake dimensions
            (expr("CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT)") % 8 + 1)
              .as("width"),
            (expr("CAST(conv(substr(h, 3, 2), 16, 10) AS BIGINT)") % 8 + 1)
              .as("height"),
            // mean byte value ×100 as exact integer (fake feature)
            (expr("""aggregate(transform(sequence(0, 31),
                 i -> CAST(conv(substr(h, 2 * i + 1, 2), 16, 10) AS BIGINT)),
                 0L, (a, v) -> a + v)""") * 100 / 32).cast("long")
              .as("mean_byte_x100"),
            $"h".as("payload_hex"))
          .orderBy($"doc_id")
      },
      oracle = Some("""
        WITH b AS (SELECT doc_id, sha256(text) AS h FROM documents)
        SELECT doc_id,
               octet_length(unhex(h)) AS n_bytes,
               ('0x' || substr(h, 1, 2))::BIGINT % 8 + 1 AS width,
               ('0x' || substr(h, 3, 2))::BIGINT % 8 + 1 AS height,
               CAST(list_sum(list_transform(range(0, 32),
                 i -> ('0x' || substr(h, 2 * i + 1, 2))::BIGINT)) * 100 // 32
                 AS BIGINT) AS mean_byte_x100,
               upper(h) AS payload_hex
        FROM b ORDER BY doc_id"""),
      desc = "binary decode stub: blob → typed metadata + feature"),

    // ── resize: box-filter downsample of the payload ────────────────
    // The image-resize shape: the 32-byte payload is treated as a
    // 1×32 "image" and box-filtered down to 8 blocks, each block the
    // floored mean of its 4 bytes — exactly what a codec's
    // area-average resize does per channel. Per-block rows (like
    // mm_frames) keep the output scalar-typed for the oracle compare.
    "mm_resize" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        withBlob(docs(s, dir))
          .withColumn("h", hex($"img"))
          .select($"doc_id",
            posexplode(expr("""transform(sequence(0, 7), b ->
                (CAST(conv(substr(h, 8 * b + 1, 2), 16, 10) AS BIGINT)
               + CAST(conv(substr(h, 8 * b + 3, 2), 16, 10) AS BIGINT)
               + CAST(conv(substr(h, 8 * b + 5, 2), 16, 10) AS BIGINT)
               + CAST(conv(substr(h, 8 * b + 7, 2), 16, 10) AS BIGINT))
               div 4)"""))
              .as(Seq("block_idx", "px")))
          .orderBy($"doc_id", $"block_idx")
      },
      oracle = Some("""
        WITH b AS (SELECT doc_id, upper(sha256(text)) AS h FROM documents)
        SELECT doc_id, r.b AS block_idx,
               (('0x' || substr(h, 8 * r.b + 1, 2))::BIGINT
              + ('0x' || substr(h, 8 * r.b + 3, 2))::BIGINT
              + ('0x' || substr(h, 8 * r.b + 5, 2))::BIGINT
              + ('0x' || substr(h, 8 * r.b + 7, 2))::BIGINT) // 4 AS px
        FROM b CROSS JOIN range(0, 8) r(b)
        ORDER BY doc_id, block_idx"""),
      desc = "resize: box-filter downsample (floored 4-byte block means)"),

    // ── frame sampling: split payload into fixed-size frames ────────
    // (video frame-sample shape: generator explode over byte ranges).
    "mm_frames" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        withBlob(docs(s, dir))
          .withColumn("h", hex($"img"))
          .select($"doc_id", $"h",
            posexplode(expr(
              "transform(sequence(0, 3), f -> substr(h, f * 16 + 1, 16))"))
              .as(Seq("frame_idx", "frame_hex")))
          .select(
            $"doc_id", $"frame_idx", $"frame_hex",
            // 48-bit frame checksum (12 hex chars — stays in BIGINT)
            expr("CAST(conv(substr(frame_hex, 1, 12), 16, 10) AS BIGINT)")
              .as("frame_checksum"))
          .orderBy($"doc_id", $"frame_idx")
      },
      oracle = Some("""
        WITH b AS (SELECT doc_id, upper(sha256(text)) AS h FROM documents),
        f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_idx, h FROM b)
        SELECT doc_id, frame_idx,
               substr(h, frame_idx * 16 + 1, 16) AS frame_hex,
               ('0x' || substr(h, frame_idx * 16 + 1, 12))::BIGINT
                 AS frame_checksum
        FROM f ORDER BY doc_id, frame_idx"""),
      desc = "frame sampling: binary payload → per-frame rows + checksums")
  )
}
