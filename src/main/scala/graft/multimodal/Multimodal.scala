package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal batch-processing plumbing: opaque binary payloads plus
  * typed metadata, decoded per-partition in batches — the Scala analog
  * of the mapInPandas shape (Iterator-of-batches in, Iterator out),
  * which is how a codec (image decode, audio resample, video frame
  * extraction) plugs into the engine at scale.
  *
  * The container ships no codecs, so `decodeStub` is a DETERMINISTIC
  * FAKE computing "features" from the bytes themselves; swapping in a
  * real codec changes only the function body — partitioning, schema,
  * and batch shape stay identical.
  */
object Multimodal {

  case class RawAsset(doc_id: Long, payload: Array[Byte])
  case class DecodedAsset(doc_id: Long, n_bytes: Int, width: Int,
                          height: Int, mean_byte: Double, checksum: Long)

  /** DETERMINISTIC FAKE decode — stands in for an image codec. */
  def decodeStub(a: RawAsset): DecodedAsset = {
    val b = a.payload
    val mean =
      if (b.isEmpty) 0.0
      else b.map(x => (x & 0xff).toLong).sum.toDouble / b.length
    val crc = new java.util.zip.CRC32
    crc.update(b)
    DecodedAsset(a.doc_id, b.length,
      width = (if (b.nonEmpty) (b(0) & 0xff) % 8 else 0) + 1,
      height = (if (b.length > 1) (b(1) & 0xff) % 8 else 0) + 1,
      mean_byte = mean, checksum = crc.getValue)
  }

  /** Batch decode over partitions: one iterator per partition, codec
    * state (here: none; in production a decoder handle) initialized
    * once per partition, rows streamed through. */
  def decodeAssets(assets: Dataset[RawAsset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init site (codec/library handle goes here)
      it.map(decodeStub)
    }
  }

  /** documents → synthetic binary assets (payload = sha256 bytes). */
  def syntheticAssets(docs: DataFrame): Dataset[RawAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), unhex(sha2(col("text"), 256)).as("payload"))
      .as[RawAsset]
  }
}
