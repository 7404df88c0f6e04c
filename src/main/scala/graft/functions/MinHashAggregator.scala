package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed Aggregator[hash, sig, sig] — the
  * user-facing custom-aggregate rung of the extension ladder (SURVEY
  * §7: "fuzzy dedup: minhash over shingles as an Aggregator").
  *
  * Input: pre-reduced shingle hashes (h % 1000003, as produced by the
  * dedup_minhash pipeline). Buffer: the K running minima of the K
  * affine permutations — constant size, merge = element-wise min, so
  * partial aggregation distributes exactly like min().
  *
  * The SQL formulation in TextQueries (8 min() aggregates) is the
  * plan-optimal form; this Aggregator is the typed-API equivalent for
  * Dataset pipelines and is verified identical in MinHashAggSpec.
  */
class MinHashAggregator(k: Int = 8)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private def a(i: Int): Long = 37L + 101L * i
  private def b(i: Int): Long = 17L + 1009L * i
  private val P = 1000033L

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (a(i) * h + b(i)) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
