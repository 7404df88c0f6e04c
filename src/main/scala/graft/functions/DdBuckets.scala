package graft.functions

/** Exact-INTEGER DDSketch bucket boundaries — the device that makes
  * the quantile sketch's streaming drain hash-gatable without the
  * float-log trap (the repo's documented ban: cross-engine `ln`
  * differs by ulps and can flip `ceil(ln v / ln γ)` on a bucket
  * boundary).
  *
  * γ = (1+α)/(1−α) with α = 0.05 is the RATIONAL 21/19, so the
  * Masson et al. (VLDB 2019) index `idx(v) = ceil(log_γ v)` of an
  * integer cents value is decidable by pure integer comparison:
  * v ≤ γ^i  ⇔  v ≤ floor(21^i / 19^i), and therefore bucket i is
  * exactly the integer interval (t_{i-1}, t_i] with
  * t_i = floor(21^i / 19^i) computed ONCE in BigInt here — no float
  * anywhere on either engine. Both sides consume the SAME
  * precomputed table (the Benford-ppm-constants precedent): Spark as
  * a broadcast static dimension, DuckDB as a rendered VALUES list —
  * the bucket ASSIGNMENT is recomputed independently by each
  * engine's range join.
  *
  * Runs of equal t (γ^i advances by <1 at small i) leave empty
  * buckets — harmless and identical on both engines, and exactly
  * why the table, not per-row arithmetic, is the portable form.
  * Coverage to 10^12 cents (10 billion dollars) is 277 rows — a
  * planning-scale artifact, broadcast/literal territory. */
object DdBuckets {
  final val GammaNum = 21
  final val GammaDen = 19

  /** (idx, lo, hi]: value v (positive cents) lands in the row with
    * lo < v <= hi; idx 0 is v = 1 (and the sgn-0 zero bucket). */
  lazy val bounds: Seq[(Long, Long, Long)] = {
    val cap = BigInt("1000000000000")
    val out = Seq.newBuilder[(Long, Long, Long)]
    var i = 0L
    var num = BigInt(1); var den = BigInt(1)
    var prev = 0L
    var t = 1L
    while (prev < cap.toLong) {
      out += ((i, prev, t))
      prev = t
      i += 1
      num *= GammaNum; den *= GammaDen
      t = (num / den).toLong
    }
    out.result()
  }

  /** DuckDB twin: the same table as a VALUES relation
    * `(bidx, lo, hi)`. */
  def valuesSql: String =
    bounds.map { case (i, lo, hi) => s"($i,$lo,$hi)" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") v(bidx, lo, hi)")
}
