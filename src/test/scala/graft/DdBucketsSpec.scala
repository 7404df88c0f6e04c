package graft

import org.scalatest.funsuite.AnyFunSuite

/** DdBuckets is the exact-rational boundary table both engines share
  * for stream_ddsketch; its correctness claim is pure number theory,
  * so this spec proves it with BigInt — no floats, no Spark. */
class DdBucketsSpec extends AnyFunSuite {
  import graft.functions.DdBuckets

  test("t_i = floor(21^i / 19^i), contiguous, covering 1..10^12") {
    val b = DdBuckets.bounds
    assert(b.head === ((0L, 0L, 1L)))
    var num = BigInt(1); var den = BigInt(1)
    for (((i, lo, hi), k) <- b.zipWithIndex) {
      assert(i === k.toLong)
      assert(hi === (num / den).toLong, s"t_$i")
      if (k > 0) assert(lo === b(k - 1)._3, s"gap at $i")
      num *= DdBuckets.GammaNum; den *= DdBuckets.GammaDen
    }
    assert(b.last._3 >= 1000000000000L)
    assert(b.size < 300) // planning-scale artifact, broadcast territory
  }

  test("assignment satisfies the DDSketch defining inequality") {
    // idx(v) = ceil(log_γ v): γ^(idx-1) < v ≤ γ^idx, checked in exact
    // integer arithmetic (v·19^i vs 21^i)
    val b = DdBuckets.bounds
    def idxOf(v: Long): Long = b.find(r => v > r._2 && v <= r._3).get._1
    val powsN = Iterator.iterate(BigInt(1))(_ * DdBuckets.GammaNum)
      .take(b.size + 1).toVector
    val powsD = Iterator.iterate(BigInt(1))(_ * DdBuckets.GammaDen)
      .take(b.size + 1).toVector
    val vs = (1L to 2000L) ++ Seq(12345L, 999983L, 123456789L,
      999999999999L)
    for (v <- vs) {
      val i = idxOf(v).toInt
      assert(BigInt(v) * powsD(i) <= powsN(i), s"v=$v upper")
      if (i > 0)
        assert(BigInt(v) * powsD(i - 1) > powsN(i - 1), s"v=$v lower")
    }
  }

  test("exactly one bucket matches any value (empty buckets harmless)") {
    val b = DdBuckets.bounds
    for (v <- 1L to 5000L)
      assert(b.count(r => v > r._2 && v <= r._3) === 1, s"v=$v")
  }
}
