package graft

import org.scalatest.funsuite.AnyFunSuite

/** AdpcmDecode beyond the gate's zero-nibble closed form: arbitrary
  * nibble streams (sign bits, full-magnitude reconstruction, clamps,
  * index walks to both rails), multi-block state resets, and the
  * reject classes — checked against an independent in-spec replica
  * of the IMA state machine. */
class AdpcmSpec extends AnyFunSuite {
  import graft.functions.AdpcmDecode

  // independent replica (same published algorithm, written fresh)
  private def ref(pred0: Int, idx0: Int, nibbles: Seq[Int]): Seq[Int] = {
    var pred = pred0; var idx = idx0
    val idxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    pred0 +: nibbles.map { n =>
      val st = AdpcmDecode.Steps(idx)
      var d = st >> 3
      if ((n & 1) != 0) d += st >> 2
      if ((n & 2) != 0) d += st >> 1
      if ((n & 4) != 0) d += st
      pred = if ((n & 8) != 0) pred - d else pred + d
      pred = math.max(-32768, math.min(32767, pred))
      idx = math.max(0, math.min(88, idx + idxAdj(n & 7)))
      pred
    }
  }

  private def wav(blocks: Seq[(Int, Int, Seq[Int])],
                  blockAlign: Int = 12, channels: Int = 1,
                  tag: Int = 0x11): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = out.write(s.getBytes)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    val spb = 1 + 2 * (blockAlign - 4)
    val dataLen = blocks.length * blockAlign
    cc("RIFF"); u32(4 + 28 + 8 + dataLen); cc("WAVE")
    cc("fmt "); u32(20); u16(tag); u16(channels); u32(8000); u32(4000)
    u16(blockAlign); u16(4); u16(2); u16(spb)
    cc("data"); u32(dataLen)
    for ((pred, idx, nibs) <- blocks) {
      u16(pred & 0xffff); out.write(idx); out.write(0)
      nibs.grouped(2).foreach { pair =>
        out.write((pair.head & 0x0f) | ((pair.lift(1).getOrElse(0) & 0x0f) << 4))
      }
    }
    out.toByteArray
  }

  private def run(b: Array[Byte]): Array[Long] =
    AdpcmDecode.decode(b).toLongArray()

  test("arbitrary nibble streams match the reference state machine") {
    val r = new scala.util.Random(3)
    for (seed <- 1 to 10) {
      val pred0 = r.nextInt(20000) - 10000
      val idx0 = r.nextInt(89)
      val nibs = Seq.fill(16)(r.nextInt(16))
      val d = run(wav(Seq((pred0, idx0, nibs))))
      val expect = ref(pred0, idx0, nibs)
      assert(d(0) === 1L, s"seed $seed")
      assert(d(4) === 17L)
      assert(d(5) === expect.map(_.toLong).sum, s"seed $seed")
      assert(d(6) === expect.head.toLong && d(7) === expect.last.toLong)
    }
  }

  test("clamps at both rails and index rails are exact") {
    // max-magnitude positive nibbles from the top step: clamps +32767
    val up = ref(30000, 88, Seq.fill(6)(7))
    val d = run(wav(Seq((30000, 88, Seq.fill(16)(7)))))
    assert(d(0) === 1L && up.max === 32767)
    // max-magnitude negative from the bottom: index pinned at 0
    val down = ref(-30000, 0, Seq.fill(16)(15))
    val d2 = run(wav(Seq((-30000, 0, Seq.fill(16)(15)))))
    assert(d2(0) === 1L && d2(7) === down.last.toLong)
  }

  test("multi-block: per-block header state resets, totals accumulate") {
    val b1 = (1000, 10, Seq.fill(16)(5))
    val b2 = (-2000, 30, Seq.fill(16)(12))
    val d = run(wav(Seq(b1, b2)))
    val e1 = ref(b1._1, b1._2, b1._3)
    val e2 = ref(b2._1, b2._2, b2._3)
    assert(d(0) === 1L && d(3) === 2L && d(4) === 34L)
    assert(d(5) === (e1 ++ e2).map(_.toLong).sum)
    assert(d(6) === e1.head.toLong && d(7) === e2.last.toLong)
  }

  test("negative predictor round-trips through int16le") {
    val d = run(wav(Seq((-12345, 0, Seq.fill(16)(0)))))
    assert(d(0) === 1L && d(6) === -12345L)
  }

  test("reject classes: ok=0, never a throw") {
    def bad(b: Array[Byte]): Unit = assert(run(b)(0) === 0L)
    bad(wav(Seq((0, 0, Seq.fill(16)(0))), channels = 2)) // stereo
    bad(wav(Seq((0, 0, Seq.fill(16)(0))), tag = 0x01))   // PCM tag
    bad(wav(Seq((0, 89, Seq.fill(16)(0)))))              // index > 88
    bad { val b = wav(Seq((0, 0, Seq.fill(16)(0))))      // ragged data
          val i = new String(b, "ISO-8859-1").indexOf("data") + 4
          b(i) = (b(i) - 1).toByte; b }
    bad(wav(Seq.empty))                                  // no samples
    bad(Array.emptyByteArray)
  }
}
