package graft

import org.scalatest.funsuite.AnyFunSuite

/** JpegDecode is gated (mm_decode_jpeg) on DC-only blocks where the
  * IDCT output is closed-form; THIS spec drives the rest of a real
  * baseline decoder with a real test-side entropy encoder: AC
  * run-length coding, byte stuffing, negative DC diffs across
  * blocks, ZRL runs — plus the integer IDCT cross-checked against a
  * double-precision reference, and the malformed classes. */
class JpegSpec extends AnyFunSuite {
  import graft.functions.JpegDecode

  // ── test-side baseline encoder ───────────────────────────────────

  private class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    var stuffed = 0
    def putBit(b: Int): Unit = {
      acc = (acc << 1) | b; n += 1
      if (n == 8) {
        out.write(acc)
        if (acc == 0xff) { out.write(0); stuffed += 1 }
        acc = 0; n = 0
      }
    }
    def put(bits: Int, len: Int): Unit =
      (len - 1 to 0 by -1).foreach(i => putBit((bits >> i) & 1))
    def flush(): Unit = while (n != 0) putBit(1)
  }

  private def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** valid canonical tables: DC = 12 symbols at length 4; AC = all
    * 162 baseline (run,size) symbols at length 8 (code = index). */
  private val acSymbols: Seq[Int] =
    Seq(0x00, 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
  private def acCode(sym: Int): Int = acSymbols.indexOf(sym)

  /** Encode quantized ZIGZAG-order coefficient blocks into a full
    * baseline JPEG (flat q). For `nComp = 3` (YCbCr 4:4:4) the
    * blocks Seq is MCU-interleaved — Y0,Cb0,Cr0,Y1,Cb1,Cr1,… — with
    * per-component DC prediction, all components sharing the tables
    * (exactly what the decoder must untangle). */
  private def encode(blocks: Seq[Array[Int]], w: Int, h: Int,
                     q: Int = 16, nComp: Int = 1,
                     sampling: Int = 0x11,
                     forceTailZrl: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wb(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def seg(marker: Int, body: Seq[Int]): Unit = {
      wb(0xff, marker); wb((body.length + 2) >> 8, (body.length + 2) & 0xff)
      body.foreach(x => out.write(x & 0xff))
    }
    wb(0xff, 0xd8)
    seg(0xdb, Seq(0x00) ++ Seq.fill(64)(q))
    seg(0xc0, Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp) ++
      (1 to nComp).flatMap(ci => Seq(ci, sampling, 0)))
    // DC: 12 symbols, all length 4
    seg(0xc4, Seq(0x00) ++ Seq(0, 0, 0, 12) ++ Seq.fill(12)(0) ++
      (0 to 11))
    // AC: 162 symbols, all length 8
    seg(0xc4, Seq(0x10) ++ Seq(0, 0, 0, 0, 0, 0, 0, 162) ++
      Seq.fill(8)(0) ++ acSymbols)
    seg(0xda, Seq(nComp) ++
      (1 to nComp).flatMap(ci => Seq(ci, 0x00)) ++ Seq(0, 63, 0))
    val bw = new BitWriter
    val preds = new Array[Int](nComp)
    for ((zz, bi) <- blocks.zipWithIndex) {
      val ci = bi % nComp
      val dc = zz(0)
      val diff = dc - preds(ci); preds(ci) = dc
      val s = cat(diff)
      bw.put(s, 4) // DC code = symbol value at length 4
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var k = 1
      while (k < 64) {
        if (zz(k) == 0) {
          // count run of zeros
          var j = k
          while (j < 64 && zz(j) == 0) j += 1
          if (j == 64) {
            // forceTailZrl: close the block with a ZRL instead of EOB
            // — legal iff EXACTLY 16 zeros remain (run k..63), the
            // exact-fit/overrun pair the ZRL bound test drives
            bw.put(acCode(if (forceTailZrl) 0xf0 else 0x00), 8); k = 64
          }
          else {
            var run = j - k
            while (run >= 16) { bw.put(acCode(0xf0), 8); run -= 16 }
            val v = zz(j); val sz = cat(v)
            bw.put(acCode((run << 4) | sz), 8)
            bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
            k = j + 1
          }
        } else {
          val v = zz(k); val sz = cat(v)
          bw.put(acCode(sz), 8) // run 0
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          k += 1
        }
      }
    }
    bw.flush()
    lastStuffed = bw.stuffed
    out.write(bw.out.toByteArray)
    wb(0xff, 0xd9)
    out.toByteArray
  }
  private var lastStuffed = 0

  /** Expected stats by composing JpegDecode.idct over dequantized
    * NATURAL-order blocks — independent of the entropy path. */
  private def expected(blocks: Seq[Array[Int]], w: Int, h: Int,
                       q: Int = 16): (Long, Long, Long) = {
    val bw = (w + 7) / 8
    val img = Array.ofDim[Int](h + 8, bw * 8)
    blocks.zipWithIndex.foreach { case (zz, bi) =>
      val nat = new Array[Long](64)
      for (k <- 0 until 64) nat(JpegDecode.Zigzag(k)) = zz(k).toLong * q
      val blk = JpegDecode.idct(nat)
      val by = bi / bw; val bx = bi % bw
      for (y <- 0 until 8; x <- 0 until 8)
        if (by * 8 + y < h + 8) img(by * 8 + y)(bx * 8 + x) = blk(y * 8 + x)
    }
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) sum += img(y)(x)
    (sum, img(0)(0).toLong, img(h - 1)(w - 1).toLong)
  }

  private def run(b: Array[Byte]): Array[Long] =
    JpegDecode.decode(b).toLongArray()

  private def rndBlock(seed: Int, nAc: Int): Array[Int] = {
    val r = new scala.util.Random(seed)
    val zz = new Array[Int](64)
    zz(0) = r.nextInt(200) - 100
    for (_ <- 0 until nAc) {
      val k = 1 + r.nextInt(63)
      zz(k) = r.nextInt(100) - 50
    }
    zz
  }

  test("multi-block DC prediction with negative diffs is exact") {
    val dcs = Seq(50, 20, 80, 5)
    val blocks = dcs.map { d => val z = new Array[Int](64); z(0) = d; z }
    val b = encode(blocks, 16, 16)
    val d = run(b)
    assert(d(0) === 1L && d(1) === 16L && d(2) === 16L && d(3) === 4L)
    // flat block value = clamp(128 + 2*dc) (q=16 exact closed form;
    // dc=80 -> 288 clamps to 255, exercising the range limit)
    assert(d(5) === 128L + 2 * 50)   // first px, block 0
    assert(d(6) === 128L + 2 * 5)    // last px, block 3
    assert(d(4) === dcs.map(dc => 64L * math.min(255, 128 + 2 * dc)).sum)
  }

  test("AC coefficients, ZRL runs and EOB decode exactly") {
    val zz = new Array[Int](64)
    zz(0) = 30; zz(1) = -12; zz(5) = 7; zz(28) = -3; zz(63) = 2 // forces ZRL
    val b = encode(Seq(zz), 8, 8)
    val d = run(b)
    val (sum, first, last) = expected(Seq(zz), 8, 8)
    assert(d(0) === 1L)
    assert(d(4) === sum && d(5) === first && d(6) === last)
  }

  test("random blocks round-trip; byte stuffing genuinely exercised") {
    var stuffedSeen = 0
    for (seed <- 1 to 30) {
      val blocks = (0 until 4).map(i => rndBlock(seed * 10 + i, 12))
      val b = encode(blocks, 32, 8)
      stuffedSeen += lastStuffed
      val d = run(b)
      val (sum, first, last) = expected(blocks, 32, 8)
      assert(d(0) === 1L, s"seed $seed")
      assert(d(4) === sum && d(5) === first && d(6) === last, s"seed $seed")
    }
    assert(stuffedSeen > 0, "no encoded stream ever needed FF00 stuffing")
  }

  test("integer IDCT tracks the double-precision reference within 1") {
    val r = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val nat = Array.fill(64)((r.nextInt(400) - 200).toLong)
      val fixed = JpegDecode.idct(nat)
      // textbook O(n^4) double IDCT
      val ref = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var acc = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          acc += cu * cv * nat(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        ref(y * 8 + x) = acc / 4 + 128
      }
      for (i <- 0 until 64) {
        val clamped = math.max(0.0, math.min(255.0, ref(i)))
        assert(math.abs(fixed(i) - clamped) <= 1.5,
          s"idx $i fixed=${fixed(i)} ref=$clamped")
      }
    }
  }

  test("color 4:4:4: per-component prediction + fixed-point RGB exact") {
    // 2 MCUs (16x8), interleaved Y,Cb,Cr blocks with AC energy in
    // every channel; expected = idct per plane + ycbcrToRgb per px
    val r = new scala.util.Random(11)
    val mcus = (0 until 2).flatMap(_ => (0 until 3).map(_ =>
      rndBlock(r.nextInt(1 << 30), 6)))
    val b = encode(mcus, 16, 8, nComp = 3)
    val d = JpegDecode.decodeRgb(b).toLongArray()
    assert(d(0) === 1L && d(1) === 16L && d(2) === 8L && d(3) === 2L)
    // recompute planes independently
    def plane(ci: Int): Array[Array[Int]] =
      (0 until 2).map { m =>
        val zz = mcus(m * 3 + ci)
        val nat = new Array[Long](64)
        for (k <- 0 until 64) nat(JpegDecode.Zigzag(k)) = zz(k).toLong * 16
        JpegDecode.idct(nat)
      }.toArray
    val (py, pcb, pcr) = (plane(0), plane(1), plane(2))
    var sr = 0L; var sg = 0L; var sb2 = 0L
    var first = -1L; var last = 0L
    for (y <- 0 until 8; gx <- 0 until 16) {
      val m = gx / 8; val x = gx % 8
      val (rr, gg, bb) = JpegDecode.ycbcrToRgb(
        py(m)(y * 8 + x), pcb(m)(y * 8 + x), pcr(m)(y * 8 + x))
      sr += rr; sg += gg; sb2 += bb
      val packed = rr * 65536 + gg * 256 + bb
      if (first < 0) first = packed
      last = packed
    }
    assert(d(4) === sr && d(5) === sg && d(6) === sb2)
    assert(d(7) === first && d(8) === last)
  }

  test("fixed-point YCbCr->RGB tracks the float formula within 1") {
    for (y <- Seq(0, 60, 128, 200, 255); cb <- Seq(0, 90, 128, 200);
         cr <- Seq(16, 128, 230)) {
      val (r, g, b) = JpegDecode.ycbcrToRgb(y, cb, cr)
      def cl(v: Double) = math.max(0.0, math.min(255.0, v))
      assert(math.abs(r - cl(y + 1.402 * (cr - 128))) <= 1.0)
      assert(math.abs(g - cl(y - 0.344136 * (cb - 128)
        - 0.714136 * (cr - 128))) <= 1.0)
      assert(math.abs(b - cl(y + 1.772 * (cb - 128))) <= 1.0)
    }
  }

  test("chroma subsampling and wrong-arity readouts reject cleanly") {
    val color = encode((0 until 3).map(_ => rndBlock(5, 4)), 8, 8,
      nComp = 3)
    // 4:2:0 sampling byte on the first component: rejected
    val sub = encode((0 until 3).map(_ => rndBlock(5, 4)), 8, 8,
      nComp = 3, sampling = 0x22)
    assert(JpegDecode.decodeRgb(sub).toLongArray()(0) === 0L)
    // gray readout of a color file / color readout of a gray file
    assert(JpegDecode.decode(color).toLongArray()(0) === 0L)
    val gray = encode(Seq(rndBlock(5, 4)), 8, 8)
    assert(JpegDecode.decodeRgb(gray).toLongArray()(0) === 0L)
    // the color gate twin decodes green
    assert(JpegDecode.decodeRgb(color).toLongArray()(0) === 1L)
  }

  test("ZRL tail: exact fit to coefficient 63 decodes; overrun rejects") {
    // last nonzero at 47 -> 16 trailing zeros: a closing ZRL covers
    // indices 48..63 exactly (k lands on 64 — legal, no EOB needed)
    // and must decode identically to the EOB form of the same block
    val fit = new Array[Int](64); fit(0) = 10; fit(47) = 5
    val viaEob = run(encode(Seq(fit), 8, 8))
    val viaZrl = run(encode(Seq(fit), 8, 8, forceTailZrl = true))
    assert(viaZrl(0) === 1L)
    assert(viaZrl.toSeq === viaEob.toSeq)
    // last nonzero at 50 -> 13 trailing zeros: a closing ZRL claims
    // 16, pushing k to 67 > 64 — malformed, must reject (the r15
    // ADVICE silent-exit path: this previously decoded with ok=1)
    val over = new Array[Int](64); over(0) = 10; over(50) = 5
    assert(run(encode(Seq(over), 8, 8, forceTailZrl = true))(0) === 0L)
  }

  test("malformed inputs: ok=0, never a throw") {
    val good = encode(Seq(rndBlock(3, 6)), 8, 8)
    def bad(b: Array[Byte]): Unit = assert(run(b)(0) === 0L)
    bad(good.take(good.length / 2))           // truncated scan
    bad(good.take(good.length - 2))           // missing EOI
    bad { val b = good.clone(); b(3) = 0xc2.toByte; b } // progressive
    bad { val b = good.clone()                // 3-component SOF
          val i = goodIndexOf(good, Array(0xff, 0xc0)); b(i + 9) = 3; b }
    bad(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI only
    bad(Array.emptyByteArray)
  }

  private def goodIndexOf(b: Array[Byte], pat: Array[Int]): Int =
    (0 until b.length - pat.length).find(i =>
      pat.indices.forall(j => (b(i + j) & 0xff) == pat(j))).get
}
