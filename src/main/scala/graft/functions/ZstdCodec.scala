package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Zstandard — the format public LLM corpora actually ship in
  * (`.jsonl.zst` shards), decoded FROM SCRATCH per RFC 8878: this is
  * the capstone of the codec family (gzip/bzip2 from-scratch pairs,
  * LZ4/snappy from-scratch decoders) because zstd stacks every
  * entropy-coding idea the others use one at a time — FSE (tANS)
  * table descriptions, huff0 canonical Huffman with FSE-compressed
  * weights, four interleaved literal streams, three parallel FSE
  * state machines over one BACKWARD bitstream, and a repeat-offset
  * history with the famous `litLength == 0` rotation.
  *
  *  - `zstd_read(bytes)` — full frame decode: magic, frame header
  *    (single-segment and windowed shapes, content size field sizes
  *    0/1/2/4/8 with the +256 bias on the 2-byte form, dictionary
  *    IDs rejected per contract, reserved bits enforced),
  *    raw/RLE/compressed blocks, the literals section in all four
  *    shapes (raw, RLE, Huffman-compressed with 1 or 4 streams,
  *    treeless repeat), Huffman trees from both direct 4-bit weights
  *    and FSE-compressed weights (two alternating states on one
  *    backward stream, implicit last weight completed to a power of
  *    two), sequences under all four symbol-compression modes
  *    (predefined distributions from the RFC, RLE, FSE-described,
  *    repeat), the offset/match/literal extra-bit reads in spec
  *    order, repeat-offset history semantics, window-bounded match
  *    execution across block boundaries, declared-content-size
  *    verification, and the XXH64-low-32 content checksum — the
  *    XXH64 implemented from scratch ([[ZstdCodec.xxh64]]) and
  *    cross-anchored against lz4-java's XXHash64 in ZstdSpec.
  *    CONCATENATED frames decode in order and skippable frames are
  *    skipped (the multi-frame shard layout). Every bitstream must
  *    land EXACTLY on its padding marker — any malformation returns
  *    NULL, never a throw, never a misdecode.
  *  - `zstd_write(bytes)` — the INDEPENDENT compressor: zstd-jni on
  *    Spark's classpath (level 3, content checksum ON), so the gated
  *    round trip (mm_zstd_roundtrip / corpus_zstd_shard) validates
  *    our decoder against the reference implementation's real output
  *    inside the plan — the strongest adversary posture available.
  *
  * Scale note: decode is single-pass, allocation = output + the
  * ≤ 2 KiB FSE/Huffman tables per block family; per-row in a column
  * scan it is embarrassingly parallel. Decompression-bomb guard: any
  * single blob refusing to declare a content size is capped at
  * 256 MiB decoded.
  *
  * Reference re-expressed: push-ai/mta-rtf-dbt has no compression
  * surface (BigQuery SQL models over ingested rows); this extends
  * the corpus shard lifecycle with the format the public corpus
  * releases (RedPajama-class `.jsonl.zst`) actually use. */
object ZstdCodec {

  private final val MAGIC = 0xfd2fb528
  private final val SKIP_BASE = 0x184d2a50
  private final val MAX_OUT = 1 << 28

  // ── XXH64 from scratch ──────────────────────────────────────────
  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  def xxh64(b: Array[Byte], off: Int, len: Int, seed: Long = 0L): Long = {
    var p = off
    val end = off + len
    def round(acc: Long, lane: Long): Long =
      java.lang.Long.rotateLeft(acc + lane * P2, 31) * P1
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (p <= limit) {
        v1 = round(v1, le64(b, p))
        v2 = round(v2, le64(b, p + 8))
        v3 = round(v3, le64(b, p + 16))
        v4 = round(v4, le64(b, p + 24))
        p += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) +
        java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) +
        java.lang.Long.rotateLeft(v4, 18)
      h = (h ^ round(0L, v1)) * P1 + P4
      h = (h ^ round(0L, v2)) * P1 + P4
      h = (h ^ round(0L, v3)) * P1 + P4
      h = (h ^ round(0L, v4)) * P1 + P4
    } else h = seed + P5
    h += len.toLong
    while (p + 8 <= end) {
      h ^= round(0L, le64(b, p))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= end) {
      h ^= (le32(b, p) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      p += 4
    }
    while (p < end) {
      h ^= (b(p) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      p += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  private def hb(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Malformation escape: decode paths throw this privately and
    * read() maps it to NULL. */
  private final class Corrupt extends RuntimeException(null, null,
    false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ── backward bitstream (huffman streams, FSE sequence stream) ──
  private final class Bwd(b: Array[Byte], s: Int, e: Int) {
    if (e <= s) corrupt()
    private val last = b(e - 1) & 0xff
    if (last == 0) corrupt() // missing padding marker
    /** bits remaining; bit i of the stream = (b[s + i/8] >> i%8)&1 */
    var idx: Int = (e - 1 - s) * 8 + hb(last)

    private def bitAt(p: Int): Int =
      if (p < 0) 0
      else (b(s + (p >> 3)) >>> (p & 7)) & 1

    /** Next n bits (MSB = next-to-be-consumed), zero-padded below
      * zero; caller enforces the exact-consumption rule. */
    def peek(n: Int): Int = {
      var v = 0
      var k = n - 1
      while (k >= 0) { v = (v << 1) | bitAt(idx - n + k); k -= 1 }
      v
    }

    def read(n: Int): Int = {
      val v = peek(n)
      idx -= n
      v
    }
  }

  // ── FSE ─────────────────────────────────────────────────────────
  private final class FseTable(val log: Int, val sym: Array[Int],
                               val nbBits: Array[Int],
                               val base: Array[Int])

  /** Forward LSB-first reader for FSE table descriptions. */
  private final class Fwd(b: Array[Byte], var p: Int, val end: Int) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (p >= end) corrupt()
        v |= (((b(p) >>> bit) & 1) << i)
        bit += 1
        if (bit == 8) { bit = 0; p += 1 }
        i += 1
      }
      v
    }
    def rewind1(): Unit = {
      if (bit == 0) { p -= 1; bit = 7 } else bit -= 1
    }
    def align(): Unit = if (bit != 0) { bit = 0; p += 1 }
  }

  /** Parse an FSE distribution (RFC 8878 §4.1.1); returns the built
    * table; advances fw past the (byte-aligned) description. */
  private def readFseTable(fw: Fwd, maxSym: Int, maxLog: Int)
      : FseTable = {
    val log = fw.read(4) + 5
    if (log > maxLog) corrupt()
    val size = 1 << log
    var remaining = size
    val freq = new Array[Int](maxSym + 1)
    var symb = 0
    while (remaining > 0) {
      if (symb > maxSym) corrupt()
      val bits = hb(remaining + 1) + 1
      var v = fw.read(bits)
      val lowMask = (1 << (bits - 1)) - 1
      val threshold = (1 << bits) - 1 - (remaining + 1)
      if ((v & lowMask) < threshold) {
        fw.rewind1()
        v = v & lowMask
      } else if (v > lowMask) v -= threshold
      val proba = v - 1
      freq(symb) = proba
      remaining -= math.abs(proba)
      symb += 1
      if (proba == 0) {
        var rep = fw.read(2)
        while (rep == 3) {
          symb += 3
          if (symb > maxSym + 1) corrupt()
          rep = fw.read(2)
        }
        symb += rep
        if (symb > maxSym + 1) corrupt()
      }
    }
    if (remaining != 0) corrupt()
    fw.align()
    buildFse(freq, symb - 1, log)
  }

  /** Standard FSE decode-table construction (spread step
    * (size>>1)+(size>>3)+3, low-prob cells from the top). */
  private def buildFse(freq: Array[Int], maxUsed: Int, log: Int)
      : FseTable = {
    val size = 1 << log
    val sym = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val base = new Array[Int](size)
    val stateDesc = new Array[Int](maxUsed + 1)
    var highThreshold = size
    var s = 0
    while (s <= maxUsed) {
      if (freq(s) == -1) {
        highThreshold -= 1
        sym(highThreshold) = s
        stateDesc(s) = 1
      } else stateDesc(s) = freq(s)
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s <= maxUsed) {
      var i = 0
      while (i < freq(s)) {
        sym(pos) = s
        do { pos = (pos + step) & mask } while (pos >= highThreshold)
        i += 1
      }
      s += 1
    }
    if (pos != 0) corrupt()
    var u = 0
    while (u < size) {
      val sm = sym(u)
      val next = stateDesc(sm)
      stateDesc(sm) += 1
      val nb = log - hb(next)
      nbBits(u) = nb
      base(u) = (next << nb) - size
      u += 1
    }
    new FseTable(log, sym, nbBits, base)
  }

  /** One-symbol RLE "table" (state machine that always emits s). */
  private def rleTable(s: Int): FseTable =
    new FseTable(0, Array(s), Array(0), Array(0))

  // predefined distributions, RFC 8878 §3.1.1.3.2.2
  private val LL_DEFAULT = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1,
    -1, -1, -1)
  private val ML_DEFAULT = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1,
    -1)
  private val OF_DEFAULT = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  private lazy val llDefault = buildFse(LL_DEFAULT, 35, 6)
  private lazy val mlDefault = buildFse(ML_DEFAULT, 52, 6)
  private lazy val ofDefault = buildFse(OF_DEFAULT, 28, 5)

  // code → (baseline, extra bits), RFC 8878 §3.1.1.3.2.1.1
  private val LL_BASE = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256,
    512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
  private val LL_BITS = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16)
  private val ML_BASE = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99,
    131, 259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539)
  private val ML_BITS = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
    1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ── Huffman (huff0) ─────────────────────────────────────────────
  private final class Huff(val log: Int, val sym: Array[Int],
                           val nb: Array[Int])

  /** Build the single-level decode table from weights (last weight
    * implicit, completed to a power of two). */
  private def buildHuff(weights: Array[Int], n: Int): Huff = {
    // weights(0..n-1) explicit; symbol n gets the implicit weight
    var total = 0L
    var i = 0
    while (i < n) {
      val w = weights(i)
      if (w > 11) corrupt()
      if (w > 0) total += (1L << (w - 1))
      i += 1
    }
    if (total == 0) corrupt()
    // table log = exponent of the power of two STRICTLY greater than
    // the explicit total (the implicit last weight must be >= 1)
    val log = hb(total.toInt) + 1
    if (log > 11) corrupt()
    val rest = (1L << log) - total
    // rest must itself be a power of two (the implicit weight)
    if (rest <= 0 || (rest & (rest - 1)) != 0) corrupt()
    val lastW = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val all = java.util.Arrays.copyOf(weights, n + 1)
    all(n) = lastW
    val size = 1 << log
    val sym = new Array[Int](size)
    val nb = new Array[Int](size)
    // ascending weight from position 0; within a weight, symbol order
    var pos = 0
    var w = 1
    while (w <= log) {
      val span = 1 << (w - 1)
      var s2 = 0
      while (s2 <= n) {
        if (all(s2) == w) {
          var k = 0
          while (k < span) {
            sym(pos) = s2
            nb(pos) = log + 1 - w
            pos += 1
            k += 1
          }
        }
        s2 += 1
      }
      w += 1
    }
    if (pos != size) corrupt()
    new Huff(log, sym, nb)
  }

  /** Huffman tree description (RFC 8878 §4.2.1): direct 4-bit
    * weights or FSE-compressed weights via two alternating states.
    * Returns (table, bytes consumed). */
  private def readHuffTable(b: Array[Byte], off: Int, end: Int)
      : (Huff, Int) = {
    if (off >= end) corrupt()
    val h = b(off) & 0xff
    if (h >= 128) {
      val n = h - 127
      val nbytes = (n + 1) / 2
      if (off + 1 + nbytes > end) corrupt()
      val w = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byte = b(off + 1 + i / 2) & 0xff
        w(i) = if (i % 2 == 0) byte >>> 4 else byte & 0xf
        i += 1
      }
      (buildHuff(w, n), 1 + nbytes)
    } else {
      // FSE-compressed weights: h = compressed size
      if (off + 1 + h > end) corrupt()
      val fw = new Fwd(b, off + 1, off + 1 + h)
      val ft = readFseTable(fw, 255, 6)
      // two interleaved states over one backward stream (the bytes
      // remaining after the table description)
      val bs = new Bwd(b, fw.p, off + 1 + h)
      var s1 = bs.read(ft.log)
      var s2 = bs.read(ft.log)
      if (bs.idx < 0) corrupt()
      val w = new Array[Int](256)
      var n = 0
      def emit(s: Int): Unit = {
        if (n >= 255) corrupt()
        w(n) = ft.sym(s)
        n += 1
      }
      var done = false
      while (!done) {
        emit(s1)
        val nb1 = ft.nbBits(s1)
        val ns1 = ft.base(s1) + bs.read(nb1)
        if (bs.idx < 0) { emit(s2); done = true }
        else {
          s1 = ns1
          emit(s2)
          val nb2 = ft.nbBits(s2)
          val ns2 = ft.base(s2) + bs.read(nb2)
          if (bs.idx < 0) { emit(s1); done = true }
          else s2 = ns2
        }
      }
      (buildHuff(w, n), 1 + h)
    }
  }

  /** Decode `count` literals from one backward Huffman stream. */
  private def huffStream(hf: Huff, b: Array[Byte], s: Int, e: Int,
                         out: Array[Byte], outOff: Int,
                         count: Int): Unit = {
    val bs = new Bwd(b, s, e)
    var i = 0
    while (i < count) {
      val idx = bs.peek(hf.log)
      out(outOff + i) = hf.sym(idx).toByte
      bs.idx -= hf.nb(idx)
      i += 1
    }
    if (bs.idx != 0) corrupt() // must land exactly on the marker
  }

  // ── frame decode ────────────────────────────────────────────────
  /** Decode all concatenated frames; null on any malformation. */
  def read(b: Array[Byte]): Array[Byte] = {
    try {
      val out = new java.io.ByteArrayOutputStream(b.length * 3 + 64)
      var p = 0
      while (p < b.length) {
        if (p + 4 > b.length) corrupt()
        val magic = le32(b, p)
        p += 4
        if ((magic & 0xfffffff0) == SKIP_BASE) {
          if (p + 4 > b.length) corrupt()
          val sz = le32(b, p)
          p += 4
          if (sz < 0 || p + sz > b.length) corrupt()
          p += sz
        } else if (magic == MAGIC) {
          p = frame(b, p, out)
        } else corrupt()
      }
      out.toByteArray
    } catch {
      case _: Corrupt => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  /** Decode one frame starting after the magic; returns the new
    * offset. */
  private def frame(b: Array[Byte], start: Int,
                    out: java.io.ByteArrayOutputStream): Int = {
    var p = start
    if (p >= b.length) corrupt()
    val fhd = b(p) & 0xff
    p += 1
    val fcsFlag = fhd >>> 6
    val singleSegment = (fhd & 0x20) != 0
    if ((fhd & 0x08) != 0) corrupt() // reserved bit
    val checksum = (fhd & 0x04) != 0
    val didSize = Array(0, 1, 2, 4)(fhd & 0x3)
    if (!singleSegment) {
      if (p >= b.length) corrupt()
      p += 1 // window descriptor (bounds enforced per-match below)
    }
    if (didSize > 0) {
      // dictionary ID: unsupported per contract — only ID 0 passes
      if (p + didSize > b.length) corrupt()
      var id = 0L
      var i = 0
      while (i < didSize) { id |= (b(p + i) & 0xffL) << (8 * i)
        i += 1 }
      if (id != 0L) corrupt()
      p += didSize
    }
    val fcsSize =
      if (fcsFlag == 0) { if (singleSegment) 1 else 0 }
      else Array(0, 2, 4, 8)(fcsFlag)
    var declared = -1L
    if (fcsSize > 0) {
      if (p + fcsSize > b.length) corrupt()
      declared = 0L
      var i = 0
      while (i < fcsSize) { declared |= (b(p + i) & 0xffL) << (8 * i)
        i += 1 }
      if (fcsSize == 2) declared += 256L
      if (declared < 0 || declared > MAX_OUT.toLong) corrupt()
      p += fcsSize
    }
    // per-frame decoder state (its buffer IS the frame output)
    val st = new FrameState
    var lastBlock = false
    while (!lastBlock) {
      if (p + 3 > b.length) corrupt()
      val hdr = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16)
      p += 3
      lastBlock = (hdr & 1) != 0
      val btype = (hdr >>> 1) & 3
      val bsize = hdr >>> 3
      btype match {
        case 0 => // raw
          if (p + bsize > b.length) corrupt()
          st.append(b, p, bsize)
          p += bsize
        case 1 => // RLE
          if (p >= b.length || bsize > (1 << 21)) corrupt()
          st.appendRun(b(p), bsize)
          p += 1
        case 2 => // compressed
          if (bsize > (1 << 17) + 3 || p + bsize > b.length) corrupt()
          compressedBlock(b, p, p + bsize, st)
          p += bsize
        case _ => corrupt()
      }
    }
    if (declared >= 0 && st.len.toLong != declared) corrupt()
    if (checksum) {
      if (p + 4 > b.length) corrupt()
      if (le32(b, p) != xxh64(st.buf, 0, st.len).toInt) corrupt()
      p += 4
    }
    out.write(st.buf, 0, st.len)
    p
  }

  /** Cross-block frame state: the frame's whole decoded output (a
    * flat growable buffer — matches back-reference into it, incl.
    * across block boundaries), repeat offsets, repeatable entropy
    * tables. */
  private final class FrameState {
    var buf = new Array[Byte](1 << 16)
    var len = 0
    val rep = Array(1, 4, 8)
    var huff: Huff = _
    var llT: FseTable = _
    var ofT: FseTable = _
    var mlT: FseTable = _

    private def ensure(extra: Int): Unit = {
      if (len + extra > MAX_OUT) corrupt()
      if (len + extra > buf.length) {
        var n = buf.length
        while (n < len + extra) n <<= 1
        buf = java.util.Arrays.copyOf(buf, n)
      }
    }

    def append(b: Array[Byte], off: Int, l: Int): Unit = {
      ensure(l)
      System.arraycopy(b, off, buf, len, l)
      len += l
    }

    def appendRun(v: Byte, l: Int): Unit = {
      ensure(l)
      java.util.Arrays.fill(buf, len, len + l, v)
      len += l
    }

    /** Back-reference copy, overlap-correct (byte-wise). */
    def appendMatch(offset: Int, ml: Int): Unit = {
      if (offset <= 0 || offset > len) corrupt()
      ensure(ml)
      val from = len - offset
      var k = 0
      while (k < ml) { buf(len + k) = buf(from + k); k += 1 }
      len += ml
    }
  }

  /** Literals section + sequences section of one compressed block;
    * appends the regenerated bytes to the frame buffer. */
  private def compressedBlock(b: Array[Byte], s: Int, e: Int,
                              st: FrameState): Unit = {
    if (s >= e) corrupt()
    val t0 = b(s) & 0xff
    val litType = t0 & 3
    val sizeFormat = (t0 >>> 2) & 3
    var lits: Array[Byte] = null
    var p = s
    if (litType == 0 || litType == 1) {
      // raw / RLE literals
      val (regen, hdrLen) = sizeFormat match {
        case 0 | 2 => (t0 >>> 3, 1) // 5-bit (bit2 is part of size)
        case 1 =>
          if (s + 2 > e) corrupt()
          ((t0 >>> 4) | ((b(s + 1) & 0xff) << 4), 2)
        case _ =>
          if (s + 3 > e) corrupt()
          ((t0 >>> 4) | ((b(s + 1) & 0xff) << 4) |
            ((b(s + 2) & 0xff) << 12), 3)
      }
      if (regen > (1 << 20)) corrupt()
      p = s + hdrLen
      if (litType == 0) {
        if (p + regen > e) corrupt()
        lits = java.util.Arrays.copyOfRange(b, p, p + regen)
        p += regen
      } else {
        if (p >= e) corrupt()
        lits = new Array[Byte](regen)
        java.util.Arrays.fill(lits, b(p))
        p += 1
      }
    } else {
      // compressed / treeless literals
      val hdrLen = sizeFormat match {
        case 0 | 1 => 3
        case 2 => 4
        case _ => 5
      }
      if (s + hdrLen > e) corrupt()
      var hv = 0L
      var i = 0
      while (i < hdrLen) { hv |= (b(s + i) & 0xffL) << (8 * i)
        i += 1 }
      val (regen, comp) = sizeFormat match {
        case 0 | 1 =>
          (((hv >>> 4) & 0x3ff).toInt, ((hv >>> 14) & 0x3ff).toInt)
        case 2 =>
          (((hv >>> 4) & 0x3fff).toInt, ((hv >>> 18) & 0x3fff).toInt)
        case _ =>
          (((hv >>> 4) & 0x3ffff).toInt, ((hv >>> 22) & 0x3ffff).toInt)
      }
      val fourStreams = sizeFormat != 0
      p = s + hdrLen
      if (p + comp > e) corrupt()
      val litEnd = p + comp
      if (litType == 2) {
        val (hf, used) = readHuffTable(b, p, litEnd)
        st.huff = hf
        p += used
      } else if (st.huff == null) corrupt() // treeless without a tree
      val hf = st.huff
      lits = new Array[Byte](regen)
      if (!fourStreams) {
        huffStream(hf, b, p, litEnd, lits, 0, regen)
      } else {
        if (p + 6 > litEnd) corrupt()
        val s1 = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        val s2 = (b(p + 2) & 0xff) | ((b(p + 3) & 0xff) << 8)
        val s3 = (b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8)
        p += 6
        val per = (regen + 3) / 4
        val last = regen - 3 * per
        if (last < 0) corrupt()
        val o1 = p
        val o2 = o1 + s1
        val o3 = o2 + s2
        val o4 = o3 + s3
        if (o4 > litEnd) corrupt()
        huffStream(hf, b, o1, o2, lits, 0, per)
        huffStream(hf, b, o2, o3, lits, per, per)
        huffStream(hf, b, o3, o4, lits, 2 * per, per)
        huffStream(hf, b, o4, litEnd, lits, 3 * per, last)
      }
      p = litEnd
    }
    // ── sequences section ──
    if (p >= e) corrupt()
    val b0 = b(p) & 0xff
    p += 1
    var nSeq = 0
    if (b0 == 0) nSeq = 0
    else if (b0 < 128) nSeq = b0
    else if (b0 < 255) {
      if (p >= e) corrupt()
      nSeq = ((b0 - 128) << 8) + (b(p) & 0xff)
      p += 1
    } else {
      if (p + 2 > e) corrupt()
      nSeq = (b(p) & 0xff) + ((b(p + 1) & 0xff) << 8) + 0x7f00
      p += 2
    }
    if (nSeq == 0) {
      if (p != e) corrupt() // block must end after the 0 marker
      st.append(lits, 0, lits.length)
      return
    }
    if (p >= e) corrupt()
    val modes = b(p) & 0xff
    p += 1
    if ((modes & 0x3) != 0) corrupt() // reserved bits
    val fw = new Fwd(b, p, e)
    def tableFor(mode: Int, maxSym: Int, maxLog: Int,
                 default: FseTable, prev: FseTable): FseTable =
      mode match {
        case 0 => default
        case 1 =>
          val sv = fw.read(8)
          fw.align() // RLE descriptor is exactly one byte
          if (sv > maxSym) corrupt()
          rleTable(sv)
        case 2 => readFseTable(fw, maxSym, maxLog)
        case _ =>
          if (prev == null) corrupt()
          prev
      }
    // descriptor order in the block: LL, OF, ML
    val llT = tableFor((modes >>> 6) & 3, 35, 9, llDefault, st.llT)
    val ofT = tableFor((modes >>> 4) & 3, 31, 8, ofDefault, st.ofT)
    val mlT = tableFor((modes >>> 2) & 3, 52, 9, mlDefault, st.mlT)
    st.llT = llT
    st.ofT = ofT
    st.mlT = mlT
    // ── the backward sequence bitstream ──
    val bs = new Bwd(b, fw.p, e)
    var llS = bs.read(llT.log)
    var ofS = bs.read(ofT.log)
    var mlS = bs.read(mlT.log)
    if (bs.idx < 0) corrupt()
    var litPos = 0
    var seq = 0
    while (seq < nSeq) {
      val ofCode = ofT.sym(ofS)
      val mlCode = mlT.sym(mlS)
      val llCode = llT.sym(llS)
      if (ofCode > 31 || mlCode > 52 || llCode > 35) corrupt()
      // extra bits in spec order: offset, match length, lit length
      val ofVal = (1L << ofCode) + bs.read(ofCode)
      val ml = ML_BASE(mlCode) + bs.read(ML_BITS(mlCode))
      val ll = LL_BASE(llCode) + bs.read(LL_BITS(llCode))
      if (bs.idx < 0) corrupt()
      // repeat-offset semantics
      var offset = 0
      if (ofVal > 3) {
        offset = (ofVal - 3).toInt
        st.rep(2) = st.rep(1)
        st.rep(1) = st.rep(0)
        st.rep(0) = offset
      } else {
        val idx0 = ofVal.toInt - 1 + (if (ll == 0) 1 else 0)
        if (idx0 == 0) offset = st.rep(0)
        else if (idx0 == 1) {
          offset = st.rep(1)
          st.rep(1) = st.rep(0)
          st.rep(0) = offset
        } else if (idx0 == 2) {
          offset = st.rep(2)
          st.rep(2) = st.rep(1)
          st.rep(1) = st.rep(0)
          st.rep(0) = offset
        } else {
          offset = st.rep(0) - 1
          if (offset <= 0) corrupt()
          st.rep(2) = st.rep(1)
          st.rep(1) = st.rep(0)
          st.rep(0) = offset
        }
      }
      // execute: literals, then the match
      if (litPos + ll > lits.length) corrupt()
      st.append(lits, litPos, ll)
      litPos += ll
      st.appendMatch(offset, ml)
      seq += 1
      if (seq < nSeq) {
        // state updates in order LL, ML, OF
        llS = llT.base(llS) + bs.read(llT.nbBits(llS))
        mlS = mlT.base(mlS) + bs.read(mlT.nbBits(mlS))
        ofS = ofT.base(ofS) + bs.read(ofT.nbBits(ofS))
        if (bs.idx < 0) corrupt()
      }
    }
    if (bs.idx != 0) corrupt() // exact consumption
    if (litPos < lits.length)
      st.append(lits, litPos, lits.length - litPos)
  }

  /** The independent compressor: zstd-jni, level 3, checksum ON. */
  def write(data: Array[Byte]): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(3)
      ctx.setChecksum(true)
      ctx.compress(data)
    } finally ctx.close()
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zstd_read", exprs => ZstdRead(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zstd_write", exprs => ZstdWrite(exprs.head), "built-in")
  }
}

/** `zstd_read(bytes)` — from-scratch RFC 8878 decoder; NULL on any
  * malformation. See [[ZstdCodec]]. */
case class ZstdRead(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("zstd_read requires a BINARY input, got " +
          child.dataType.simpleString)
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zstd_read"

  override def nullSafeEval(bytes: Any): Any =
    ZstdCodec.read(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.ZstdCodec.read($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ZstdRead = copy(child = newChild)
}

/** `zstd_write(bytes)` — one zstd frame via the classpath zstd-jni
  * compressor (level 3, content checksum on). See [[ZstdCodec]]. */
case class ZstdWrite(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("zstd_write requires a BINARY input, got " +
          child.dataType.simpleString)
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def prettyName: String = "zstd_write"

  override def nullSafeEval(bytes: Any): Any =
    ZstdCodec.write(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.ZstdCodec.write($b);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ZstdWrite = copy(child = newChild)
}
