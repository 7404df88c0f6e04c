package graft

import org.scalatest.funsuite.AnyFunSuite

/** AviFrames' container-walk edges beyond the gate's synthesized
  * shape: interleaved audio, rec groups, idx1, odd/even padding
  * mixes, frames outside movi, and the malformed classes (null, not
  * a partial frame list). */
class AviSpec extends AnyFunSuite {
  import graft.functions.AviFrames

  private class B {
    val out = new java.io.ByteArrayOutputStream()
    def fourCC(s: String): Unit = out.write(s.getBytes)
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def chunk(id: String, data: Array[Byte]): Unit = {
      fourCC(id); u32(data.length); out.write(data)
      if (data.length % 2 == 1) out.write(0) // real padding rule
    }
    def list(form: String)(body: B => Unit): Unit = {
      val inner = new B
      inner.fourCC(form); body(inner)
      chunk("LIST", inner.out.toByteArray)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def avi(body: B => Unit): Array[Byte] = {
    val inner = new B
    inner.fourCC("AVI ")
    body(inner)
    val outer = new B
    outer.fourCC("RIFF"); outer.u32(inner.out.size)
    outer.out.write(inner.out.toByteArray)
    outer.bytes
  }

  private def frames(b: Array[Byte]): Seq[Array[Byte]] = {
    val a = AviFrames.frames(b)
    if (a == null) null
    else (0 until a.numElements()).map(a.getBinary)
  }

  test("interleaved audio/video with odd and even payloads, in order") {
    val f0 = Array[Byte](1, 2, 3)        // odd -> padded
    val f1 = Array[Byte](4, 5, 6, 7)     // even
    val f2 = Array[Byte](8)
    val b = avi { r =>
      r.list("hdrl") { h => h.chunk("avih", new Array[Byte](56)) }
      r.list("movi") { m =>
        m.chunk("00dc", f0)
        m.chunk("01wb", Array[Byte](9, 9, 9, 9, 9)) // audio: skipped
        m.chunk("00db", f1)                          // uncompressed: kept
        m.chunk("JUNK", Array[Byte](0, 0))
        m.chunk("00dc", f2)
      }
      r.chunk("idx1", new Array[Byte](16))
    }
    val fs = frames(b)
    assert(fs.length === 3)
    assert(fs(0).toSeq === f0.toSeq)
    assert(fs(1).toSeq === f1.toSeq)
    assert(fs(2).toSeq === f2.toSeq)
  }

  test("rec groups inside movi are descended; dc chunks outside movi are not frames") {
    val f0 = Array[Byte](1, 1)
    val b = avi { r =>
      r.list("hdrl") { h =>
        h.chunk("avih", new Array[Byte](56))
        h.chunk("00dc", Array[Byte](7, 7)) // NOT under movi: ignored
      }
      r.list("movi") { m =>
        m.list("rec ") { g => g.chunk("00dc", f0) }
      }
    }
    val fs = frames(b)
    assert(fs.length === 1 && fs(0).toSeq === f0.toSeq)
  }

  test("valid but frameless file yields an empty array, not null") {
    val b = avi { r => r.list("hdrl") { h =>
      h.chunk("avih", new Array[Byte](56)) } }
    assert(frames(b) != null)
    assert(frames(b).isEmpty)
  }

  test("malformed inputs are null, never partial") {
    val good = avi { r => r.list("movi") { m =>
      m.chunk("00dc", Array[Byte](1, 2, 3, 4)) } }
    assert(frames(good).length === 1)
    // bad magic
    val bm = good.clone(); bm(0) = 'X'
    assert(frames(bm) == null)
    val bf = good.clone(); bf(8) = 'W'
    assert(frames(bf) == null)
    // truncated mid-chunk
    assert(frames(good.take(good.length - 3)) == null)
    // RIFF size overruns the buffer
    val bs = good.clone(); bs(4) = (bs(4) + 40).toByte
    assert(frames(bs) == null)
    // chunk size overruns its LIST
    val bc = good.clone()
    // the 00dc size field sits 4 bytes after its fourCC
    val i = new String(good, "ISO-8859-1").indexOf("00dc") + 4
    bc(i) = 100
    assert(frames(bc) == null)
    assert(frames(Array.emptyByteArray) == null)
  }

  test("gate twin: SQL avi_frames -> jpeg_decode composition runs") {
    // exercised end-to-end by mm_decode_mjpeg's DuckDB gate; here
    // just pin that a real JPEG payload survives the walk byte-exact
    val jpeg = Array.tabulate(171)(i => (i % 251).toByte)
    val b = avi { r => r.list("movi") { m => m.chunk("00dc", jpeg) } }
    assert(frames(b).head.toSeq === jpeg.toSeq)
  }
}
