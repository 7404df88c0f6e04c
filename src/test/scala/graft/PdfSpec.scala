package graft

import org.apache.spark.sql.functions._

/** PdfText is gated (mm_pdf_text) on uncompressed content streams;
  * this spec is where the extractor earns the rest of the claim: a
  * test-side builder with REAL Deflater-compressed streams
  * (/FlateDecode through the actual Inflater path), TJ arrays,
  * escape/octal/nesting literals, multiple content streams, and the
  * malformed classes (each must yield ok=false, never a throw). */
class PdfSpec extends SparkSuite {
  import spark.implicits._

  /** Classic-xref PDF around the given content streams. */
  private def pdf(contents: Seq[Array[Byte]],
                  flate: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    offsets += out.size
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets += out.size
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets += out.size
    w("3 0 obj << /Type /Page /Parent 2 0 R >> endobj\n")
    contents.zipWithIndex.foreach { case (c0, i) =>
      val c =
        if (!flate) c0
        else {
          val d = new java.util.zip.Deflater()
          d.setInput(c0); d.finish()
          val buf = new Array[Byte](c0.length * 2 + 64)
          val m = d.deflate(buf); d.end()
          java.util.Arrays.copyOf(buf, m)
        }
      offsets += out.size
      w(s"${4 + i} 0 obj << /Length ${c.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n")
      out.write(c)
      w("\nendstream endobj\n")
    }
    val xrefOff = out.size
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer << /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%%%EOF")
    out.toByteArray
  }

  private def run(b: Array[Byte]): (Boolean, Long, Long, String) = {
    val r = graft.functions.PdfText.extract(b)
    (r.getBoolean(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("FlateDecode content streams inflate through the real path") {
    val p = pdf(Seq(bytes("BT /F1 12 Tf (hello deflate world) Tj ET")),
      flate = true)
    val (ok, nObjs, nStreams, text) = run(p)
    assert(ok && nObjs === 4L && nStreams === 1L)
    assert(text === "hello deflate world")
  }

  test("TJ arrays draw every pending literal; other ops discard") {
    val c = "BT [(a) -120 (b) 3 (c)] TJ (skipped) Td (drawn) Tj ET"
    val (ok, _, _, text) = run(pdf(Seq(bytes(c))))
    assert(ok)
    // TJ draws a,b,c; (skipped) is consumed by Td; (drawn) by Tj
    assert(text === "abcdrawn")
  }

  test("escapes, octal, and balanced nesting decode exactly") {
    val c = "BT (par\\(en\\) back\\\\slash \\110i tab\\there " +
      "(nested (deep)) done) Tj ET"
    val (ok, _, _, text) = run(pdf(Seq(bytes(c))))
    assert(ok)
    assert(text ===
      "par(en) back\\slash Hi tab\there (nested (deep)) done")
  }

  test("multiple content streams concatenate in xref offset order") {
    val p = pdf(Seq(bytes("BT (one) Tj ET"), bytes("BT (two) Tj ET")))
    val (ok, nObjs, nStreams, text) = run(p)
    assert(ok && nObjs === 5L && nStreams === 2L && text === "onetwo")
  }

  test("gate twin: SQL-synthesized roundtrip equals the source text") {
    val df = graft.operators.MultimodalQueries.pdfRoundtrip(
      Seq((1L, "plain text"), (2L, "with (parens) and \\ slash"))
        .toDF("doc_id", "text"))
    val rows = df.orderBy($"doc_id").collect()
    assert(rows.forall(_.getBoolean(1)))
    assert(rows.map(_.getString(5)).toSeq ===
      Seq("plain text", "with (parens) and \\ slash"))
  }

  test("/Length1 (font-stream key) does not shadow /Length") {
    // real font streams carry BOTH /Length1 (uncompressed size) and
    // /Length (payload size); a prefix match on "/Length" parses
    // /Length1's integer as the payload length (r15 ADVICE). Insert
    // /Length1 ahead of /Length and repoint startxref at the shifted
    // table — the extractor must still find the true length.
    val good = pdf(Seq(bytes("BT (len ok) Tj ET")))
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val s2 = s.replaceFirst("<< /Length ", "<< /Length1 9999 /Length ")
    val xrefAt = s2.indexOf("xref\n0 ")
    val s3 = s2.replaceFirst("startxref\n\\d+", "startxref\n" + xrefAt)
    val (ok, _, nStreams, text) = run(bytes(s3))
    assert(ok && nStreams === 1L && text === "len ok")
  }

  test("malformed inputs: ok=false, never a throw") {
    val good = pdf(Seq(bytes("BT (x) Tj ET")))
    def bad(b: Array[Byte]): Unit = {
      val r = run(b)
      assert(!r._1, new String(b.take(40)))
    }
    // 1 no startxref anywhere
    bad(bytes("%PDF-1.4\njunk junk junk junk junk"))
    // 2 startxref points past EOF
    bad(bytes("%PDF-1.4\nstartxref\n99999\n%%EOF"))
    // 3 startxref points at a non-xref region (the xref-STREAM shape)
    bad(bytes("%PDF-1.4\n5 0 obj <<>> endobj\nstartxref\n9\n%%EOF"))
    // 4 truncated xref records
    bad {
      val s = new String(good,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val i = s.indexOf("xref")
      bytes(s.substring(0, i + 20) +
        s.substring(s.indexOf("trailer")))
    }
    // 5 xref offset lands on garbage (no "N G obj" header)
    bad {
      val b = good.clone()
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val e = s.indexOf("0000000009") // first in-use entry
      // repoint object 1 into the middle of the header comment
      "0000000002".getBytes.copyToArray(b, e); b
    }
    // 6 /Length overruns the buffer
    bad {
      val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
      val repl = s.replaceFirst("/Length \\d+", "/Length 9999")
      assert(repl != s, "replacement must hit")
      bytes(repl)
    }
    // 7 endstream keyword missing
    bad {
      val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
      bytes(s.replace("endstream", "endstrXam"))
    }
    // 8 unterminated string literal
    bad(pdf(Seq(bytes("BT (never closed Tj ET"))))
    // 9 corrupt deflate stream under /FlateDecode
    bad {
      val p = pdf(Seq(bytes("BT (abcdefgh) Tj ET")), flate = true)
      val s = new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)
      val i = s.indexOf("stream\n") + 7
      val b = p.clone(); b(i) = 0x07; b(i + 1) = 0x07.toByte; b
    }
    // 10 empty input
    bad(Array.emptyByteArray)
    // 11 /Length past Long range must flag, not wrap-and-throw (the
    // r15 review finding: the digit accumulator could overflow to a
    // negative Long and slip past the dp+len bound into copyOfRange)
    bad {
      val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
      bytes(s.replaceFirst("/Length \\d+", "/Length 9300000000000000000"))
    }
  }

  test("escaped high bytes land on their code point, same as unescaped") {
    // review finding: \ + byte 0xAB must decode to U+00AB, not the
    // sign-extended U+FFAB — escaped and bare paths must agree
    val lit = Array[Byte]('B', 'T', ' ', '(', '\\', 0xab.toByte, '|',
      0xab.toByte, ')', ' ', 'T', 'j', ' ', 'E', 'T')
    val (ok, _, _, text) = run(pdf(Seq(lit)))
    assert(ok)
    assert(text === "«|«")
  }
}
