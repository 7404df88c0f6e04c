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

  // ── PDF 1.5: cross-reference streams + object streams ────────────

  private def deflate(d: Array[Byte]): Array[Byte] = {
    val df = new java.util.zip.Deflater()
    df.setInput(d); df.finish()
    val buf = new Array[Byte](d.length * 2 + 64)
    val m = df.deflate(buf); df.end()
    java.util.Arrays.copyOf(buf, m)
  }

  /** PDF 1.5 shape: catalog/pages/page compressed into ONE /ObjStm
    * (objects 2,3,4 as type-2 entries), the content stream and the
    * xref STREAM as direct objects. `flateXref` deflates the W-packed
    * records (+ an explicit /Index); `rowsDrop` truncates the record
    * bytes (with a consistent /Length — the truncated-W-row class);
    * `prevRaw` injects a raw /Prev value; `chain` splits the table
    * into TWO sections linked by /Prev (content stream only visible
    * through the older one). */
  private def pdf15(content: Array[Byte], flateXref: Boolean = false,
                    rowsDrop: Int = 0, prevRaw: Option[String] = None,
                    chain: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    val off1 = out.size
    val m2 = "<< /Type /Catalog /Pages 3 0 R >>"
    val m3 = "<< /Type /Pages /Kids [4 0 R] /Count 1 >>"
    val m4 = "<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>"
    val body = m2 + " " + m3 + " " + m4
    val pairs = s"2 0 3 ${m2.length + 1} 4 ${m2.length + m3.length + 2} "
    val payload = pairs + body
    w(s"1 0 obj << /Type /ObjStm /N 3 /First ${pairs.length} " +
      s"/Length ${payload.length} >> stream\n")
    w(payload)
    w("\nendstream endobj\n")
    val off5 = out.size
    w(s"5 0 obj << /Length ${content.length} >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    def rowBytes(rows: Seq[(Int, Long, Int)]): Array[Byte] = {
      val ro = new java.io.ByteArrayOutputStream()
      rows.foreach { case (t, f2, f3) =>
        ro.write(t); ro.write(((f2 >> 16) & 0xff).toInt)
        ro.write(((f2 >> 8) & 0xff).toInt); ro.write((f2 & 0xff).toInt)
        ro.write(f3)
      }
      ro.toByteArray
    }
    def xrefObj(num: Int, at: Int, size: Int, index: String,
                rows: Seq[(Int, Long, Int)], prev: Option[String]): Unit = {
      val rb0 = rowBytes(rows)
      val rb1 = if (rowsDrop > 0)
        java.util.Arrays.copyOf(rb0, rb0.length - rowsDrop) else rb0
      val rb = if (flateXref) deflate(rb1) else rb1
      w(s"$num 0 obj << /Type /XRef /Size $size /W [1 3 1] /Root 2 0 R" +
        (if (index.nonEmpty) s" /Index [$index]" else "") +
        (if (flateXref) " /Filter /FlateDecode" else "") +
        prev.map(p => s" /Prev $p").getOrElse("") +
        s" /Length ${rb.length} >> stream\n")
      out.write(rb)
      w("\nendstream endobj\n")
    }
    if (!chain) {
      val off6 = out.size
      xrefObj(6, off6, 7, if (flateXref) "0 7" else "",
        Seq((0, 0L, 0), (1, off1.toLong, 0), (2, 1L, 0), (2, 1L, 1),
          (2, 1L, 2), (1, off5.toLong, 0), (1, off6.toLong, 0)),
        prevRaw)
      w(s"startxref\n$off6\n%%EOF")
    } else {
      // older section (obj 7): free head + the content stream + self
      val offB = out.size
      xrefObj(7, offB, 8, "0 1 5 1 7 1",
        Seq((0, 0L, 0), (1, off5.toLong, 0), (1, offB.toLong, 0)), None)
      // newest section (obj 6): ObjStm + members + self, /Prev -> older
      val offA = out.size
      xrefObj(6, offA, 8, "1 4 6 1",
        Seq((1, off1.toLong, 0), (2, 1L, 0), (2, 1L, 1), (2, 1L, 2),
          (1, offA.toLong, 0)), Some(offB.toString))
      w(s"startxref\n$offA\n%%EOF")
    }
    out.toByteArray
  }

  test("xref stream + ObjStm: members counted, text extracted") {
    val (ok, nObjs, nStreams, text) =
      run(pdf15(bytes("BT (xref stream ok) Tj ET")))
    assert(ok)
    // 3 direct (ObjStm, content, XRef) + 3 compressed members
    assert(nObjs === 6L)
    // ObjStm + content + XRef carriers
    assert(nStreams === 3L)
    assert(text === "xref stream ok")
  }

  test("FlateDecode'd xref records with explicit /Index decode") {
    val (ok, nObjs, _, text) =
      run(pdf15(bytes("BT (flate xref) Tj ET"), flateXref = true))
    assert(ok && nObjs === 6L && text === "flate xref")
  }

  test("/Prev chain: newest section wins, older supplies the rest") {
    val (ok, nObjs, nStreams, text) =
      run(pdf15(bytes("BT (chained) Tj ET"), chain = true))
    assert(ok)
    // direct: ObjStm, content, two XRef sections; compressed: 3
    assert(nObjs === 7L && nStreams === 4L)
    assert(text === "chained")
  }

  test("xref-stream malformed classes: ok=false, never a throw") {
    def bad(b: Array[Byte]): Unit = assert(!run(b)._1)
    // truncated W row (records shorter than Index declares)
    bad(pdf15(bytes("BT (x) Tj ET"), rowsDrop = 1))
    // /Prev past EOF
    bad(pdf15(bytes("BT (x) Tj ET"), prevRaw = Some("99999999")))
    // /Prev pointing into garbage (no object header there)
    bad(pdf15(bytes("BT (x) Tj ET"), prevRaw = Some("3")))
    // /Prev self-loop
    val p = pdf15(bytes("BT (x) Tj ET"))
    val s = new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)
    val selfOff = s.substring(s.indexOf("startxref") + 10).trim
      .takeWhile(_.isDigit)
    bad(bytes(s.replaceFirst("/Root 2 0 R", s"/Root 2 0 R /Prev $selfOff")))
    // short ObjStm pair table (/N larger than the pairs present)
    bad(bytes(s.replaceFirst("/N 3", "/N 4")))
    // ghost type-2 entries: the xref claims compressed objects but no
    // walked carrier is an ObjStm (members would count with nothing
    // backing them)
    // (same-length name swap so every byte offset stays valid — the
    // failure must come from the ghost check, not a shifted header)
    bad(bytes(s.replaceFirst("/Type /ObjStm", "/Type /Objxtm")))
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
