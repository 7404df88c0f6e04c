package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pdf_text(bytes)` — a REAL (classic-xref) PDF text extractor as a
  * native expression: the last member of the crawl-payload container
  * family (gzip, WARC, tar, zip, PNG/BMP/GIF/WAV — and a real crawl
  * is full of PDFs). Like ZIP, PDF is read BACKWARDS: the reader
  * tail-scans for `startxref`, jumps to the cross-reference table it
  * addresses, walks the fixed 20-byte xref records to every in-use
  * object's byte offset, validates each `N G obj` header, and pulls
  * `stream` payloads by their /Length field. /FlateDecode streams go
  * through a real `java.util.zip.Inflater` (zero codec deps — the
  * PNG/gzip machinery), with the fill loop's 1-byte finish probe (the
  * r14 empty-member lesson). Text is then extracted from the decoded
  * CONTENT streams by a real string-literal parser: `(...)`
  * literals with PDF escapes (\\ \( \) \n \r \t, octal \ddd) and
  * balanced unescaped nesting, drawn by `Tj` (last pending literal)
  * or `TJ` (all literals of the array); literals followed by any
  * OTHER operator are positioned, not drawn, and are discarded —
  * drawn strings concatenate in draw order with no separator (the
  * deterministic contract; heuristic word-spacing is a presentation
  * concern this operator does not invent).
  *
  * Scope: classic xref tables (PDF ≤1.4 shape, still emitted
  * everywhere); xref STREAMS (PDF 1.5 compressed xref) are rejected
  * as unsupported rather than misparsed. Returns
  * `STRUCT<ok BOOLEAN, n_objs BIGINT, n_streams BIGINT, text STRING>`
  * (`n_objs` = in-use xref entries, `n_streams` = stream objects
  * found). Malformed input (no/absurd startxref, missing xref
  * keyword, truncated records, bad object header, /Length overrun,
  * missing endstream, inflate failure, unterminated string literal)
  * yields `ok = false` with zeroed fields — never a throw. */
case class PdfText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pdf_text requires a BINARY input, got " +
          child.dataType.simpleString)
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_objs", LongType, nullable = false),
    StructField("n_streams", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  override def prettyName: String = "pdf_text"

  override def nullSafeEval(bytes: Any): Any =
    PdfText.extract(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PdfText.extract($b);")

  override protected def withNewChildInternal(
      newChild: Expression): PdfText = copy(child = newChild)
}

object PdfText {

  private def bad: InternalRow =
    InternalRow(false, 0L, 0L, UTF8String.fromString(""))

  def extract(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 20) return bad
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0
    // ── 1. tail scan for startxref ───────────────────────────────────
    val kw = "startxref".getBytes
    var sx = -1
    var i = n - kw.length
    val stop = math.max(0, n - 2048)
    while (sx < 0 && i >= stop) {
      var j = 0
      while (j < kw.length && b(i + j) == kw(j)) j += 1
      if (j == kw.length) sx = i
      i -= 1
    }
    if (sx < 0) return bad
    var p = sx + kw.length
    while (p < n && isWs(b(p))) p += 1
    var xrefOff = 0L
    var any = false
    while (p < n && b(p) >= '0' && b(p) <= '9') {
      xrefOff = xrefOff * 10 + (b(p) - '0'); p += 1; any = true
    }
    if (!any || xrefOff < 0 || xrefOff >= n) return bad
    // ── 2. xref table walk ───────────────────────────────────────────
    p = xrefOff.toInt
    if (p + 4 > n || b(p) != 'x' || b(p + 1) != 'r' || b(p + 2) != 'e' ||
      b(p + 3) != 'f') return bad // an xref STREAM would start "N 0 obj"
    p += 4
    val offsets = collection.mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done) {
      while (p < n && isWs(b(p))) p += 1
      if (p + 7 <= n && b(p) == 't' && b(p + 1) == 'r' && b(p + 2) == 'a' &&
        b(p + 3) == 'i' && b(p + 4) == 'l' && b(p + 5) == 'e' &&
        b(p + 6) == 'r') { done = true }
      else {
        // subsection header: <first> <count>
        var first = -1L; var cnt = -1L
        var v = 0L; var got = false
        while (p < n && b(p) >= '0' && b(p) <= '9') {
          v = v * 10 + (b(p) - '0'); p += 1; got = true }
        if (!got) return bad
        first = v
        while (p < n && (b(p) == ' ' || b(p) == '\t')) p += 1
        v = 0L; got = false
        while (p < n && b(p) >= '0' && b(p) <= '9') {
          v = v * 10 + (b(p) - '0'); p += 1; got = true }
        if (!got || v > 100000) return bad
        cnt = v
        // to start of the fixed 20-byte records
        while (p < n && (b(p) == ' ' || b(p) == '\t')) p += 1
        if (p < n && b(p) == '\r') p += 1
        if (p < n && b(p) == '\n') p += 1
        var e = 0L
        while (e < cnt) {
          if (p + 20 > n) return bad
          var off = 0L; var k = 0
          while (k < 10) {
            val c = b(p + k)
            if (c < '0' || c > '9') return bad
            off = off * 10 + (c - '0'); k += 1
          }
          val flag = b(p + 17)
          if (flag == 'n') {
            if (off >= n) return bad
            if (first + e > 0) offsets += off.toInt // obj 0 is the free head
          } else if (flag != 'f') return bad
          p += 20
          e += 1
        }
      }
    }
    if (offsets.isEmpty) return bad
    // ── 3. objects: header check + stream payloads ───────────────────
    val out = new java.lang.StringBuilder()
    var nStreams = 0L
    val sorted = offsets.sorted
    var oi = 0
    while (oi < sorted.length) {
      var q = sorted(oi)
      // "<num> <gen> obj"
      var got = false
      while (q < n && b(q) >= '0' && b(q) <= '9') { q += 1; got = true }
      if (!got) return bad
      while (q < n && (b(q) == ' ')) q += 1
      got = false
      while (q < n && b(q) >= '0' && b(q) <= '9') { q += 1; got = true }
      if (!got) return bad
      while (q < n && (b(q) == ' ')) q += 1
      if (q + 3 > n || b(q) != 'o' || b(q + 1) != 'b' || b(q + 2) != 'j')
        return bad
      q += 3
      // scan this object's region (to "endobj") for dict + stream
      val end = findKeyword(b, q, "endobj")
      if (end < 0) return bad
      val region = new String(b, q, end - q,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val sPos = region.indexOf("stream")
      // "/Length" must be a complete name token: "/Length1"/"/Length2"
      // (standard font-stream dict keys) share the prefix and would
      // parse the WRONG integer as the payload length (r15 ADVICE) —
      // require a non-name char (not letter/digit/'#') after the key
      var lenPos = -1
      var lq = region.indexOf("/Length")
      while (lenPos < 0 && lq >= 0) {
        val after = lq + 7
        val isName = after < region.length && {
          val ac = region.charAt(after)
          Character.isLetterOrDigit(ac) || ac == '#'
        }
        if (!isName) lenPos = lq
        else lq = region.indexOf("/Length", lq + 1)
      }
      if (sPos >= 0 && lenPos >= 0 && lenPos < sPos &&
        !region.startsWith("endstream", sPos - 3)) {
        // /Length <int> (direct only)
        var lp = lenPos + 7
        while (lp < region.length && (region.charAt(lp) == ' ' ||
          region.charAt(lp) == '\r' || region.charAt(lp) == '\n' ||
          region.charAt(lp) == '\t')) lp += 1
        var len = 0L; var gotL = false
        while (lp < region.length && region.charAt(lp) >= '0' &&
          region.charAt(lp) <= '9') {
          len = len * 10 + (region.charAt(lp) - '0'); lp += 1; gotL = true
          // a /Length no buffer can hold is malformed NOW — checked
          // inside the loop so the accumulator can never wrap a Long
          // and sneak a negative past the dp + len bound below
          if (len > n) return bad
        }
        if (!gotL) return bad
        // payload starts after "stream" + EOL
        var dp = q + sPos + 6
        if (dp < n && b(dp) == '\r') dp += 1
        if (dp < n && b(dp) == '\n') dp += 1
        if (dp + len > n) return bad
        val payload = java.util.Arrays.copyOfRange(b, dp, dp + len.toInt)
        // "endstream" must follow (possibly after EOL)
        var ep = dp + len.toInt
        while (ep < n && isWs(b(ep))) ep += 1
        if (!startsWith(b, ep, "endstream")) return bad
        val flate = region.substring(0, sPos).contains("/FlateDecode")
        val content =
          if (!flate) payload
          else inflateAll(payload) match {
            case null => return bad
            case d => d
          }
        nStreams += 1
        if (!extractText(content, out)) return bad
      }
      oi += 1
    }
    InternalRow(true, offsets.length.toLong, nStreams,
      UTF8String.fromString(out.toString))
  }

  private def startsWith(b: Array[Byte], p: Int, s: String): Boolean = {
    if (p + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(p + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  private def findKeyword(b: Array[Byte], from: Int, s: String): Int = {
    var p = from
    while (p + s.length <= b.length) {
      if (startsWith(b, p, s)) return p
      p += 1
    }
    -1
  }

  /** Full inflate with the 1-byte finish probe (CLAUDE.md lesson h). */
  private def inflateAll(d: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(d)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var guard = 0
      while (!inf.finished() && guard < (1 << 16)) {
        val m = inf.inflate(buf)
        if (m > 0) out.write(buf, 0, m)
        else if (!inf.finished()) {
          if (inf.needsInput() || inf.needsDictionary()) return null
        }
        guard += 1
      }
      if (!inf.finished()) null else out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Content-stream text: string literals drawn by Tj/TJ. Returns
    * false on an unterminated literal. */
  private def extractText(c: Array[Byte],
                          out: java.lang.StringBuilder): Boolean = {
    val pending = collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = c.length
    while (i < n) {
      val ch = c(i)
      if (ch == '(') {
        val sb = new java.lang.StringBuilder()
        var depth = 1
        i += 1
        while (depth > 0) {
          if (i >= n) return false
          val x = c(i)
          if (x == '\\') {
            if (i + 1 >= n) return false
            val e = c(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && c(i) >= '0' && c(i) <= '7') {
                  v = v * 8 + (c(i) - '0'); i += 1; k += 1
                }
                sb.append((v & 0xff).toChar)
              // mask before widening: a high escaped byte must land
              // on its code point, same as the unescaped path (a
              // bare .toChar on Byte sign-extends to U+FF80..U+FFFF)
              case other => sb.append((other & 0xff).toChar); i += 2
            }
          } else if (x == '(') { depth += 1; sb.append('('); i += 1 }
          else if (x == ')') {
            depth -= 1
            if (depth > 0) sb.append(')')
            i += 1
          } else { sb.append((x & 0xff).toChar); i += 1 }
        }
        pending += sb.toString
      } else if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')) {
        var j = i
        while (j < n && ((c(j) >= 'a' && c(j) <= 'z') ||
          (c(j) >= 'A' && c(j) <= 'Z') || c(j) == '*' || c(j) == '\'')) j += 1
        val word = new String(c, i, j - i,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        if (word == "Tj") {
          pending.lastOption.foreach(out.append)
          pending.clear()
        } else if (word == "TJ") {
          pending.foreach(out.append)
          pending.clear()
        } else pending.clear() // positioned, not drawn
        i = j
      } else i += 1
    }
    true
  }

  /** ISO-8859-1 decoded per PDF string semantics (byte = code point
    * for the synthesized ASCII gate; a full reader would map the
    * font encoding). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pdf_text", exprs => PdfText(exprs(0)), "built-in")
}
