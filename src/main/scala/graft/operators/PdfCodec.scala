package graft.operators

import java.util.zip.{Deflater, Inflater}

/** Minimal-but-REAL PDF text layer in pure JVM — the reference
  * system's entire input format is PDF (main.py:759-817 accepts only
  * `.pdf` uploads and ships the bytes to an LLM), and the pieces a
  * text extractor actually needs are public ISO 32000 structure plus
  * zlib, which the JDK ships: COS object framing, literal/hex string
  * syntax with the full escape table, stream objects with
  * FlateDecode, and the content-stream text-showing operators
  * (`Tj` / `TJ`). This codec writes spec-valid single-font PDFs
  * (real xref byte offsets, balanced-paren escaping, optional
  * Flate-compressed content) and extracts the shown text back from
  * arbitrary well-formed files in its profile.
  *
  * Profile (documented): objects located by a linear `N 0 obj` scan
  * (robust for non-incremental files; xref parsing is not needed to
  * find them), direct-integer `/Length` or endstream-scan fallback,
  * no-filter or single `/FlateDecode` streams, text taken from
  * `Tj`/`TJ`/`'` show operators in content streams (byte-to-char
  * Latin-1 — the reference corpus is ASCII), no encryption, no
  * cross-reference streams (PDF 1.5 compressed object streams
  * decode to None). Malformed inputs → None, never partial text
  * presented as complete. */
object PdfCodec {

  // ------------------------------------------------------------------
  // Write
  // ------------------------------------------------------------------

  private def escapeLiteral(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c => b.append(c)
    }
    b.toString
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(raw); d.finish()
    val o = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) o.write(buf, 0, d.deflate(buf))
    d.end()
    o.toByteArray
  }

  /** One page per entry in `pages`; each page's lines render as
    * successive `Tj` shows. Real xref table with correct byte
    * offsets; content streams optionally Flate-compressed. */
  def encode(pages: Seq[Seq[String]], compress: Boolean): Array[Byte] = {
    require(pages.nonEmpty, "at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = collection.mutable.ArrayBuffer[Long]()
    def beginObj(n: Int): Unit = { offsets += out.size.toLong; w(s"$n 0 obj\n") }

    val nPages = pages.length
    // Object numbering: 1 catalog, 2 pages tree, 3 font,
    // then per page i: (4+2i) page, (5+2i) its content stream.
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val body = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
      lines.foreach { line =>
        body.append('(').append(escapeLiteral(line)).append(") Tj\nT*\n")
      }
      body.append("ET\n")
      val raw = body.toString.getBytes("ISO-8859-1")
      val (data, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      beginObj(4 + 2 * i)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents ${5 + 2 * i} 0 R >>\nendobj\n")
      beginObj(5 + 2 * i)
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    val xrefAt = out.size
    val nObjs = offsets.length + 1
    w(s"xref\n0 $nObjs\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Read
  // ------------------------------------------------------------------

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(data)
    val o = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return None
        } else o.write(buf, 0, n)
        if (o.size > (1 << 26)) return None
      }
      Some(o.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** All stream payloads in the file, filters applied. A `stream`
    * keyword only counts when a dictionary close (`>>`) precedes it
    * across whitespace — the token also occurs inside `endstream`
    * and could occur inside string data. */
  private def streams(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val res = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (true) {
      val s = find(bytes, "stream", i)
      if (s < 0) return Some(res.result())
      var p = s - 1
      while (p >= 0 && Character.isWhitespace(bytes(p) & 0xff)) p -= 1
      if (p < 1 || bytes(p) != '>' || bytes(p - 1) != '>') {
        i = s + "stream".length // not a stream keyword; keep scanning
      } else {
        // Dictionary immediately preceding: scan back for "<<".
        val dictStart = lastIndexOfBefore(bytes, "<<", s)
        if (dictStart < 0) return None
        val dict = new String(bytes, dictStart, s - dictStart, "ISO-8859-1")
        // Stream data starts after the EOL following the keyword.
        var ds = s + "stream".length
        if (ds < bytes.length && bytes(ds) == '\r') ds += 1
        if (ds < bytes.length && bytes(ds) == '\n') ds += 1
        // Direct /Length N vs indirect /Length N 0 R — the optional
        // group disambiguates (a bare negative lookahead would let
        // "/Length 120 0 R" backtrack into matching "12").
        val lenR = """/Length\s+(\d+)(\s+\d+\s+R)?""".r
        // Direct lengths parse as Long with an in-bounds guard: a
        // 10+-digit or overflowing /Length in a crafted file must
        // degrade to the endstream scan, never throw out of the
        // malformed-input→None contract.
        val directLen: Option[Long] = lenR.findFirstMatchIn(dict) match {
          case Some(m) if m.group(2) == null =>
            scala.util.Try(m.group(1).toLong).toOption
              // Subtraction form: ds + len would itself overflow for
              // len near Long.MaxValue; bytes.length - ds cannot.
              .filter(len => len >= 0 && len <= (bytes.length - ds).toLong)
          case _ => None
        }
        val end = directLen match {
          case Some(len) => ds + len.toInt
          case None => // indirect or implausible /Length: endstream scan
            val e = find(bytes, "endstream", ds)
            if (e < 0) return None
            var ee = e // strip one trailing EOL
            if (ee > ds && bytes(ee - 1) == '\n') ee -= 1
            if (ee > ds && bytes(ee - 1) == '\r') ee -= 1
            ee
        }
        if (end > bytes.length) return None
        val data = java.util.Arrays.copyOfRange(bytes, ds, end)
        val payload =
          if (dict.contains("/FlateDecode")) inflate(data).getOrElse(return None)
          else if (dict.contains("/Filter")) return None // unsupported filter
          else data
        res += payload
        val after = find(bytes, "endstream", end)
        if (after < 0) return None
        i = after + "endstream".length
      }
    }
    None
  }

  private def find(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.max(0, from)
    while (i <= hay.length - n.length) {
      var j = 0
      var ok = true
      while (ok && j < n.length) { ok = hay(i + j) == n(j); j += 1 }
      if (ok) return i
      i += 1
    }
    -1
  }

  private def lastIndexOfBefore(hay: Array[Byte], needle: String,
                                before: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.min(before, hay.length) - n.length
    while (i >= 0) {
      var j = 0
      var ok = true
      while (ok && j < n.length) { ok = hay(i + j) == n(j); j += 1 }
      if (ok) return i
      i -= 1
    }
    -1
  }

  /** Parse one PDF string starting at `i` (which must point at '('
    * or '<'); returns (decoded, indexAfter). */
  private def parseString(b: Array[Byte], i: Int): Option[(String, Int)] = {
    if (b(i) == '(') {
      val sb = new StringBuilder
      var depth = 1
      var j = i + 1
      while (j < b.length && depth > 0) {
        val c = b(j) & 0xff
        c match {
          case '\\' =>
            if (j + 1 >= b.length) return None
            val e = b(j + 1) & 0xff
            e match {
              case 'n' => sb.append('\n'); j += 2
              case 'r' => sb.append('\r'); j += 2
              case 't' => sb.append('\t'); j += 2
              case 'b' => sb.append('\b'); j += 2
              case 'f' => sb.append('\f'); j += 2
              case '(' => sb.append('('); j += 2
              case ')' => sb.append(')'); j += 2
              case '\\' => sb.append('\\'); j += 2
              case '\n' => j += 2 // line continuation
              case '\r' =>
                j += 2; if (j < b.length && b(j) == '\n') j += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; j += 1
                while (k < 3 && j < b.length &&
                    b(j) >= '0' && b(j) <= '7') {
                  v = v * 8 + (b(j) - '0'); j += 1; k += 1
                }
                sb.append((v & 0xff).toChar)
              case _ => sb.append(e.toChar); j += 2 // spec: drop backslash
            }
          case '(' => depth += 1; sb.append('('); j += 1
          case ')' =>
            depth -= 1
            if (depth > 0) sb.append(')')
            j += 1
          case _ => sb.append(c.toChar); j += 1
        }
      }
      if (depth != 0) None else Some((sb.toString, j))
    } else if (b(i) == '<') {
      var j = i + 1
      val hex = new StringBuilder
      while (j < b.length && b(j) != '>') {
        val c = (b(j) & 0xff).toChar
        if (!c.isWhitespace) {
          if (!"0123456789abcdefABCDEF".contains(c)) return None
          hex.append(c)
        }
        j += 1
      }
      if (j >= b.length) return None
      if (hex.length % 2 == 1) hex.append('0')
      val sb = new StringBuilder
      hex.toString.grouped(2).foreach { p =>
        sb.append(Integer.parseInt(p, 16).toChar)
      }
      Some((sb.toString, j + 1))
    } else None
  }

  /** The shown-text runs (`Tj`, `'`, and `TJ` array elements, in
    * stream order) of one content stream. */
  private[graft] def textOps(content: Array[Byte]): Option[Seq[String]] = {
    val runs = Seq.newBuilder[String]
    var i = 0
    var pend: Seq[String] = Nil // strings seen since last op keyword
    while (i < content.length) {
      val c = content(i) & 0xff
      if (c == '(' || c == '<') {
        // '<<' starts a dictionary, not a string
        if (c == '<' && i + 1 < content.length && content(i + 1) == '<') {
          i += 2
        } else {
          val (s, ni) = parseString(content, i).getOrElse(return None)
          pend = pend :+ s
          i = ni
        }
      } else if (c == '[') { i += 1 }
      else if (c == ']') { i += 1 }
      else if ((c == 'T' && i + 1 < content.length &&
          (content(i + 1) == 'j' || content(i + 1) == 'J')) || c == '\'') {
        // Tj / TJ / ' consume the pending strings as one shown run.
        if (pend.nonEmpty) { runs += pend.mkString; pend = Nil }
        i += (if (c == '\'') 1 else 2)
      } else {
        // Any other operator discards pending strings (they belonged
        // to a non-show operator's operands).
        if (!Character.isWhitespace(c) && c != '-' && c != '.' &&
            !(c >= '0' && c <= '9')) pend = Nil
        i += 1
      }
    }
    Some(runs.result())
  }

  /** Extract every shown-text run of the document, in file order.
    * None when the file is outside the profile or malformed. */
  def extractText(bytes: Array[Byte]): Option[Seq[String]] = {
    if (bytes.length < 8 ||
        new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-") return None
    streams(bytes).flatMap { ss =>
      val content = ss.filter(s => find(s, "BT", 0) >= 0)
      val all = Seq.newBuilder[String]
      content.foreach { s =>
        textOps(s) match {
          case Some(runs) => all ++= runs
          case None => return None
        }
      }
      Some(all.result())
    }
  }
}
