package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PdfCodec

/** The minimal PDF text layer: write/extract round trips (raw and
  * FlateDecode), the string-syntax corner table (escapes, octal,
  * balanced parens, hex strings, TJ arrays), hand-built content
  * streams, and malformed rejection. */
class PdfCodecSpec extends AnyFunSuite {

  test("round trip: multi-page, raw and compressed, escapes included") {
    val pages = Seq(
      Seq("Invoice #42 (final)", "Total: $1,234.56"),
      Seq("Path C:\\tmp\\x", "parens )( everywhere", ""),
      Seq("tab\there", "newline\nin line"))
    for (compress <- Seq(false, true)) {
      val bytes = PdfCodec.encode(pages, compress)
      assert(new String(bytes, 0, 5, "ISO-8859-1") == "%PDF-")
      val runs = PdfCodec.extractText(bytes)
        .getOrElse(fail(s"extract failed compress=$compress"))
      assert(runs == pages.flatten, s"compress=$compress:\n$runs")
    }
  }

  test("xref offsets in the written file are byte-exact") {
    val bytes = PdfCodec.encode(Seq(Seq("hi")), compress = false)
    val text = new String(bytes, "ISO-8859-1")
    val xref = text.lastIndexOf("\nxref\n") + 1 // not startxref's substring
    assert(xref > 0)
    // startxref points at the xref keyword.
    val sx = """startxref\n(\d+)\n""".r.findFirstMatchIn(text).get
    assert(sx.group(1).toInt == xref)
    // Every entry's offset lands exactly on "N 0 obj".
    val entries = """(\d{10}) 00000 n""".r
      .findAllMatchIn(text).map(_.group(1).toInt).toSeq
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (off, i) =>
      val at = new String(bytes, off, 8, "ISO-8859-1")
      assert(at.startsWith(s"${i + 1} 0 obj"), s"offset $off points at <$at>")
    }
  }

  test("string syntax: octal escapes, continuations, hex, nested parens, TJ") {
    // Hand-built content stream exercising syntax our writer never
    // emits — the reader must follow the spec, not the writer.
    val content = ("BT " +
      "(\\101\\102\\1043) Tj " + // octal, 3-digit max: A B D then '3'
      "(line\\\ncontinued) Tj " + // backslash-newline joins
      "(a(nested(deep))b) Tj " + // balanced unescaped parens
      "<48656c6c6F21> Tj " + // hex string, mixed case
      "<48 6 96> Tj " + // hex with whitespace, odd length pads 0
      "[ (ker) -120 (ned) 35 (!) ] TJ " +
      "(skipped) Td (shown) Tj " + // Td consumes its operand string
      "ET").getBytes("ISO-8859-1")
    val runs = PdfCodec.textOps(content).getOrElse(fail("parse failed"))
    assert(runs == Seq(
      "ABD3",
      "linecontinued",
      "a(nested(deep))b",
      "Hello!",
      "Hi" + 0x60.toChar,
      "kerned!",
      "shown"), runs.map(_.map(c => if (c < ' ') f"\\x${c.toInt}%02x" else c)))
  }

  test("malformed and out-of-profile inputs reject") {
    assert(PdfCodec.extractText("not a pdf".getBytes).isEmpty)
    val good = PdfCodec.encode(Seq(Seq("x")), compress = true)
    // Truncating INSIDE the stream data: /Length then overruns the
    // buffer — must refuse, not return partial text.
    val streamAt = new String(good, "ISO-8859-1").indexOf("stream\n")
    assert(streamAt > 0)
    assert(PdfCodec.extractText(good.take(streamAt + 12)).isEmpty)
    // Unsupported filter must refuse, not return garbage.
    val ascii = new String(
      PdfCodec.encode(Seq(Seq("y")), compress = false), "ISO-8859-1")
    val hacked = ascii.replace("<< /Length", "<< /Filter /LZWDecode /Length")
    assert(PdfCodec.extractText(hacked.getBytes("ISO-8859-1")).isEmpty)
    // Unbalanced literal string.
    assert(PdfCodec.textOps("BT ((((( Tj ET".getBytes).isEmpty)
  }

  test("oversized or overflowing /Length degrades to the endstream scan, never throws") {
    // A crafted 10+-digit /Length used to throw NumberFormatException
    // out of toInt, and a large-but-parsing value could overflow the
    // ds+len addition into a negative end that slipped the bounds
    // guard. Both must now fall back to the endstream scan (the
    // indirect-/Length path) and still extract the text.
    val ascii = new String(
      PdfCodec.encode(Seq(Seq("payload")), compress = false), "ISO-8859-1")
    val lenR = """/Length (\d+)""".r
    assert(lenR.findFirstIn(ascii).nonEmpty)
    for (bad <- Seq("99999999999999999999", // > Long.MaxValue digits
                    "9223372036854775807",  // Long.MaxValue: ds+len overflows
                    "2147480000")) {        // fits Int but exceeds buffer
      val hacked = lenR.replaceFirstIn(ascii, s"/Length $bad")
      assert(PdfCodec.extractText(hacked.getBytes("ISO-8859-1"))
        .contains(Seq("payload")), s"/Length $bad")
    }
  }

  test("adversarial text containing PDF keywords round-trips (direct-Length jump)") {
    // Uncompressed content streams carry raw text: a document whose
    // TEXT contains stream/endstream/dict tokens would derail a naive
    // keyword scanner. The direct /Length jump skips stream data
    // entirely, so these stay inert.
    val nasty = Seq(
      "x >> stream",
      "endstream endobj << /Length 3 >>",
      "7 0 obj stream endstream trailer startxref",
      "<< /Filter /FlateDecode >> stream")
    for (compress <- Seq(false, true)) {
      val bytes = PdfCodec.encode(Seq(nasty), compress)
      assert(PdfCodec.extractText(bytes).contains(nasty),
        s"compress=$compress")
    }
  }

  test("corpus round trip: every document's text survives a PDF container") {
    val spark = SparkTestBase.spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(100).collect()
    docs.foreach { r =>
      val text = r.getString(1)
      val pdf = PdfCodec.encode(Seq(Seq(text)), compress = r.getLong(0) % 2 == 0)
      val runs = PdfCodec.extractText(pdf)
        .getOrElse(fail(s"doc ${r.getLong(0)}"))
      assert(runs == Seq(text), s"doc ${r.getLong(0)}")
    }
  }
}
