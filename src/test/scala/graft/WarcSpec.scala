package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.io.Warc
import graft.spark.io.Warc.WarcRecord

/** WARC/1.0 framing + the byte-identical html -> text extractor. */
class WarcSpec extends AnyFunSuite {

  test("write/parse round-trip preserves every payload octet") {
    val recs = Seq(
      WarcRecord("https://a.example.com/1", "2026-01-01T00:00:00Z",
        "<html><body>hello world</body></html>".getBytes(UTF_8)),
      WarcRecord("https://b.example.com/2", "2026-01-01T00:00:01Z",
        Array.tabulate[Byte](512)(i => i.toByte)), // binary incl. CRLF bytes
      WarcRecord("https://c.example.com/3", "2026-01-01T00:00:02Z",
        "<html><body>юникод 中文 κείμενο</body></html>".getBytes(UTF_8)),
      WarcRecord("https://d.example.com/4", "2026-01-01T00:00:03Z",
        Array.emptyByteArray))
    val out = Warc.parse(Warc.write(recs.iterator)).toSeq
    assert(out.map(_.url) == recs.map(_.url))
    assert(out.map(_.ts) == recs.map(_.ts))
    out.zip(recs).foreach { case (o, r) =>
      assert(java.util.Arrays.equals(o.payload, r.payload), r.url)
    }
  }

  test("extractText is byte-identical for UTF-8 multibyte content") {
    val texts = Seq("hello", "", "юникод 中文 κείμενο ©®", "a\nb\r\nc", "x" * 10000)
    texts.foreach { t =>
      val html = ("<html><body>" + t + "</body></html>").getBytes(UTF_8)
      assert(Warc.extractText(html) == t)
    }
    assert(Warc.extractText("<div>no wrapper</div>".getBytes(UTF_8)) == null)
    assert(Warc.extractText(null) == null)
  }

  test("gzip-member framing round-trips (one member per record, concatenated)") {
    val recs = (0 until 20).map(i => WarcRecord(s"https://g.example.com/$i",
      "2026-01-01T00:00:00Z", s"<html><body>doc $i body</body></html>".getBytes(UTF_8)))
    val gz = Warc.writeGzip(recs.iterator)
    // really multiple gzip members: the magic appears once per record
    val magics = gz.sliding(2).count(p => (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
    assert(magics >= 20, s"expected one gzip member per record, saw $magics magics")
    val out = Warc.parseGzip(gz).toSeq
    assert(out.map(_.url) == recs.map(_.url))
    out.zip(recs).foreach { case (o, r) => assert(java.util.Arrays.equals(o.payload, r.payload)) }
  }

  test("single-byte corruption never hangs: throws or parses shape-consistently") {
    val recs = (0 until 10).map(i => WarcRecord(s"https://f.example.com/$i",
      "2026-01-01T00:00:00Z", s"<html><body>fuzz doc $i</body></html>".getBytes(UTF_8)))
    val good = Warc.write(recs.iterator)
    val rnd = new scala.util.Random(5)
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val out = Warc.parse(bad).toSeq
        out.foreach(r => assert(r.payload != null))
      } catch {
        case _: RuntimeException | _: ArrayIndexOutOfBoundsException => () // rejected
      }
    }
  }

  test("parseTolerant skips exactly the corrupt record and counts the drop") {
    val recs = (0 until 5).map(i =>
      WarcRecord(s"https://t.example.com/$i", "2026-01-01T00:00:00Z",
        s"<html><body>doc $i body content</body></html>".getBytes(UTF_8)))
    val blob = Warc.write(recs.iterator)
    // corrupt record 2's Content-Length digits -> strict parse throws there
    val needle = "WARC-Target-URI: https://t.example.com/2".getBytes(UTF_8)
    val at = blob.indexOfSlice(needle)
    assert(at > 0)
    val clAt = blob.indexOfSlice("Content-Length: ".getBytes(UTF_8), at)
    blob(clAt + 16) = 'X'
    intercept[Exception](Warc.parse(blob).toSeq)
    var drops = 0
    val out = Warc.parseTolerant(blob, () => drops += 1).toSeq
    assert(out.map(_.url) == Seq(0, 1, 3, 4).map(i => s"https://t.example.com/$i"))
    assert(drops >= 1) // the corrupt region may need more than one resync hop
    out.foreach(r => assert(new String(r.payload, UTF_8).contains("body content")))
    // a clean blob parses identically through both paths, zero drops
    val clean = Warc.write(recs.iterator)
    var d2 = 0
    assert(Warc.parseTolerant(clean, () => d2 += 1).toSeq.map(_.url) == recs.map(_.url))
    assert(d2 == 0)
  }

  test("unknown headers are tolerated; malformed framing throws") {
    val blob = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <x>\r\n" +
      "WARC-Target-URI: u\r\nWARC-Date: d\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n")
      .getBytes(UTF_8)
    val r = Warc.parse(blob).toSeq
    assert(r.head.url == "u" && new String(r.head.payload, UTF_8) == "abc")
    intercept[IllegalArgumentException](
      Warc.parse("HTTP/1.0\r\n\r\n".getBytes(UTF_8)).toSeq)
    intercept[IllegalArgumentException]( // declared length longer than blob
      Warc.parse(("WARC/1.0\r\nWARC-Target-URI: u\r\nWARC-Date: d\r\n" +
        "Content-Length: 99\r\n\r\nabc\r\n\r\n").getBytes(UTF_8)).toSeq)
  }
}
