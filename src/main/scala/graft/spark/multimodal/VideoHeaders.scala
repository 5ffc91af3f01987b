package graft.spark.multimodal

import graft.core.SplitMix64

/** Real public-format video container parsing — pure byte-layout work, no
  * codec: MP4 / ISO base media file format (ISO/IEC 14496-12).
  *
  * A file is a sequence of boxes `[u32be size]["4cc" type][payload]`
  * (size 1 = u64 largesize follows; size 0 = box runs to EOF). The `moov`
  * container holds `mvhd` (movie header: u32be timescale + duration at
  * version-dependent offsets, §8.2.2) and one `trak` per track whose `tkhd`
  * (§8.3.2) carries width/height as 16.16 fixed point after the 36-byte
  * transform matrix. Presentation duration = mvhd duration / timescale.
  *
  * Frame payloads need a real codec, so (as with images) only the container
  * metadata is parsed here; non-MP4 payloads fall back to the caller's
  * disclosed stub.
  */
object VideoHeaders extends Serializable {

  final case class VideoMeta(width: Int, height: Int, durationMs: Long,
                             nTracks: Int, format: String)

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Walk the boxes of `b[from, to)`, invoking f(type-offset, body-offset,
    * body-end) per box; malformed sizes end the walk. */
  private def walk(b: Array[Byte], from: Int, to: Int)(f: (Int, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= to) {
      val size32 = u32be(b, i)
      val (bodyOff, boxEnd) =
        if (size32 == 1L && i + 16 <= to) {
          val sz = u64be(b, i + 8)
          if (sz < 16 || sz > (to - i).toLong) return
          (i + 16, i + sz.toInt)
        } else if (size32 == 0L) (i + 8, to) // box extends to EOF
        else {
          if (size32 < 8 || size32 > (to - i).toLong) return
          (i + 8, i + size32.toInt)
        }
      f(i + 4, bodyOff, boxEnd)
      if (boxEnd <= i) return
      i = boxEnd
    }
  }

  def parse(b: Array[Byte]): Option[VideoMeta] = {
    if (b == null || b.length < 16) return None
    // an MP4 leads with ftyp (or styp for segments); require it up front so
    // arbitrary payloads don't get misread as box streams
    if (!(fourcc(b, 4, "ftyp") || fourcc(b, 4, "styp"))) return None
    var timescale = 0L
    var duration = -1L
    var width = 0; var height = 0
    var nTracks = 0
    walk(b, 0, b.length) { (t, body, end) =>
      if (fourcc(b, t, "moov")) {
        walk(b, body, end) { (t2, body2, end2) =>
          if (fourcc(b, t2, "mvhd") && body2 + 4 <= end2) {
            val v = b(body2) & 0xff
            if (v == 1 && body2 + 28 + 4 <= end2) {
              timescale = u32be(b, body2 + 20)          // after 4 flags + 8 + 8
              duration = u64be(b, body2 + 24)
            } else if (v == 0 && body2 + 16 + 4 <= end2) {
              timescale = u32be(b, body2 + 12)          // after 4 flags + 4 + 4
              duration = u32be(b, body2 + 16)
            }
          } else if (fourcc(b, t2, "trak")) {
            nTracks += 1
            walk(b, body2, end2) { (t3, body3, end3) =>
              if (fourcc(b, t3, "tkhd") && body3 + 4 <= end3) {
                val v = b(body3) & 0xff
                // width/height offsets within the tkhd payload (v0/v1)
                val wOff = if (v == 1) body3 + 88 else body3 + 76
                if (wOff + 8 <= end3) {
                  val w = (u32be(b, wOff) >>> 16).toInt     // 16.16 fixed point
                  val h = (u32be(b, wOff + 4) >>> 16).toInt
                  if (w > 0 && h > 0 && width == 0) { width = w; height = h }
                }
              }
            }
          }
        }
      }
    }
    if (timescale <= 0 || duration < 0) None
    else Some(VideoMeta(width, height, duration * 1000L / timescale, nTracks, "mp4"))
  }

  // ---- deterministic real-format MP4 generation (test/verify fixture) ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tp.getBytes("ASCII") ++ payload

  /** Deterministic MP4 with REAL ftyp/moov/mvhd/trak/tkhd boxes: clip i has
    *  - width       = 160 + (i % 16) * 16
    *  - height      = 90 + ((i / 16) % 16) * 16
    *  - duration_ms = 1000 + (i % 240) * 250   (timescale 1000)
    *  - tracks      = 1 + (i % 2)              (second track is audio: w=h=0)
    * followed by an i-seeded mdat body. */
  def mkMp4(i: Long, bodyBytes: Int = 64): Array[Byte] = {
    val w = 160 + (i % 16).toInt * 16
    val h = 90 + ((i / 16) % 16).toInt * 16
    val durMs = 1000L + (i % 240) * 250L
    val ftyp = box("ftyp", "isom".getBytes("ASCII") ++ be32(512) ++
      "isomiso2mp41".getBytes("ASCII"))
    // mvhd v0: flags(4) creation(4) modification(4) timescale(4) duration(4)
    // rate(4) volume(2) reserved(10) matrix(36) predefined(24) next_track(4)
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++
      be32(durMs) ++ be32(0x00010000L) ++ Array[Byte](0, 0) ++
      new Array[Byte](10) ++ identityMatrix ++ new Array[Byte](24) ++ be32(2))
    def tkhd(trackId: Int, tw: Int, th: Int) =
      // v0: flags(4) creation(4) modification(4) track id(4) reserved(4)
      // duration(4) reserved(8) layer(2) altgroup(2) volume(2) reserved(2)
      // matrix(36) width(4) height(4) — 16.16 fixed point
      box("tkhd", be32(7) ++ be32(0) ++ be32(0) ++ be32(trackId) ++ be32(0) ++
        be32(durMs) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
        identityMatrix ++ be32(tw.toLong << 16) ++ be32(th.toLong << 16))
    val traks = if (i % 2 == 0) Array(box("trak", tkhd(1, w, h)))
      else Array(box("trak", tkhd(1, w, h)), box("trak", tkhd(2, 0, 0)))
    val moov = box("moov", mvhd ++ traks.flatten)
    val rng = new SplitMix64(0x77eeddccL ^ i)
    val body = new Array[Byte](bodyBytes)
    var j = 0
    while (j < bodyBytes) { body(j) = (rng.nextLong() >>> 56).toByte; j += 1 }
    ftyp ++ moov ++ box("mdat", body)
  }

  private def identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
}
