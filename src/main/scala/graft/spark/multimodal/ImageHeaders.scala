package graft.spark.multimodal

import graft.core.SplitMix64

/** Real public-format image header parsing — pure byte-layout work, no codec:
  *
  *  - PNG: 8-byte signature then the IHDR chunk (width/height u32be at
  *    offsets 16/20, bit depth + color type after) — PNG spec §11.2.2;
  *  - JPEG/JFIF: marker scan from SOI to the first SOF0/1/2/3 frame header
  *    (height/width u16be, component count) — ITU T.81 §B.2.2;
  *  - GIF87a/89a: logical screen width/height u16le at offsets 6/8.
  *
  * Anything else falls back to the caller's stub derivation (disclosed).
  */
object ImageHeaders extends Serializable {

  final case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG color type -> sample channels (spec Table 11.1). */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette-indexed
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case _ => 0
  }

  def parse(b: Array[Byte]): Option[ImageMeta] = {
    if (b == null || b.length < 10) return None
    // PNG: signature + "IHDR" at offset 12, width/height/bitdepth/colortype follow
    if (b.length >= 26 && pngSig.indices.forall(i => b(i) == pngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = u32be(b, 16); val h = u32be(b, 20); val ct = b(25) & 0xff
      if (w > 0 && h > 0) return Some(ImageMeta(w, h, pngChannels(ct), "png"))
    }
    // JPEG: SOI then marker scan for SOF0-3 (baseline/extended/progressive/lossless)
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // not a marker stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone markers, no length
        } else if (marker == 0xd9) {
          return None // EOI before any SOF
        } else {
          val len = u16be(b, i + 2)
          if (marker >= 0xc0 && marker <= 0xc3) {
            val h = u16be(b, i + 5); val w = u16be(b, i + 7); val ncomp = b(i + 9) & 0xff
            if (w > 0 && h > 0) return Some(ImageMeta(w, h, ncomp, "jpeg"))
            return None
          }
          i += 2 + len
        }
      }
      return None
    }
    // GIF87a / GIF89a: logical screen descriptor
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = u16le(b, 6); val h = u16le(b, 8)
      if (w > 0 && h > 0) return Some(ImageMeta(w, h, 1, "gif")) // palette-indexed
    }
    None
  }

  // ---- deterministic real-header image generation (test/verify fixture) ----

  /** Deterministic image payload with a REAL format header: img i cycles
    * png/jpeg/gif, width = 16 + (i % 64) * 4, height = 16 + ((i / 64) % 64) * 4,
    * followed by an i-seeded body so downstream feature extraction varies. */
  def mkImage(i: Long, bodyBytes: Int = 64): Array[Byte] = {
    val w = 16 + (i % 64).toInt * 4
    val h = 16 + ((i / 64) % 64).toInt * 4
    val header: Array[Byte] = (i % 3) match {
      case 0 => // PNG signature + IHDR (13-byte data, crc left zeroed — not validated)
        val out = new Array[Byte](8 + 4 + 4 + 13 + 4)
        System.arraycopy(pngSig, 0, out, 0, 8)
        out(11) = 13 // chunk length 13 (u32be)
        out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
        out(16) = (w >>> 24).toByte; out(17) = (w >>> 16).toByte
        out(18) = (w >>> 8).toByte; out(19) = w.toByte
        out(20) = (h >>> 24).toByte; out(21) = (h >>> 16).toByte
        out(22) = (h >>> 8).toByte; out(23) = h.toByte
        out(24) = 8 // bit depth
        out(25) = 2 // color type truecolor -> 3 channels
        out
      case 1 => // SOI + APP0 stub + SOF0 with 3 components
        val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 'J', 'F')
        val sof = new Array[Byte](2 + 2 + 1 + 2 + 2 + 1 + 9)
        sof(0) = 0xff.toByte; sof(1) = 0xc0.toByte
        sof(2) = 0; sof(3) = (sof.length - 2).toByte // segment length
        sof(4) = 8 // precision
        sof(5) = (h >>> 8).toByte; sof(6) = h.toByte
        sof(7) = (w >>> 8).toByte; sof(8) = w.toByte
        sof(9) = 3 // components
        Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof
      case _ => // GIF89a logical screen descriptor
        val out = new Array[Byte](13)
        out(0) = 'G'; out(1) = 'I'; out(2) = 'F'; out(3) = '8'; out(4) = '9'; out(5) = 'a'
        out(6) = w.toByte; out(7) = (w >>> 8).toByte
        out(8) = h.toByte; out(9) = (h >>> 8).toByte
        out
    }
    val rng = new SplitMix64(0xabcdef12L ^ i)
    val body = new Array[Byte](bodyBytes)
    var j = 0
    while (j < bodyBytes) { body(j) = (rng.nextLong() >>> 56).toByte; j += 1 }
    header ++ body
  }
}
