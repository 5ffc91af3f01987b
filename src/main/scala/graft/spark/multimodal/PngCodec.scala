package graft.spark.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A real PNG codec — pure JDK (java.util.zip), no external libraries:
  * encode writes signature + IHDR + one IDAT + IEND with correct CRCs and a
  * zlib-deflated filtered pixel stream; decode walks the chunks, inflates
  * the concatenated IDAT data, reverses all five scanline filters (None/
  * Sub/Up/Average/Paeth, PNG spec §9) and de-interlaces Adam7 streams
  * (§8.2, one filtered sub-image per pass). Supported pixel layouts: 8-bit
  * grayscale (color type 0), truecolor (2), palette-indexed (3, expanded
  * through PLTE to RGB), gray+alpha (4), RGBA (6); sub-byte depths are
  * rejected explicitly.
  *
  * This upgrades the multimodal image path from "real header parse + stub
  * body" to a REAL decode: the q_image_decode driver query decodes actual
  * deflate streams and its pixel sums are checked against a closed-form
  * DuckDB oracle.
  */
object PngCodec extends Serializable {

  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def putU32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    putU32(out, data.length)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    putU32(out, crc.getValue.toInt)
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    case ct => throw new IllegalArgumentException(s"unsupported PNG color type $ct")
  }

  /** Encode 8-bit pixels (row-major, `channels` interleaved samples/px).
    * channels: 1 (gray), 2 (gray+alpha), 3 (rgb) or 4 (rgba). `filterType`
    * is applied to every scanline (0 = None is the fixture default; 1-4
    * exercise the decoder's Sub/Up/Average/Paeth reconstruction). */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             filterType: Int = 0): Array[Byte] = {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"unsupported channel count $c")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(sig, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zeroed
    chunk(out, "IHDR", ihdr)
    require(filterType >= 0 && filterType <= 4, s"bad filter type $filterType")
    val stride = width * channels
    val bpp = channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      raw(y * (1 + stride)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val f = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an 8-bit non-interlaced PNG. Throws IllegalArgumentException on
    * anything that is not one (the multimodal pipeline treats that as
    * "not an image I can featurize" and falls back to metadata-only). */
  def decode(png: Array[Byte]): Decoded = {
    require(png != null && png.length > 45 && sig.indices.forall(i => png(i) == sig(i)),
      "not a PNG")
    require(u32be(png, 8) == 13 && png(12) == 'I' && png(13) == 'H' &&
      png(14) == 'D' && png(15) == 'R', "missing IHDR")
    val width = u32be(png, 16); val height = u32be(png, 20)
    val bitDepth = png(24) & 0xff; val colorType = png(25) & 0xff
    val interlace = png(28) & 0xff
    require(bitDepth == 8, s"unsupported bit depth $bitDepth")
    require(interlace == 0 || interlace == 1, s"bad interlace method $interlace")
    val indexed = colorType == 3
    val channels = if (indexed) 1 else channelsOf(colorType)
    // concatenate IDAT chunk data; grab PLTE for indexed images
    val zdata = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var i = 8 + 4 + 4 + 13 + 4
    var sawEnd = false
    while (i + 8 <= png.length && !sawEnd) {
      val len = u32be(png, i)
      val typ = new String(png, i + 4, 4, "US-ASCII")
      require(i + 8 + len + 4 <= png.length, s"truncated chunk $typ")
      if (typ == "IDAT") zdata.write(png, i + 8, len)
      else if (typ == "PLTE") {
        require(len % 3 == 0 && len <= 768, s"bad PLTE length $len")
        palette = java.util.Arrays.copyOfRange(png, i + 8, i + 8 + len)
      }
      else if (typ == "IEND") sawEnd = true
      i += 8 + len + 4
    }
    require(!indexed || palette != null, "indexed PNG without PLTE")
    // expected inflated size: one filtered sub-image per Adam7 pass (or one
    // for non-interlaced)
    val passes: Seq[(Int, Int, Int, Int)] = // (x0, y0, dx, dy), spec §8.2
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx), math.max(0, (height - y0 + dy - 1) / dy))
    }
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0 else ph * (1 + pw * channels)
    }.sum
    val inflater = new Inflater()
    inflater.setInput(zdata.toByteArray)
    val raw = new Array[Byte](rawLen)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(), "bad deflate stream")
      off += n
    }
    inflater.end()
    require(off == raw.length, s"short pixel stream: $off of ${raw.length}")

    // reverse scanline filters (spec §9; bpp = channels at bit depth 8) for
    // one filtered sub-image starting at raw[from], writing into dst
    val bpp = channels
    def unfilter(from: Int, pw: Int, ph: Int, dst: Array[Byte]): Int = {
      val stride = pw * channels
      var y = 0
      while (y < ph) {
        val ft = raw(from + y * (1 + stride)) & 0xff
        val rowIn = from + y * (1 + stride) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowIn + x) & 0xff
          val left = if (x >= bpp) dst(rowOut + x - bpp) & 0xff else 0
          val up = if (y > 0) dst(rowOut - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) dst(rowOut - stride + x - bpp) & 0xff else 0
          val v = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 => cur + paeth(left, up, ul)
            case t => throw new IllegalArgumentException(s"bad filter type $t at row $y")
          }
          dst(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      from + ph * (1 + stride)
    }

    val pixels = new Array[Byte](height * width * channels)
    if (interlace == 0) {
      unfilter(0, width, height, pixels)
    } else {
      var from = 0
      passes.foreach { case p @ (x0, y0, dx, dy) =>
        val (pw, ph) = passDims(p)
        if (pw > 0 && ph > 0) {
          val sub = new Array[Byte](ph * pw * channels)
          from = unfilter(from, pw, ph, sub)
          var r = 0
          while (r < ph) {
            var cpx = 0
            while (cpx < pw) {
              val oy = y0 + r * dy
              val ox = x0 + cpx * dx
              var c = 0
              while (c < channels) {
                pixels((oy * width + ox) * channels + c) = sub((r * pw + cpx) * channels + c)
                c += 1
              }
              cpx += 1
            }
            r += 1
          }
        }
      }
    }
    if (!indexed) Decoded(width, height, channels, pixels)
    else {
      // palette expansion: index -> RGB triple (spec §11.2.3)
      val rgb = new Array[Byte](width * height * 3)
      val maxIdx = palette.length / 3
      var j = 0
      while (j < width * height) {
        val idx = pixels(j) & 0xff
        require(idx < maxIdx, s"palette index $idx out of range")
        rgb(j * 3) = palette(idx * 3)
        rgb(j * 3 + 1) = palette(idx * 3 + 1)
        rgb(j * 3 + 2) = palette(idx * 3 + 2)
        j += 1
      }
      Decoded(width, height, 3, rgb)
    }
  }

  /** Nearest-neighbor resample of decoded pixels (the thumbnail/feature
    * resize step): output (x, y) takes source (x*W/outW, y*H/outH) — pure
    * integer floor mapping, so resized statistics of closed-form fixtures
    * stay closed-form. */
  def resizeNearest(d: Decoded, outW: Int, outH: Int): Decoded = {
    require(outW > 0 && outH > 0, "bad target size")
    val out = new Array[Byte](outW * outH * d.channels)
    var y = 0
    while (y < outH) {
      val sy = y * d.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * d.width / outW
        var c = 0
        while (c < d.channels) {
          out((y * outW + x) * d.channels + c) =
            d.pixels((sy * d.width + sx) * d.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Decoded(outW, outH, d.channels, out)
  }

  // ---- deterministic real-PNG fixture (closed-form pixels) ----

  /** Deterministic REAL png: img i has width 8 + (i % 16) * 2, height
    * 8 + ((i / 16) % 16) * 2, channels 3 (even i) / 1 (odd i), and pixel
    * value (3x + 5y + 7c + i) mod 256 — every decoded statistic has a
    * closed form in i for the DuckDB oracle. */
  def mkRealPng(i: Long): Array[Byte] = {
    val w = 8 + (i % 16).toInt * 2
    val h = 8 + ((i / 16) % 16).toInt * 2
    val ch = if (i % 2 == 0) 3 else 1
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) = ((3 * x + 5 * y + 7 * c + i) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encode(w, h, ch, px)
  }
}
