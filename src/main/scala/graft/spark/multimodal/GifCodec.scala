package graft.spark.multimodal

/** A real GIF87a/89a codec — LZW from the spec, no external libraries.
  *
  * decode: header + logical screen descriptor, global color table,
  * extension-block skipping (graphic control / comment / application),
  * image descriptor (+ optional local color table), then full GIF-variant
  * LZW: variable code width 3..12 bits LSB-first, CLEAR/EOI codes,
  * dictionary growth with the standard width-bump at nextCode == 2^width,
  * and mid-stream CLEAR resets. Interlaced images are rejected explicitly.
  *
  * encode: real compressing LZW (hash-map dictionary, code-width growth,
  * 4096-entry reset), 255-byte sub-block framing, 256-entry global color
  * table. Used by the deterministic fixture so the decoder's dictionary
  * paths are exercised by actual compressed streams.
  */
object GifCodec extends Serializable {

  /** indices are palette-indexed pixels (row-major); palette is 256*3 RGB. */
  final case class DecodedGif(width: Int, height: Int, indices: Array[Byte],
                              palette: Array[Byte])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  // ---- LZW ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      cur |= code << nbits
      nbits += width
      while (nbits >= 8) { out.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write(cur & 0xff)
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0L
    private var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        require(pos < data.length, "LZW stream exhausted")
        cur |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (cur & ((1L << width) - 1)).toInt
      cur >>>= width; nbits -= width
      v
    }
  }

  /** GIF-variant LZW compress of `indices` with root size `minCodeSize`. */
  private def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriter
    var width = minCodeSize + 1
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = eoi + 1
    def reset(): Unit = { dict = new java.util.HashMap[Long, Integer](); nextCode = eoi + 1; width = minCodeSize + 1 }
    bw.write(clear, width)
    if (indices.isEmpty) { bw.write(eoi, width); return bw.finish() }
    var prefix = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = (prefix.toLong << 8) | k
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        bw.write(prefix, width)
        if (nextCode < 4096) {
          dict.put(key, nextCode)
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        } else {
          bw.write(clear, width)
          reset()
        }
        prefix = k
      }
      i += 1
    }
    bw.write(prefix, width)
    bw.write(eoi, width)
    bw.finish()
  }

  /** GIF-variant LZW decompress; nPixels bounds the output. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, nPixels: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val br = new BitReader(data)
    val out = new Array[Byte](nPixels)
    var outLen = 0
    // dictionary: per code, (prefix code, final byte); roots are implicit
    val prefixOf = new Array[Int](4096)
    val lastOf = new Array[Byte](4096)
    var nextCode = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    val seq = new Array[Byte](4096)
    def expand(code: Int): Int = { // writes sequence of `code` into seq, returns length
      var c = code
      var n = 0
      while (c >= clear + 2) { seq(n) = lastOf(c); n += 1; c = prefixOf(c) }
      seq(n) = c.toByte; n += 1
      // reverse in place
      var a = 0; var b = n - 1
      while (a < b) { val t = seq(a); seq(a) = seq(b); seq(b) = t; a += 1; b -= 1 }
      n
    }
    var done = false
    while (!done) {
      val code = br.read(width)
      if (code == clear) {
        nextCode = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        require(code < nextCode || (code == nextCode && prev >= 0), s"bad LZW code $code")
        if (prev < 0) {
          require(code < clear, s"first code after clear must be a root, got $code")
          require(outLen < nPixels, "LZW output overflow")
          out(outLen) = code.toByte; outLen += 1
          prev = code
        } else {
          val n =
            if (code == nextCode) { // KwKwK case
              val m = expand(prev)
              seq(m) = seq(0)
              m + 1
            } else expand(code)
          require(outLen + n <= nPixels, "LZW output overflow")
          System.arraycopy(seq, 0, out, outLen, n); outLen += n
          if (nextCode < 4096) {
            prefixOf(nextCode) = prev
            lastOf(nextCode) = seq(0)
            nextCode += 1
            // one earlier than the encoder's bump: the decoder's dictionary
            // lags the encoder's by one entry at read time (standard GIF
            // decoder convention)
            if (nextCode == (1 << width) - 1 && width < 12) width += 1
          }
          prev = code
        }
        if (outLen == nPixels) done = true
      }
    }
    require(outLen == nPixels, s"decoded $outLen of $nPixels pixels")
    out
  }

  // ---- container ----

  /** Encode palette-indexed pixels as a GIF89a with a 256-entry global
    * color table (palette: 768 RGB bytes). */
  def encode(width: Int, height: Int, indices: Array[Byte],
             palette: Array[Byte]): Array[Byte] = {
    require(indices.length == width * height, "index buffer size mismatch")
    require(palette.length == 768, "palette must be 256*3 bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write((width >>> 8) & 0xff)
    out.write(height & 0xff); out.write((height >>> 8) & 0xff)
    out.write(0xf7) // GCT present, 8 bits/channel, 256 entries
    out.write(0); out.write(0) // bg color, aspect
    out.write(palette, 0, 768)
    out.write(0x2c) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write((width >>> 8) & 0xff)
    out.write(height & 0xff); out.write((height >>> 8) & 0xff)
    out.write(0) // no LCT, not interlaced
    val minCodeSize = 8
    out.write(minCodeSize)
    val lzw = lzwEncode(indices, minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  def decode(gif: Array[Byte]): DecodedGif = {
    require(gif != null && gif.length > 13 &&
      gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F' && gif(3) == '8' &&
      (gif(4) == '7' || gif(4) == '9') && gif(5) == 'a', "not a GIF")
    val sw = u16le(gif, 6); val sh = u16le(gif, 8)
    val packed = gif(10) & 0xff
    var i = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = new Array[Byte](768)
      System.arraycopy(gif, i, gct, 0, math.min(n * 3, 768))
      i += n * 3
    }
    while (i < gif.length) {
      (gif(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while ((gif(i) & 0xff) != 0) i += 1 + (gif(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor
          val w = u16le(gif, i + 5); val h = u16le(gif, i + 7)
          val ipacked = gif(i + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          i += 10
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            palette = new Array[Byte](768)
            System.arraycopy(gif, i, palette, 0, math.min(n * 3, 768))
            i += n * 3
          }
          require(palette != null, "no color table")
          val minCodeSize = gif(i) & 0xff
          i += 1
          val zdata = new java.io.ByteArrayOutputStream()
          while ((gif(i) & 0xff) != 0) {
            val n = gif(i) & 0xff
            zdata.write(gif, i + 1, n)
            i += 1 + n
          }
          val raw = lzwDecode(zdata.toByteArray, minCodeSize, w * h)
          // interlaced rows arrive in 4 passes (GIF89a spec appendix E):
          // rows 0,8,16.. then 4,12.. then 2,6,10.. then odd rows
          val indices =
            if (!interlaced) raw
            else {
              val out = new Array[Byte](w * h)
              val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
              var src = 0
              passes.foreach { case (start, step) =>
                var y = start
                while (y < h) {
                  System.arraycopy(raw, src * w, out, y * w, w)
                  src += 1
                  y += step
                }
              }
              out
            }
          return DecodedGif(if (w > 0) w else sw, if (h > 0) h else sh, indices, palette)
        case 0x3b =>
          throw new IllegalArgumentException("trailer before any image data")
        case b =>
          throw new IllegalArgumentException(f"unexpected GIF block 0x$b%02x")
      }
    }
    throw new IllegalArgumentException("no image descriptor found")
  }

  // ---- deterministic real-GIF fixture (closed-form pixels) ----

  /** Grayscale identity palette: entry i = (i, i, i). */
  val grayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) { p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte; i += 1 }
    p
  }

  /** Deterministic REAL gif: same dimension formula as PngCodec.mkRealPng,
    * index(x, y) = (3x + 5y + i) mod 256 over the identity gray palette. */
  def mkRealGif(i: Long): Array[Byte] = {
    val w = 8 + (i % 16).toInt * 2
    val h = 8 + ((i / 16) % 16).toInt * 2
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = ((3 * x + 5 * y + i) % 256).toByte; x += 1 }
      y += 1
    }
    encode(w, h, px, grayPalette)
  }
}
