package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.multimodal.{ImageHeaders, PngCodec}

/** Real PNG codec: round-trips through actual zlib streams, all five
  * scanline filters, and interop with the header parser. */
class PngSpec extends AnyFunSuite {

  private def mkPixels(w: Int, h: Int, ch: Int, seed: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + seed * 7 + (i >> 5)) % 256).toByte; i += 1 }
    px
  }

  test("encode/decode round-trip for every channel layout") {
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 9))) {
      val px = mkPixels(w, h, ch, ch * 100 + w)
      val d = PngCodec.decode(PngCodec.encode(w, h, ch, px))
      assert(d.width == w && d.height == h && d.channels == ch, s"ch=$ch w=$w h=$h")
      assert(java.util.Arrays.equals(d.pixels, px), s"pixels ch=$ch w=$w h=$h")
    }
  }

  test("decoder reconstructs all five filter types (None/Sub/Up/Average/Paeth)") {
    val (w, h, ch) = (19, 11, 3)
    val px = mkPixels(w, h, ch, 5)
    for (f <- 0 to 4) {
      val d = PngCodec.decode(PngCodec.encode(w, h, ch, px, filterType = f))
      assert(java.util.Arrays.equals(d.pixels, px), s"filter=$f")
    }
  }

  test("encoded PNGs parse with the header parser (format interop)") {
    val bytes = PngCodec.encode(12, 34, 3, mkPixels(12, 34, 3, 1))
    val meta = ImageHeaders.parse(bytes)
    assert(meta.contains(ImageHeaders.ImageMeta(12, 34, 3, "png")))
  }

  test("fixture pixels follow the closed form the oracle uses") {
    val i = 37L
    val d = PngCodec.decode(PngCodec.mkRealPng(i))
    val w = 8 + (i % 16).toInt * 2; val h = 8 + ((i / 16) % 16).toInt * 2
    val ch = if (i % 2 == 0) 3 else 1
    assert(d.width == w && d.height == h && d.channels == ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
      val expect = ((3 * x + 5 * y + 7 * c + i) % 256).toByte
      assert(d.pixels((y * w + x) * ch + c) == expect, s"($x,$y,$c)")
    }
  }

  test("single-byte corruption never hangs: throws or decodes to the right shape") {
    val good = PngCodec.mkRealPng(4L)
    val rnd = new scala.util.Random(8)
    (0 until 200).foreach { _ =>
      val bad = good.clone()
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val d = PngCodec.decode(bad)
        assert(d.pixels.length == d.width * d.height * d.channels)
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException | _: java.util.zip.DataFormatException |
             _: RuntimeException => ()
      }
    }
  }

  test("nearest-neighbor resize picks floor-mapped source pixels") {
    val (w, h, ch) = (20, 12, 3)
    val px = mkPixels(w, h, ch, 9)
    val d = PngCodec.decode(PngCodec.encode(w, h, ch, px))
    val r = PngCodec.resizeNearest(d, 8, 8)
    assert(r.width == 8 && r.height == 8 && r.channels == ch)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until ch) {
      val sx = x * w / 8; val sy = y * h / 8
      assert(r.pixels((y * 8 + x) * ch + c) == px((sy * w + sx) * ch + c), s"($x,$y,$c)")
    }
    // identity resize is a no-op
    val same = PngCodec.resizeNearest(d, w, h)
    assert(java.util.Arrays.equals(same.pixels, px))
  }

  test("Adam7 interlaced PNGs decode byte-exactly (vs the JDK's independent codec)") {
    for ((w, h) <- Seq((1, 1), (7, 5), (8, 8), (20, 14), (33, 9))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (3 * x + 5 * y + w) % 256)
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      val bytes = bos.toByteArray
      assert((bytes(28) & 0xff) == 1, "fixture must actually be interlaced")
      val d = PngCodec.decode(bytes)
      assert(d.width == w && d.height == h && d.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((d.pixels(y * w + x) & 0xff) == (3 * x + 5 * y + w) % 256,
          s"($x,$y) of $w x $h")  // PNG is lossless: EXACT equality
    }
  }

  test("palette (indexed) PNGs expand through PLTE byte-exactly vs the JDK codec") {
    val (w, h) = (24, 17)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y,
      ((13 * x + 29 * y) % 256 << 16) | ((7 * x) % 256 << 8) | (11 * y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    assert((bytes(25) & 0xff) == 3, "fixture must be color type 3 (indexed)")
    val d = PngCodec.decode(bytes)
    assert(d.width == w && d.height == h && d.channels == 3)
    // exact agreement with the JDK's own decode of the same bytes
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((d.pixels(o) & 0xff) == ((rgb >> 16) & 0xff), s"R ($x,$y)")
      assert((d.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff), s"G ($x,$y)")
      assert((d.pixels(o + 2) & 0xff) == (rgb & 0xff), s"B ($x,$y)")
    }
  }

  test("malformed inputs are rejected, not mis-decoded") {
    val good = PngCodec.encode(8, 8, 1, mkPixels(8, 8, 1, 2))
    intercept[IllegalArgumentException](PngCodec.decode(good.take(40)))        // truncated
    intercept[IllegalArgumentException](PngCodec.decode(Array.fill[Byte](64)(1))) // not png
    val depth16 = good.clone(); depth16(24) = 16
    intercept[IllegalArgumentException](PngCodec.decode(depth16))
    // short IDAT stream (IDAT declared but bytes missing at the zlib level)
    val shortIdat = good.clone()
    java.util.Arrays.fill(shortIdat, 45, good.length, 0.toByte)
    intercept[Exception](PngCodec.decode(shortIdat))
  }
}
