package graft.tools
object JpegPeek {
  def main(args: Array[String]): Unit = {
    val img = new java.awt.image.BufferedImage(20, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val b = out.toByteArray
    var i = 2
    while (i + 4 < b.length) {
      val m = b(i + 1) & 0xff
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      println(f"marker FF$m%02x len $len")
      if (m == 0xc0) {
        val nf = b(i + 9) & 0xff
        println(s"  SOF0 comps=$nf")
        for (c <- 0 until nf) {
          val off = i + 10 + c * 3
          println(f"  comp ${b(off)&0xff} HV=${b(off+1)&0xff}%02x Tq=${b(off+2)&0xff}")
        }
      }
      if (m == 0xda) { println("  SOS reached"); i = b.length }
      else i += 2 + len
    }
  }
}
