package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.multimodal.VideoHeaders

/** Real MP4 / ISO-BMFF box parsing (Round2Spec sibling). */
class VideoHeadersSpec extends AnyFunSuite {

  test("generated MP4 fixtures parse to the closed formulas") {
    (0L until 300L).foreach { i =>
      val m = VideoHeaders.parse(VideoHeaders.mkMp4(i)).get
      assert(m.format == "mp4", s"clip $i format")
      assert(m.width == 160 + (i % 16).toInt * 16, s"clip $i width")
      assert(m.height == 90 + ((i / 16) % 16).toInt * 16, s"clip $i height")
      assert(m.durationMs == 1000L + (i % 240) * 250L, s"clip $i duration")
      assert(m.nTracks == 1 + (i % 2).toInt, s"clip $i tracks")
    }
  }

  test("hand-built boxes: v1 headers, largesize, width from the video track") {
    def be32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tp: String, p: Array[Byte]) = be32(8L + p.length) ++ tp.getBytes ++ p
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
    // mvhd v1: u64 creation/modification/duration, timescale 90000, dur 180000 -> 2000ms
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(180000) ++ new Array[Byte](80))
    // tkhd v1: width/height at payload offset 88
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
      be32(1) ++ be32(0) ++ be64(180000) ++ new Array[Byte](16) ++
      new Array[Byte](36) ++ be32(640L << 16) ++ be32(480L << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val m = VideoHeaders.parse(ftyp ++ moov).get
    assert(m.durationMs == 2000L && m.width == 640 && m.height == 480 && m.nTracks == 1)

    // largesize (size==1 -> u64) wrapping of the same moov still parses
    val bigMoov = be32(1) ++ "moov".getBytes ++ be64(16L + (mvhd.length + 8 + tkhd.length)) ++
      mvhd ++ box("trak", tkhd)
    assert(VideoHeaders.parse(ftyp ++ bigMoov).get.durationMs == 2000L)
  }

  test("non-MP4 payloads fall back to None") {
    assert(VideoHeaders.parse(null).isEmpty)
    assert(VideoHeaders.parse(Array[Byte](1, 2, 3)).isEmpty)
    // a WAV is not an MP4
    assert(VideoHeaders.parse(graft.spark.multimodal.AudioHeaders.mkWav(3L)).isEmpty)
    // ftyp but no moov/mvhd
    def be32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftypOnly = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    assert(VideoHeaders.parse(ftypOnly).isEmpty)
  }
}
