package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.multimodal.{AviMjpeg, JpegCodec, Multimodal}

/** MJPEG-in-AVI: RIFF framing round-trip, real frame decode through the
  * from-scratch JPEG codec, and the exploded operator shape. */
class AviMjpegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("write -> parse round-trips frames byte-identically with real metadata") {
    val frames = Array(JpegCodec.mkRealJpeg(5), JpegCodec.mkRealJpeg(5 + 256),
      JpegCodec.mkRealJpeg(5 + 512))
    val avi = AviMjpeg.write(frames, width = 18, height = 8, fps = 4)
    assert(AviMjpeg.isAvi(avi))
    val (meta, back) = AviMjpeg.parse(avi)
    assert(meta.width == 18 && meta.height == 8)
    assert(meta.nFrames == 3 && meta.handler == "MJPG")
    assert(meta.microSecPerFrame == 250000L)
    assert(back.length == 3)
    back.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("odd-length frame chunks pad to even and still round-trip") {
    // force an odd JPEG length by scanning the fixture set
    val odd = (0L until 64L).map(JpegCodec.mkRealJpeg).find(_.length % 2 == 1)
    assert(odd.isDefined, "fixture set contains an odd-length JPEG")
    val avi = AviMjpeg.write(Array(odd.get, odd.get), 8, 8)
    val (_, back) = AviMjpeg.parse(avi)
    assert(back.length == 2 && back(0).toSeq == odd.get.toSeq)
  }

  test("mkAviMjpeg frames decode to the fixture pixel formula dims") {
    val i = 37L
    val (meta, frames) = AviMjpeg.parse(AviMjpeg.mkAviMjpeg(i))
    assert(frames.length == 2 + (i % 3).toInt)
    val w = 8 + (i % 16).toInt * 2
    val h = 8 + ((i / 16) % 16).toInt * 2
    assert(meta.width == w && meta.height == h)
    frames.foreach { f =>
      val d = JpegCodec.decode(f)
      assert(d.width == w && d.height == h && d.channels == 1)
    }
    // frames differ (distinct seeds -> distinct content)
    assert(frames(0).toSeq != frames(1).toSeq)
  }

  test("explodeVideoFrames emits one decoded row per frame; non-AVI yields none") {
    import spark.implicits._
    val clips = (0L until 12L).map(i => (i, AviMjpeg.mkAviMjpeg(i)))
      .toDF("clip_id", "payload")
      .union(Seq((99L, Array[Byte](1, 2, 3, 4))).toDF("clip_id", "payload"))
    val rows = Multimodal.explodeVideoFrames(clips, "clip_id", "payload")
      .collect()
    val expected = (0L until 12L).map(i => 2 + (i % 3).toInt).sum
    assert(rows.length == expected)
    assert(!rows.exists(_.getLong(0) == 99L))
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getInt(2) == 8 + (i % 16).toInt * 2, s"clip $i width")
      assert(r.getInt(3) == 8 + ((i / 16) % 16).toInt * 2, s"clip $i height")
      assert(r.getLong(5) > 0L, "decoded pixel sum")
    }
  }

  test("decodeVideoMeta reports real AVI container metadata") {
    import spark.implicits._
    val clips = Seq((3L, AviMjpeg.mkAviMjpeg(3L))).toDF("clip_id", "payload")
    val r = clips.select(Multimodal.decodeVideoMeta(col("payload"))
        .cast("struct<w:int,h:int,d:bigint,t:int,f:string>").as("m"))
      .select(col("m.w"), col("m.h"), col("m.d"), col("m.f")).head()
    assert(r.getInt(0) == 8 + 3 * 2 && r.getString(3) == "avi")
    assert(r.getLong(2) == (2 + 3 % 3) * 250L) // nFrames * 250ms at 4 fps
  }
}
