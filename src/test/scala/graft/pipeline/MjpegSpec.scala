package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Motion-JPEG AVI decode — REAL fixtures through the REAL JDK JPEG codec.
  * JPEG is lossy, so there is no DuckDB contract (the CompressionKernel
  * precedent); the gate is spec-level: the RIFF walk finds every MJPEG
  * frame, the per-frame decode dispatch routes JFIF payloads to the JPEG
  * codec, dimensions survive exactly, the decode is deterministic within a
  * single decoder (same fixture → identical pixel sums on every run), and
  * lossiness is bounded on smooth content. This shrinks the declared
  * compressed-video stub to inter-frame codecs (H.264-class) only.
  */
class MjpegSpec extends AnyFunSuite {
  import TestSpark._

  /** Smooth-gradient frame: JPEG handles low-frequency content with small
    * error, which makes the lossiness bound a meaningful assertion (a
    * white-noise frame would decode "correctly" with huge per-pixel error).
    */
  private def gradientFrame(seed: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (seed * 13 + x * 200 / w) % 256
        val g = (seed * 29 + y * 200 / h) % 256
        val b = (seed * 47 + (x + y) * 100 / (w + h)) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private def sums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  test("MJPEG AVI: container declares MJPG, walk finds every frame, frames are real JPEGs") {
    val frames = (0 until 4).map(gradientFrame(_, 32, 24))
    val avi = Multimodal.encodeAviMjpeg(frames, 32, 24, 10)
    // container sanity: RIFF/AVI magic, MJPG handler + biCompression present
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val hex = avi.map(b => f"$b%02x").mkString
    val mjpg = "MJPG".getBytes("US-ASCII").map(b => f"$b%02x").mkString
    // handler (strh) and biCompression (strf) are two separate occurrences
    assert(hex.sliding(8).count(_ == mjpg) >= 2)
    val got = Multimodal.extractAviFrames(avi).get
    assert(got.length == 4)
    // every extracted payload is a complete JPEG (JFIF SOI magic), NOT a DIB
    got.foreach { p =>
      assert(p(0) == 0xFF.toByte && p(1) == 0xD8.toByte)
      assert(Multimodal.decodeDib(p).isEmpty || p(0) != 'B') // not BMP-shaped
    }
  }

  test("MJPEG decode: exact dimensions, deterministic sums, bounded loss on smooth content") {
    val w = 48; val h = 32
    val frames = (0 until 3).map(gradientFrame(_, w, h))
    val avi = Multimodal.encodeAviMjpeg(frames, w, h, 10)
    def decodeAll() = Multimodal.extractAviFrames(avi).get
      .map(p => Multimodal.decodeVideoFrame(p).get)
    val once = decodeAll()
    val twice = decodeAll()
    assert(once.length == 3)
    once.zip(frames).foreach { case (dec, src) =>
      assert(dec.getWidth == w && dec.getHeight == h) // dims survive exactly
      // lossy but bounded: mean per-pixel per-channel error under 16/255
      // on gradients (JPEG's bread and butter); catastrophic mis-decode
      // (wrong subsampling, channel swap) blows far past this
      val (sr, sg, sb) = sums(dec)
      val (tr, tg, tb) = sums(src)
      val n = (w * h).toLong
      assert(math.abs(sr - tr) / n < 16, s"R mean err ${math.abs(sr - tr) / n}")
      assert(math.abs(sg - tg) / n < 16, s"G mean err ${math.abs(sg - tg) / n}")
      assert(math.abs(sb - tb) / n < 16, s"B mean err ${math.abs(sb - tb) / n}")
    }
    // single-decoder determinism: the same fixture decodes to identical
    // pixels on every invocation (the property that makes per-frame stats
    // reproducible within one decoder version, even though JPEG itself
    // leaves decoder freedom)
    once.zip(twice).foreach { case (a, b) => assert(sums(a) == sums(b)) }
  }

  test("decodeVideoStats routes MJPEG payloads end-to-end (the distributed path)") {
    import spark.implicits._
    val rows = (0L until 3L).map { id =>
      val w = 16 + (id % 2).toInt * 4; val h = 12
      val nf = 2 + (id % 2).toInt
      val frames = (0 until nf).map(f => gradientFrame((id * 10 + f).toInt, w, h))
      Multimodal.MediaRow(id, "video", Multimodal.encodeAviMjpeg(frames, w, h, 10),
        w, h, 0, nf * 100L)
    }
    val media = rows.toDS().toDF()
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("width"), col("height"), col("sample_rate"), col("duration_ms"))
          .cast(Multimodal.mediaSchema("meta").dataType).as("meta"))
    val stats = Multimodal.decodeVideoStats(media).collect()
    // every frame of every video decodes (decoded=true), with exact dims
    assert(stats.length == 2 + 3 + 2)
    assert(stats.forall(_.getBoolean(2)))
    stats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) == 16 + (id % 2) * 4 && r.getLong(4) == 12L)
      assert(r.getLong(5) > 0L && r.getLong(6) > 0L && r.getLong(7) > 0L)
    }
    // determinism across executions of the distributed plan
    val again = Multimodal.decodeVideoStats(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    stats.foreach(r => assert(
      again((r.getLong(0), r.getLong(1))) == (r.getLong(5), r.getLong(6), r.getLong(7))))
  }

  test("mixed stream: DIB and MJPEG AVIs coexist; dispatch picks the right codec per frame") {
    val dibImg = gradientFrame(1, 8, 6)
    val dibAvi = Multimodal.encodeAvi(Seq(Multimodal.encodeDib(dibImg)), 8, 6, 10)
    val mjAvi = Multimodal.encodeAviMjpeg(Seq(gradientFrame(2, 8, 6)), 8, 6, 10)
    val d = Multimodal.decodeVideoFrame(Multimodal.extractAviFrames(dibAvi).get.head).get
    val m = Multimodal.decodeVideoFrame(Multimodal.extractAviFrames(mjAvi).get.head).get
    assert(d.getWidth == 8 && d.getHeight == 6)
    assert(m.getWidth == 8 && m.getHeight == 6)
    // the DIB path stays bit-exact (lossless) — dispatch must not have
    // rerouted it through the lossy codec
    assert(sums(d) == sums(dibImg))
  }
}
