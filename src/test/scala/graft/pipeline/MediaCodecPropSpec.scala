package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Randomized property tests (pure JVM, fixed seed) for the hand-written
  * media containers and their REAL JDK-codec round trips — these parsers
  * run on untrusted bytes at corpus scale, so beyond the formula fixtures
  * they must (a) round-trip ANY payload losslessly and (b) never throw or
  * over-allocate on corrupted input, only degrade to None.
  */
class MediaCodecPropSpec extends AnyFunSuite {

  private def randImage(rnd: scala.util.Random, w: Int, h: Int) = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt() & 0xFFFFFF)
    img
  }

  test("WAV: arbitrary 16-bit PCM round-trips bit-exactly through the JDK codec") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 60) {
      val n = 1 + rnd.nextInt(400)
      val rate = Seq(8000, 16000, 44100)(rnd.nextInt(3))
      val samples = Array.fill[Short](n)(rnd.nextInt(65536).toShort)
      val (gotRate, got) = Multimodal.decodeWav(Multimodal.encodeWav(samples, rate)).get
      assert(gotRate == rate)
      assert(got.sameElements(samples))
    }
  }

  test("DIB: arbitrary RGB images round-trip bit-exactly through the BMP codec") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 40) {
      val (w, h) = (1 + rnd.nextInt(24), 1 + rnd.nextInt(16))
      val img = randImage(rnd, w, h)
      val back = Multimodal.decodeDib(Multimodal.encodeDib(img)).get
      assert(back.getWidth == w && back.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("AVI: every frame round-trips; walker finds exactly the frames written") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 40) {
      val (nf, w, h) = (1 + rnd.nextInt(5), 1 + rnd.nextInt(12), 1 + rnd.nextInt(8))
      val frames = Seq.fill(nf)(Multimodal.encodeDib(randImage(rnd, w, h)))
      val got = Multimodal.extractAviFrames(Multimodal.encodeAvi(frames, w, h, 10)).get
      assert(got.length == nf)
      got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("AVI: chunk size near Int.MaxValue degrades to None (no Int-overflow allocation)") {
    // Adversarial case the random fuzz is unlikely to hit: a declared chunk
    // size that makes `position + sz` overflow Int. The bounds check must be
    // computed in Long, so the guard fires BEFORE the ~2 GB allocation.
    for (sz <- Seq(Int.MaxValue - 10, Int.MaxValue - 30, Int.MaxValue)) {
      val b = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(24)
        .put("AVI ".getBytes("US-ASCII"))
        .put("00db".getBytes("US-ASCII")).putInt(sz)
      assert(Multimodal.extractAviFrames(b.array()).isEmpty)
    }
  }

  test("amplitudeStripes: stripe index computed in Long (no i*dim Int overflow)") {
    // i*dim overflows Int once i*dim > 2^31; with dim = 2^20 that happens at
    // i = 2048 — cheap to reach, unlike the 134M-sample WAV it stands in for.
    val dim = 1 << 20
    val samples = Array.tabulate[Short](4096)(i => (i % 128).toShort)
    val out = Multimodal.amplitudeStripes(samples, dim) // pre-fix: AIOOBE
    assert(out.length == dim)
    assert(out.forall(v => v >= 0f && v <= 1f))
  }

  test("TIFF: JDK ImageIO TIFF payloads pass the magic sniff and decode for real") {
    // JDK 9+ ships a TIFF plugin; the sniff must not shunt TIFF payloads to
    // the stub-feature path. Round trip through the real writer/reader.
    val rnd = new scala.util.Random(45)
    val img = randImage(rnd, 9, 7)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    assert(javax.imageio.ImageIO.write(img, "tiff", ios), "JDK TIFF writer expected")
    ios.flush()
    val back = Multimodal.decodeImage(bos.toByteArray)
    assert(back.nonEmpty, "TIFF magic (II*\\0 / MM\\0*) must pass looksLikeImage")
    for (y <- 0 until 7; x <- 0 until 9)
      assert((back.get.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF))
  }

  test("GIF: arbitrary multi-frame grayscale sequences round-trip bit-exactly") {
    val rnd = new scala.util.Random(46)
    def grayPalette = {
      val g = Array.tabulate[Byte](256)(i => i.toByte)
      new java.awt.image.IndexColorModel(8, 256, g, g, g)
    }
    for (_ <- 1 to 30) {
      val (nf, w, h) = (1 + rnd.nextInt(4), 1 + rnd.nextInt(14), 1 + rnd.nextInt(10))
      val pix = Array.fill(nf, h, w)(rnd.nextInt(256))
      val frames = (0 until nf).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, pix(f)(y)(x))
        img
      }
      val got = Multimodal.extractGifFrames(Multimodal.encodeGif(frames)).get
      assert(got.length == nf)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
        assert((got(f).getRGB(x, y) & 0xFF) == pix(f)(y)(x), s"frame $f pixel ($x,$y)")
    }
  }

  test("corrupted containers degrade cleanly — never throw, never over-allocate") {
    // flip/truncate random bytes of valid containers (size fields
    // included, so huge/negative chunk sizes occur); every parser must
    // return cleanly. This is the 100 TB corrupt-blob path.
    val rnd = new scala.util.Random(44)
    val samples = Array.tabulate[Short](50)(i => (i * 7).toShort)
    for (i <- 1 to 150) {
      val img = randImage(rnd, 6, 4)
      val valid = i % 3 match {
        case 0 => Multimodal.encodeWav(samples, 8000)
        case 1 => Multimodal.encodeAvi(Seq(Multimodal.encodeDib(img)), 6, 4, 10)
        case _ => Multimodal.encodePng(img)
      }
      val corrupted = valid.clone()
      for (_ <- 0 until 1 + rnd.nextInt(6))
        corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt(256).toByte
      val truncated = corrupted.take(1 + rnd.nextInt(corrupted.length))
      for (payload <- Seq(corrupted, truncated)) {
        Multimodal.decodeWav(payload)        // must not throw
        Multimodal.extractAviFrames(payload) // must not throw / OOM
        Multimodal.decodeImage(payload)      // must not throw
        Multimodal.extractGifFrames(payload) // must not throw
      }
    }
  }
}
