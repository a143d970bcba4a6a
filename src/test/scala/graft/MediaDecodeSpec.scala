package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.operators.ImageCodec

/** Laws of the image byte codecs. The decisive property is
  * CROSS-VALIDATION against an independent spec-compliant
  * implementation (the JDK's ImageIO): our encoder's output must decode
  * identically under ImageIO, and ImageIO's output must decode
  * identically under our decoder — so encoder and decoder cannot be
  * compensatingly wrong about chunk layout, filter semantics, or LZW
  * packing. Public reference bytes pin the probe path. */
class MediaDecodeSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** The canonical public 1×1 transparent PNG (8-bit RGBA). */
  private val onePxPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf" +
      "DwAChwGA60e6kgAAAABJRU5ErkJggg==")

  test("probe: public 1x1 PNG reference bytes") {
    assert(ImageCodec.probe(onePxPng) == (("png", 1, 1)))
  }

  test("PNG round trip: decode(encode(x)) == x across the filter matrix") {
    // heights ≥ 5 exercise all five per-row filters the encoder cycles
    for ((w, h, seed) <- Seq((1, 1, 0L), (3, 7, 5L), (16, 5, 41L),
        (55, 39, 499L), (37, 11, 123L))) {
      val px = (k: Int) => ((seed + k) % 256).toInt
      val img = ImageCodec.decodePng(ImageCodec.encodePng(w, h, px))
      assert(img.width == w && img.height == h && img.channels == 3)
      for (k <- 0 until w * h; c <- 0 until 3)
        assert((img.samples(k * 3 + c) & 0xff) == px(k),
          s"pixel $k channel $c at ${w}x$h seed $seed")
    }
  }

  test("our PNG encoder is readable by the JDK's reference decoder, " +
      "pixel-exactly") {
    for ((w, h, seed) <- Seq((8, 9, 7L), (31, 23, 77L))) {
      val bytes = ImageCodec.encodePng(w, h, k => ((seed + k) % 256).toInt)
      val ref = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(ref != null, "ImageIO could not parse our PNG")
      assert(ref.getWidth == w && ref.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((seed + y * w + x) % 256).toInt
        val rgb = ref.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == v && ((rgb >> 8) & 0xff) == v &&
          (rgb & 0xff) == v, s"pixel ($x,$y)")
      }
    }
  }

  test("the JDK's reference encoder is readable by our PNG decoder, " +
      "pixel-exactly") {
    val w = 19; val h = 13
    val ref = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (3 * (y * w + x) + 11) % 256
      ref.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream
    assert(ImageIO.write(ref, "png", baos))
    val img = ImageCodec.decodePng(baos.toByteArray)
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (3 * (y * w + x) + 11) % 256
      val k = (y * w + x) * img.channels
      assert((img.samples(k) & 0xff) == v, s"pixel ($x,$y)")
    }
  }

  test("PNG decoder fails loudly on corruption and truncation") {
    val good = ImageCodec.encodePng(10, 10, k => k % 256)
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x01).toByte // inside IDAT payload
    intercept[java.io.IOException](ImageCodec.decodePng(flipped))
    intercept[java.io.IOException](
      ImageCodec.decodePng(good.take(good.length - 20)))
    intercept[java.io.IOException](
      ImageCodec.decodePng("not a png at all".getBytes))
  }

  test("luma: grayscale RGB collapses Rec.601 to the gray value, " +
      "fixed-point half-up") {
    // constant 100 everywhere → mean 100.00
    val img = ImageCodec.decodePng(ImageCodec.encodePng(6, 4, _ => 100))
    assert(ImageCodec.meanLumaX100(img) == 10000L)
  }

  test("GIF: structure parse inverts the encoder (screen, frames, " +
      "delays) and the LZW frames decode under the JDK's GIF reader") {
    val frames = Seq((0, 0, 4, 4, 12, 5), (1, 2, 10, 9, 34, 99),
      (3, 1, 2, 7, 0, 127))
    val bytes = ImageCodec.encodeGif(33, 21, frames)
    val (w, h, got) = ImageCodec.parseGif(bytes)
    assert(w == 33 && h == 21)
    assert(got.map(f => (f.x, f.y, f.width, f.height, f.delayCs)) ==
      frames.map { case (x, y, fw, fh, d, _) => (x, y, fw, fh, d) })
    assert(got.map(_.index) == Seq(0, 1, 2))
    // independent reference: the JDK GIF reader must see the same
    // frame count and per-frame dimensions (proves the LZW payloads
    // are genuinely decodable, not just skippable)
    val rs = ImageIO.getImageReadersByFormatName("gif")
    assert(rs.hasNext, "JDK GIF reader missing")
    val r = rs.next()
    r.setInput(ImageIO.createImageInputStream(
      new ByteArrayInputStream(bytes)))
    assert(r.getNumImages(true) == frames.size)
    for ((f, i) <- frames.zipWithIndex)
      assert(r.getWidth(i) == f._3 && r.getHeight(i) == f._4, s"frame $i")
    intercept[java.io.IOException](
      ImageCodec.parseGif(bytes.take(bytes.length - 1))) // lost trailer
  }

  test("JPEG: SOF probe reads dimensions through skipped segments and " +
      "rejects headerless streams") {
    assert(ImageCodec.probeJpeg(ImageCodec.encodeJpegHeader(640, 480)) ==
      ((640, 480)))
    assert(ImageCodec.probe(ImageCodec.encodeJpegHeader(31, 1999)) ==
      (("jpeg", 31, 1999)))
    // SOI immediately followed by EOI: no SOF anywhere
    intercept[java.io.IOException](ImageCodec.probeJpeg(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)))
  }

  test("JPEG probe against the JDK's reference encoder") {
    val ref = new java.awt.image.BufferedImage(24, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream
    assert(ImageIO.write(ref, "jpg", baos))
    assert(ImageCodec.probe(baos.toByteArray) == (("jpeg", 24, 17)))
  }

  test("WAV round trip: parse(encode) recovers rate and every sample, " +
      "through the interposed LIST chunk") {
    import graft.operators.AudioCodec
    val f = (k: Int) => ((k * 37) % 4096) - 2048
    val w = AudioCodec.parseWav(AudioCodec.encodeWav(16000, 251, f))
    assert(w.sampleRate == 16000 && w.channels == 1 && w.bits == 16)
    assert(w.samples.length == 251)
    assert(w.samples.zipWithIndex.forall { case (s, k) => s == f(k) })
  }

  test("our WAV encoder is readable by the JDK's reference parser, " +
      "sample-exactly") {
    import graft.operators.AudioCodec
    val f = (k: Int) => ((k * 91 + 5) % 4096) - 2048
    val bytes = AudioCodec.encodeWav(8000, 64, f)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 64)
    val raw = in.readAllBytes()
    val little = fmt.isBigEndian == false
    assert(little, "JDK reports our fmt as little-endian PCM")
    for (k <- 0 until 64) {
      val s = ((raw(2 * k) & 0xff) | (raw(2 * k + 1) << 8)).toShort
      assert(s == f(k), s"sample $k")
    }
  }

  test("WAV parser fails loudly on truncation and non-PCM") {
    import graft.operators.AudioCodec
    val good = AudioCodec.encodeWav(8000, 10, _ => 7)
    intercept[IllegalArgumentException](
      AudioCodec.parseWav(good.take(good.length - 3)))
    intercept[IllegalArgumentException](
      AudioCodec.parseWav("RIFFxxxxJUNK".getBytes))
    // flip the fmt code to 3 (IEEE float): must refuse, not misread
    val nonPcm = good.clone()
    nonPcm(20) = 3
    intercept[IllegalArgumentException](AudioCodec.parseWav(nonPcm))
  }
}
