package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM image byte codecs for the multimodal pipeline: a spec-valid
  * PNG encoder/decoder (RFC 2083 chunk layout, zlib streams via the
  * JDK's Deflater/Inflater, all five scanline filters), a GIF89a
  * encoder/structure parser (logical screen descriptor, graphic control
  * extensions, per-frame image descriptors, real LZW-coded frame data),
  * and a JPEG dimension probe (marker scan to SOF). No external codec
  * libraries — everything here is byte arithmetic over the public file
  * format specs, which is exactly the level a 100 TB ingest pipeline's
  * fast metadata path runs at (dimension probes read O(header) bytes,
  * never the pixels).
  *
  * The PNG paths are a complete round trip over real compressed pixel
  * data: the encoder applies a DIFFERENT filter per scanline (None /
  * Sub / Up / Average / Paeth, cycling) so the decoder's defilter logic
  * is exercised on every image, and the decoder verifies each chunk's
  * CRC32 — a truncated or corrupted payload fails loudly, never decodes
  * to garbage. */
object ImageCodec {

  // ---------------------------------------------------------------- PNG

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32be(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readU32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def chunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    out.write(u32be(data.length.toLong))
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    out.write(u32be(crc.getValue))
  }

  /** Encode an 8-bit truecolor (RGB) PNG. `pixel(k)` returns the gray
    * value of the k-th pixel in row-major order (emitted as r=g=b).
    * Scanline filters cycle None→Sub→Up→Average→Paeth by row so every
    * encoded image exercises the full defilter matrix on decode. */
  def encodePng(w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val prev = new Array[Byte](stride) // zero row above row 0, per spec
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (pixel(y * w + x) & 0xff).toByte
        cur(x * bpp) = v; cur(x * bpp + 1) = v; cur(x * bpp + 2) = v
        x += 1
      }
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val c = cur(i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0 // left
        val b = prev(i) & 0xff // up
        val cc = if (i >= bpp) prev(i - bpp) & 0xff else 0 // up-left
        val filtered = ft match {
          case 0 => c
          case 1 => c - a
          case 2 => c - b
          case 3 => c - (a + b) / 2
          case 4 => c - paeth(a, b, cc)
        }
        raw(y * (1 + stride) + 1 + i) = filtered.toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val out = new ByteArrayOutputStream
    out.write(PngSig)
    val ihdr = new ByteArrayOutputStream
    ihdr.write(u32be(w.toLong)); ihdr.write(u32be(h.toLong))
    ihdr.write(8) // bit depth
    ihdr.write(2) // color type: truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && inf.needsInput())
        throw new java.io.IOException("PNG: truncated IDAT stream")
      off += n
    }
    inf.end()
    if (off != expected)
      throw new java.io.IOException(
        s"PNG: IDAT inflated to $off bytes, expected $expected")
    out
  }

  /** A decoded 8-bit image: interleaved channel samples, row-major. */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
      samples: Array[Byte])

  /** Decode an 8-bit greyscale or truecolor, non-interlaced PNG:
    * signature check, chunk walk with per-chunk CRC32 verification,
    * IDAT concatenation + inflate, and full five-filter scanline
    * reconstruction (the spec's None/Sub/Up/Average/Paeth). Raises on
    * anything malformed or outside that baseline profile. */
  def decodePng(bytes: Array[Byte]): DecodedImage = {
    if (bytes.length < 8 + 25 ||
        !bytes.take(8).sameElements(PngSig))
      throw new java.io.IOException("PNG: bad signature")
    var off = 8
    var w = 0; var h = 0; var channels = 0
    val idat = new ByteArrayOutputStream
    var seenEnd = false
    while (!seenEnd) {
      if (off + 12 > bytes.length)
        throw new java.io.IOException("PNG: truncated chunk header")
      val len = readU32be(bytes, off).toInt
      if (off + 12 + len > bytes.length)
        throw new java.io.IOException("PNG: truncated chunk body")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue != readU32be(bytes, off + 8 + len))
        throw new java.io.IOException(s"PNG: CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          w = readU32be(bytes, off + 8).toInt
          h = readU32be(bytes, off + 12).toInt
          val bitDepth = bytes(off + 16) & 0xff
          val colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          if (bitDepth != 8)
            throw new java.io.IOException(s"PNG: bit depth $bitDepth unsupported")
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case other =>
              throw new java.io.IOException(s"PNG: color type $other unsupported")
          }
          if (interlace != 0)
            throw new java.io.IOException("PNG: interlaced unsupported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunk: skip
      }
      off += 12 + len
    }
    if (w <= 0 || h <= 0)
      throw new java.io.IOException("PNG: missing IHDR")
    val stride = w * channels
    val raw = inflate(idat.toByteArray, h * (1 + stride))
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(y * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= channels) out(y * stride + i - channels) & 0xff else 0
        val b = if (y > 0) out((y - 1) * stride + i) & 0xff else 0
        val c =
          if (y > 0 && i >= channels) out((y - 1) * stride + i - channels) & 0xff
          else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case other =>
            throw new java.io.IOException(s"PNG: filter type $other")
        }
        out(y * stride + i) = v.toByte
        i += 1
      }
      y += 1
    }
    DecodedImage(w, h, channels, out)
  }

  /** Integer Rec.601 luma of a decoded image, as exact ×100 fixed-point
    * (half-up) — identical arithmetic is recomputable by any engine. */
  def meanLumaX100(img: DecodedImage): Long = {
    val n = img.width.toLong * img.height
    var sum = 0L
    var k = 0
    if (img.channels == 1) {
      while (k < img.samples.length) { sum += img.samples(k) & 0xff; k += 1 }
    } else {
      while (k < img.samples.length) {
        val r = img.samples(k) & 0xff
        val g = img.samples(k + 1) & 0xff
        val b = img.samples(k + 2) & 0xff
        sum += (77 * r + 150 * g + 29 * b) >> 8
        k += 3
      }
    }
    (200L * sum + n) / (2L * n)
  }

  // ---------------------------------------------------------------- GIF

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def readU16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** One frame of an animated GIF: position + size from its image
    * descriptor, delay (centiseconds) from the preceding graphic
    * control extension. */
  final case class GifFrame(index: Int, x: Int, y: Int, width: Int,
      height: Int, delayCs: Int)

  /** Encode a structurally-valid animated GIF89a: header, logical
    * screen descriptor, 128-entry global color table, and per-frame
    * graphic-control extension + image descriptor + REAL LZW-coded
    * pixel data (minimum code size 7; frames are capped at 126 pixels
    * so every code stays 8 bits wide — genuinely decodable by any GIF
    * reader, with trivially verifiable packing). `frames` supplies
    * (x, y, w, h, delayCs, colorIndex) per frame. */
  def encodeGif(screenW: Int, screenH: Int,
      frames: Seq[(Int, Int, Int, Int, Int, Int)]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(u16le(screenW)); out.write(u16le(screenH))
    out.write(0xf6) // GCT present, 8-bit color resolution, GCT size 2^7
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    var ci = 0
    while (ci < 128) { // deterministic 128-entry palette (gray ramp ×2)
      val v = (ci * 2) & 0xff
      out.write(v); out.write(v); out.write(v)
      ci += 1
    }
    frames.foreach { case (x, y, w, h, delayCs, colorIdx) =>
      require(w * h <= 126, s"frame ${w}x$h exceeds the 8-bit-code cap")
      require(colorIdx < 128, s"color index $colorIdx exceeds the GCT")
      // graphic control extension (delay lives here)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // no disposal, no transparency
      out.write(u16le(delayCs))
      out.write(0) // transparent color index (unused)
      out.write(0) // block terminator
      // image descriptor
      out.write(0x2c)
      out.write(u16le(x)); out.write(u16le(y))
      out.write(u16le(w)); out.write(u16le(h))
      out.write(0) // no local color table
      // LZW data: min code size 7 → clear=128, EOI=129, codes 8-bit
      out.write(7)
      val codes = new ByteArrayOutputStream
      codes.write(0x80) // clear
      var p = 0
      while (p < w * h) { codes.write(colorIdx); p += 1 }
      codes.write(0x81) // end of information
      val data = codes.toByteArray
      var o = 0
      while (o < data.length) { // length-prefixed sub-blocks
        val n = math.min(255, data.length - o)
        out.write(n); out.write(data, o, n)
        o += n
      }
      out.write(0) // data terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse an animated GIF's container structure: logical screen dims
    * plus every frame's descriptor and delay. Skips pixel data by the
    * sub-block length prefixes (the container-level walk a video
    * pipeline's frame sampler runs; pixel decode is a separate stage).
    * Raises on a malformed or truncated container. */
  def parseGif(bytes: Array[Byte]): (Int, Int, Seq[GifFrame]) = {
    if (bytes.length < 13 ||
        !(new String(bytes, 0, 6, "US-ASCII") match {
          case "GIF87a" | "GIF89a" => true; case _ => false
        }))
      throw new java.io.IOException("GIF: bad signature")
    val w = readU16le(bytes, 6); val h = readU16le(bytes, 8)
    val packed = bytes(10) & 0xff
    var off = 13
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 7) + 1)) // GCT
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    var pendingDelay = 0
    var done = false
    def skipSubBlocks(): Unit = {
      while ({
        val n = bytes(off) & 0xff; off += 1
        if (n > 0) { off += n; true } else false
      }) ()
    }
    while (!done) {
      if (off >= bytes.length)
        throw new java.io.IOException("GIF: truncated (no trailer)")
      (bytes(off) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label, then sub-blocks
          val label = bytes(off + 1) & 0xff
          off += 2
          if (label == 0xf9) pendingDelay = readU16le(bytes, off + 2)
          skipSubBlocks()
        case 0x2c => // image descriptor
          val fx = readU16le(bytes, off + 1)
          val fy = readU16le(bytes, off + 3)
          val fw = readU16le(bytes, off + 5)
          val fh = readU16le(bytes, off + 7)
          val fPacked = bytes(off + 9) & 0xff
          off += 10
          if ((fPacked & 0x80) != 0) off += 3 * (1 << ((fPacked & 7) + 1))
          off += 1 // LZW minimum code size
          skipSubBlocks()
          frames += GifFrame(frames.size, fx, fy, fw, fh, pendingDelay)
          pendingDelay = 0
        case other =>
          throw new java.io.IOException(
            f"GIF: unknown block 0x$other%02x at $off")
      }
    }
    (w, h, frames.toSeq)
  }

  // --------------------------------------------------------------- JPEG

  /** Encode a structurally-valid JPEG header sequence: SOI, JFIF APP0,
    * a baseline SOF0 carrying the dimensions, EOI. Not a decodable
    * image (no scan data), but a real marker stream — exactly what the
    * dimension probe walks. */
  def encodeJpegHeader(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 JFIF
    out.write(0xff); out.write(0xe0)
    out.write(0); out.write(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // aspect-ratio units
    out.write(0); out.write(1); out.write(0); out.write(1) // density 1x1
    out.write(0); out.write(0) // no thumbnail
    // SOF0: baseline DCT
    out.write(0xff); out.write(0xc0)
    out.write(0); out.write(17) // length: 8 + 3*3 components
    out.write(8) // precision
    out.write((h >>> 8) & 0xff); out.write(h & 0xff)
    out.write((w >>> 8) & 0xff); out.write(w & 0xff)
    out.write(3) // components: Y, Cb, Cr
    out.write(1); out.write(0x11); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** JPEG dimension probe: scan the marker stream, skipping
    * variable-length segments, until a start-of-frame (SOF0–SOF15,
    * excluding DHT/JPG/DAC which share the range) yields (w, h). The
    * O(header-bytes) metadata fast path. */
  def probeJpeg(bytes: Array[Byte]): (Int, Int) = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8)
      throw new java.io.IOException("JPEG: bad SOI")
    var off = 2
    while (off + 3 < bytes.length) {
      if ((bytes(off) & 0xff) != 0xff)
        throw new java.io.IOException(f"JPEG: expected marker at $off")
      var marker = bytes(off + 1) & 0xff
      while (marker == 0xff && off + 2 < bytes.length) { // fill bytes
        off += 1; marker = bytes(off + 1) & 0xff
      }
      if (marker == 0xd9 || marker == 0xda) // EOI / start of scan
        throw new java.io.IOException("JPEG: no SOF before scan/EOI")
      if (marker >= 0xd0 && marker <= 0xd7) off += 2 // RSTn: standalone
      else if (marker == 0x01) off += 2 // TEM: standalone
      else {
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          val h = ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
          val w = ((bytes(off + 7) & 0xff) << 8) | (bytes(off + 8) & 0xff)
          return (w, h)
        }
        off += 2 + len
      }
    }
    throw new java.io.IOException("JPEG: truncated before SOF")
  }

  // -------------------------------------------------------------- probe

  /** Format + dimensions from header bytes alone: the multimodal
    * metadata fast path (PNG IHDR / GIF logical screen / JPEG SOF). */
  def probe(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) {
      // IHDR is required first: its data starts at byte 16
      if (bytes.length < 24)
        throw new java.io.IOException("PNG: truncated IHDR")
      ("png", readU32be(bytes, 16).toInt, readU32be(bytes, 20).toInt)
    } else if (bytes.length >= 10 &&
        (new String(bytes, 0, 3, "US-ASCII") == "GIF")) {
      ("gif", readU16le(bytes, 6), readU16le(bytes, 8))
    } else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
      val (w, h) = probeJpeg(bytes)
      ("jpeg", w, h)
    } else throw new java.io.IOException("unknown image format")
  }
}
