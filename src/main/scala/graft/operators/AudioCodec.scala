package graft.operators

/** Minimal REAL RIFF/WAVE codec for 16-bit PCM: a spec-true chunk walk
  * (RIFF container header, `fmt ` parse, unknown-chunk skip, `data`
  * extraction) — the audio analog of [[ImageCodec]]'s PNG/GIF work.
  * Pure byte arithmetic, no codec library: PCM WAV is the container
  * format a training pipeline's audio fast path actually probes.
  * Encoder is cross-validated against the JDK's AudioSystem parser in
  * MediaDecodeSpec, so encoder and decoder cannot be compensatingly
  * wrong about the chunk layout. */
object AudioCodec {

  final case class Wav(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Short])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a PCM WAV: validates the RIFF/WAVE signature, walks chunks
    * (word-aligned, unknown chunks skipped), requires a PCM `fmt ` and
    * a `data` chunk. Fails loudly on truncation or non-PCM. */
  def parseWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length,
        s"truncated chunk $id at $off (size $sz)")
      id match {
        case "fmt " =>
          require(sz >= 16, "fmt chunk too small")
          val fmtCode = le16(bytes, off + 8)
          require(fmtCode == 1, s"not PCM (format code $fmtCode)")
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
        case _ => () // LIST/INFO/etc: spec-legal unknown chunks, skip
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(rate > 0 && data != null, "missing fmt or data chunk")
    val samples = new Array[Short](data.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = le16(data, 2 * i).toShort
      i += 1
    }
    Wav(rate, channels, bits, samples)
  }

  /** Encode mono 16-bit PCM, with a LIST chunk between fmt and data so
    * round-trip tests exercise the unknown-chunk skip path. */
  def encodeWav(sampleRate: Int, n: Int, sample: Int => Int): Array[Byte] = {
    val listBody = "INFOgraft".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) // 9 bytes, odd: pads
    val listSz = listBody.length
    val dataSz = 2 * n
    val riffSz = 4 + (8 + 16) + (8 + listSz + (listSz & 1)) + (8 + dataSz)
    val out = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(riffSz); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16) // bits
    out.put("LIST".getBytes); out.putInt(listSz); out.put(listBody)
    if ((listSz & 1) == 1) out.put(0.toByte) // word-align pad
    out.put("data".getBytes); out.putInt(dataSz)
    var k = 0
    while (k < n) { out.putShort(sample(k).toShort); k += 1 }
    out.array()
  }
}
