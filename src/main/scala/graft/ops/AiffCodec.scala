package graft.ops

/** AIFF (Audio Interchange File Format — Apple's 1988 spec, public,
  * the big-endian sibling of RIFF/WAVE) decode + fixture encoder,
  * JVM-pure. Third audio container next to WAV and FLAC: an IFF
  * "FORM"/"AIFF" chunk walk, a COMM chunk whose sample rate is an
  * 80-bit IEEE-754 EXTENDED float (the format's famous quirk — 15-bit
  * exponent, explicit-integer-bit 64-bit mantissa), and an SSND chunk
  * of big-endian signed PCM behind an offset/blockSize preamble.
  *
  * Scope (spec-pinned): 8/16-bit PCM, 1–2 channels, integral sample
  * rates up to 2^31 (the extended-float decode rejects NaN/∞/negative/
  * fractional-rate exponents rather than rounding — a fixture never
  * produces them and a fuzzer must not crash us). Truncated SSND
  * decodes what is present, like the WAV walker. Malformed → None,
  * never a throw; the sample budget is capped before allocation.
  * Samples surface as raw INTEGERS (16-bit domain), like FLAC — which
  * keeps the position-weighted oracle sums integer-exact; the
  * normalized-float view for the feature path comes via
  * [[AudioCodec.decode]]'s dispatch.
  *
  * JDK cross-check: javax.sound.sampled ships an AIFF reader/writer,
  * so AiffCodecSpec validates both directions against AudioSystem —
  * the same external-evidence bar the JPEG codec meets with ImageIO.
  */
object AiffCodec {

  final case class DecodedAiff(sampleRate: Int, channels: Int,
                               bitsPerSample: Int, nFrames: Int,
                               samples: Array[Int])

  private val MaxSampleBytes: Long = 64L << 20

  def isAiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F'

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** 80-bit IEEE extended → integral sample rate, or -1 if the value
    * is not a positive integer that fits an Int. Layout: sign(1) +
    * exponent(15, bias 16383) + mantissa(64, EXPLICIT integer bit).
    * value = mantissa · 2^(exp − 16383 − 63); for an integral value
    * the shift count 63 − (exp − 16383) is in [32, 63] and the shifted
    * mantissa must reconstruct exactly.
    */
  private def extendedToRate(b: Array[Byte], off: Int): Int = {
    val se = be16(b, off)
    if ((se & 0x8000) != 0) return -1 // negative
    val exp = se & 0x7fff
    val mant = be64(b, off + 2)
    if (exp == 0 && mant == 0L) return -1 // zero rate is invalid audio
    if (exp == 0x7fff) return -1 // NaN / infinity
    val shift = 63 - (exp - 16383)
    if (shift < 32 || shift > 63) return -1 // > Int.MaxValue or tiny
    if ((mant >>> shift) << shift != mant) return -1 // fractional rate
    (mant >>> shift).toInt
  }

  private def rateToExtended(rate: Int): Array[Byte] = {
    require(rate > 0, s"rate $rate")
    val h = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong).toInt
    val exp = 16383 + h
    val mant = rate.toLong << (63 - h)
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7f).toByte
    out(1) = (exp & 0xff).toByte
    var i = 0
    while (i < 8) { out(2 + i) = (mant >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def decode(b: Array[Byte]): Option[DecodedAiff] =
    try decodeImpl(b)
    catch { case _: Exception => None }

  private def decodeImpl(b: Array[Byte]): Option[DecodedAiff] = {
    if (!isAiff(b)) return None
    var pos = 12
    var channels = 0; var bits = 0; var rate = -1
    var commSeen = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= b.length && (dataOff < 0 || !commSeen)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = be32(b, pos + 4)
      if (len < 0) return None
      id match {
        case "COMM" =>
          if (len < 18 || pos + 8 + 18 > b.length) return None
          channels = be16(b, pos + 8)
          // numSampleFrames at +10 is advisory; SSND length governs,
          // same truncated-upload tolerance as the WAV walker
          bits = be16(b, pos + 14)
          rate = extendedToRate(b, pos + 16)
          if (channels < 1 || channels > 2) return None
          if (bits != 8 && bits != 16) return None
          if (rate <= 0) return None
          commSeen = true
        case "SSND" =>
          if (len < 8 || pos + 16 > b.length) return None
          val offset = be32(b, pos + 8)
          if (offset < 0 || len - 8 - offset < 0) return None
          dataOff = pos + 16 + offset
          dataLen = math.min((len - 8 - offset).toLong,
            (b.length - dataOff).toLong).toInt
        case _ => // NAME/AUTH/ANNO/MARK…: skip
      }
      pos += 8 + len + (len & 1) // IFF chunks are word-aligned like RIFF
    }
    if (!commSeen || dataOff < 0 || dataLen < 0) return None
    val bytesPerSample = bits / 8
    if (dataLen.toLong > MaxSampleBytes) return None
    val nSamples = dataLen / bytesPerSample
    val nFrames = nSamples / channels
    if (nFrames == 0) return None
    val out = new Array[Int](nFrames * channels)
    var i = 0
    if (bits == 16) {
      while (i < out.length) {
        out(i) = (be16(b, dataOff + i * 2) << 16) >> 16 // sign-extend
        i += 1
      }
    } else {
      // AIFF 8-bit PCM is SIGNED (unlike WAV's unsigned 8-bit)
      while (i < out.length) { out(i) = b(dataOff + i); i += 1 }
    }
    Some(DecodedAiff(rate, channels, bits, nFrames, out))
  }

  /** Canonical 16-bit PCM AIFF from raw integer samples (interleaved,
    * 16-bit domain).
    */
  def encodeAiff16(sampleRate: Int, channels: Int,
                   samples: Array[Int]): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    val nFrames = samples.length / channels
    val dataLen = samples.length * 2
    val ssndLen = 8 + dataLen
    val formLen = 4 + (8 + 18) + (8 + ssndLen)
    val out = new Array[Byte](8 + formLen)
    var p = 0
    def putStr(s: String): Unit = { s.foreach { c => out(p) = c.toByte; p += 1 } }
    def put16(v: Int): Unit = { out(p) = (v >> 8).toByte; out(p + 1) = v.toByte; p += 2 }
    def put32(v: Int): Unit = {
      out(p) = (v >> 24).toByte; out(p + 1) = (v >> 16).toByte
      out(p + 2) = (v >> 8).toByte; out(p + 3) = v.toByte; p += 4
    }
    putStr("FORM"); put32(formLen); putStr("AIFF")
    putStr("COMM"); put32(18)
    put16(channels); put32(nFrames); put16(16)
    val ext = rateToExtended(sampleRate)
    ext.foreach { x => out(p) = x; p += 1 }
    putStr("SSND"); put32(ssndLen); put32(0); put32(0)
    samples.foreach(v => put16(v & 0xffff))
    out
  }
}
