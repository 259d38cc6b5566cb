package graft.ops

import java.io.ByteArrayOutputStream

/** QOI — "Quite OK Image" — decode + fixture encoder, JVM-pure, from
  * the public-domain specification (qoiformat.org, qoi-specification
  * 1.0). The sixth still-image family next to PNG/BMP/PPM/GIF/JPEG:
  * a modern single-pass byte-oriented lossless format real crawls
  * increasingly carry, and — like PNG/GIF — lossless, so decoded
  * PIXELS are bit-exact and oracle-checkable (the strongest evidence
  * class the media path has).
  *
  * Format (14-byte header "qoif", u32-BE width/height, channels 3|4,
  * colorspace byte, then a chunk stream, then 7×0x00 + 0x01):
  *  - 0xFE QOI_OP_RGB: explicit r,g,b (alpha carried over)
  *  - 0xFF QOI_OP_RGBA: explicit r,g,b,a
  *  - tag 00 QOI_OP_INDEX: replay the 64-slot recent-color array at
  *    hash (3r+5g+7b+11a) mod 64
  *  - tag 01 QOI_OP_DIFF: per-channel wrapping deltas in [-2,1]
  *  - tag 10 QOI_OP_LUMA: green delta in [-32,31], red/blue deltas
  *    expressed relative to it in [-8,7] — all wrapping
  *  - tag 11 QOI_OP_RUN: repeat the previous pixel 1..62 times (the
  *    run does NOT touch the index array; every other op's pixel does)
  *
  * Scope: channels 3 (RGB) and 4 (RGBA), either colorspace byte.
  * Malformed (bad magic, zero/overflow dims, stream underrun, missing
  * end marker) → None, never a throw; the pixel budget is bounded
  * before allocation (one corrupt length field must not OOM an
  * executor). The encoder is the standard greedy chooser
  * (run → index → diff → luma → rgb/rgba) so fixtures exercise every
  * op type; QoiCodecSpec additionally pins hand-assembled byte streams
  * per op, so decode and encode cannot share a systematic spec
  * misreading.
  */
object QoiCodec {

  private val MaxPixelBytes: Int = 64 << 20

  def isQoi(b: Array[Byte]): Boolean =
    b != null && b.length >= 14 &&
      b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f'

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  def decode(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    try {
      if (!isQoi(bytes)) return None
      val w = be32(bytes, 4)
      val h = be32(bytes, 8)
      val channels = bytes(12) & 0xff
      val colorspace = bytes(13) & 0xff
      if (w <= 0 || h <= 0 || (channels != 3 && channels != 4) ||
        colorspace > 1 || w * h * channels > MaxPixelBytes) return None
      val width = w.toInt; val height = h.toInt
      val n = width * height
      val out = new Array[Byte](n * channels)
      // recent-color array, flat RGBA slots, zero-initialized per spec
      val idx = new Array[Int](64 * 4)
      var r = 0; var g = 0; var b = 0; var a = 255
      var p = 0 // next output pixel
      var i = 14
      while (p < n) {
        if (i >= bytes.length - 8) return None // underrun into end marker
        val b1 = bytes(i) & 0xff; i += 1
        var run = 1
        if (b1 == 0xfe) {
          if (i + 3 > bytes.length - 8) return None
          r = bytes(i) & 0xff; g = bytes(i + 1) & 0xff; b = bytes(i + 2) & 0xff
          i += 3
        } else if (b1 == 0xff) {
          if (i + 4 > bytes.length - 8) return None
          r = bytes(i) & 0xff; g = bytes(i + 1) & 0xff
          b = bytes(i + 2) & 0xff; a = bytes(i + 3) & 0xff
          i += 4
        } else (b1 >> 6) match {
          case 0 => // INDEX
            val s = (b1 & 0x3f) * 4
            r = idx(s); g = idx(s + 1); b = idx(s + 2); a = idx(s + 3)
          case 1 => // DIFF, wrapping
            r = (r + ((b1 >> 4) & 3) - 2) & 0xff
            g = (g + ((b1 >> 2) & 3) - 2) & 0xff
            b = (b + (b1 & 3) - 2) & 0xff
          case 2 => // LUMA, wrapping
            if (i + 1 > bytes.length - 8) return None
            val dg = (b1 & 0x3f) - 32
            val b2 = bytes(i) & 0xff; i += 1
            r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
            g = (g + dg) & 0xff
            b = (b + dg + (b2 & 0xf) - 8) & 0xff
          case _ => // RUN (0xfe/0xff already peeled above)
            run = (b1 & 0x3f) + 1
        }
        if (run == 1) {
          val s = hash(r, g, b, a) * 4
          idx(s) = r; idx(s + 1) = g; idx(s + 2) = b; idx(s + 3) = a
        }
        var k = 0
        while (k < run) {
          if (p >= n) return None // run overshoots the pixel budget
          val o = p * channels
          out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
          if (channels == 4) out(o + 3) = a.toByte
          p += 1; k += 1
        }
      }
      // end marker: exactly 7 zero bytes + 0x01
      if (i + 8 != bytes.length) return None
      var z = 0
      while (z < 7) { if (bytes(i + z) != 0) return None; z += 1 }
      if (bytes(i + 7) != 1) return None
      Some(ImageCodec.DecodedImage(width, height, channels, out))
    } catch { case _: Exception => None }

  /** Fixture encoder — the spec's greedy op chooser. `pixels` is
    * interleaved with `channels` ∈ {3, 4}.
    */
  def encode(width: Int, height: Int, channels: Int,
             pixels: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels $channels")
    require(pixels.length == width * height * channels, "pixel buffer size")
    val o = new ByteArrayOutputStream()
    o.write('q'); o.write('o'); o.write('i'); o.write('f')
    def be(v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    be(width); be(height); o.write(channels); o.write(0)
    val idx = new Array[Int](64 * 4)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var p = 0
    val n = width * height
    while (p < n) {
      val s = p * channels
      val r = pixels(s) & 0xff; val g = pixels(s + 1) & 0xff
      val b = pixels(s + 2) & 0xff
      val a = if (channels == 4) pixels(s + 3) & 0xff else pa
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62) { o.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { o.write(0xc0 | (run - 1)); run = 0 }
        val hp = hash(r, g, b, a) * 4
        if (idx(hp) == r && idx(hp + 1) == g && idx(hp + 2) == b &&
          idx(hp + 3) == a) {
          o.write(hp / 4)
        } else {
          idx(hp) = r; idx(hp + 1) = g; idx(hp + 2) = b; idx(hp + 3) = a
          if (a == pa) {
            // wrapping int8 deltas, exactly the reference arithmetic
            val vr = ((r - pr).toByte).toInt
            val vg = ((g - pg).toByte).toInt
            val vb = ((b - pb).toByte).toInt
            val vgr = ((vr - vg).toByte).toInt
            val vgb = ((vb - vg).toByte).toInt
            if (vr >= -2 && vr <= 1 && vg >= -2 && vg <= 1 &&
              vb >= -2 && vb <= 1) {
              o.write(0x40 | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2))
            } else if (vg >= -32 && vg <= 31 && vgr >= -8 && vgr <= 7 &&
              vgb >= -8 && vgb <= 7) {
              o.write(0x80 | (vg + 32)); o.write(((vgr + 8) << 4) | (vgb + 8))
            } else {
              o.write(0xfe); o.write(r); o.write(g); o.write(b)
            }
          } else {
            o.write(0xff); o.write(r); o.write(g); o.write(b); o.write(a)
          }
        }
      }
      pr = r; pg = g; pb = b; pa = a
      p += 1
    }
    if (run > 0) o.write(0xc0 | (run - 1))
    var z = 0
    while (z < 7) { o.write(0); z += 1 }
    o.write(1)
    o.toByteArray
  }
}
