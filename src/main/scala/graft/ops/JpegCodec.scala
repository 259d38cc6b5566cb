package graft.ops

import java.io.ByteArrayOutputStream

/** JVM-pure baseline-sequential JPEG codec (ITU-T T.81) — closes the
  * multimodal path's last stubbed format (`Multimodal.extractFeatures`
  * previously hash-stubbed JPEG payloads; the reference brief's decode
  * step covers crawl images, which are overwhelmingly JPEG).
  *
  * Decoder scope (spec-pinned): baseline DCT (SOF0) AND progressive
  * DCT (SOF2 — spectral selection + successive approximation, all four
  * scan kinds, EOB-run coding; the two dominant real-crawl JPEG
  * shapes), 8-bit precision, 1-component grayscale or 3-component
  * YCbCr with sampling factors up to 2×2 (covers 4:4:4, 4:2:2, 4:2:0),
  * restart markers, multi-table DQT/DHT segments, 16-bit quant tables,
  * APPn/COM skipping. Anything else (arithmetic coding, 12-bit,
  * CMYK, hierarchical) → None, never a throw — same contract as
  * [[ImageCodec.decode]]: one corrupt payload in a 100 TB corpus must
  * degrade, not kill the stage.
  *
  * Encoder (fixtures + the synthetic-media adapter): baseline, Annex K
  * quantization tables scaled by the classic libjpeg quality curve and
  * Annex K Huffman tables, 4:4:4 / 4:2:0 / grayscale. Lossy by nature,
  * so round-trip specs compare with tolerance; MultimodalSpec also
  * cross-checks BOTH directions against the JDK's own independent
  * ImageIO JPEG codec (encode here → ImageIO decode, ImageIO encode →
  * decode here), which pins the zigzag order, table layout, DCT
  * convention and color math against an implementation that shares no
  * code with this one.
  *
  * All tables below are the published ITU-T T.81 Annex K examples
  * (public standard text).
  */
object JpegCodec {

  import ImageCodec.DecodedImage

  private val MaxPixelBytes: Int = 64 << 20

  /** zigzag sequence position -> natural (row-major) index. */
  private val ZigNat: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K tables ----------------------------------------------------

  private val LumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val ChromQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray

  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  // ---- shared IDCT/DCT basis --------------------------------------------

  /** cosT(x)(u) = C(u)/2 · cos((2x+1)uπ/16). */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  // =======================================================================
  // Decoder
  // =======================================================================

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical code construction (T.81 C.2): mincode/maxcode/valptr
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = vals(idx) & 0xff
    def size: Int = vals.length
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var hitMarker = false // stopped at a non-RST marker (e.g. EOI)

    /** Next bit, or -1 on exhausted/marker-terminated stream. */
    def bit(): Int = {
      if (bitCnt == 0) {
        if (pos >= b.length) return -1
        var by = b(pos) & 0xff
        pos += 1
        if (by == 0xff) {
          if (pos >= b.length) return -1
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed byte
          else { hitMarker = true; pos -= 1; return -1 }
          by = 0xff
        }
        bitBuf = by; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bt = bit()
        if (bt < 0) return -1
        v = (v << 1) | bt
        i += 1
      }
      v
    }

    /** Align to byte boundary and consume an expected RSTn marker. */
    def restart(): Boolean = {
      bitCnt = 0
      hitMarker = false
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val bt = bit()
        if (bt < 0) return -1
        code = (code << 1) | bt
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) {
          val idx = t.valPtr(l) + code - t.minCode(l)
          if (idx < 0 || idx >= t.size) return -1
          return t.value(idx)
        }
        l += 1
      }
      -1
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Separable 8×8 inverse DCT over natural-order dequantized
    * coefficients; writes level-shifted clamped samples. Shared by the
    * baseline streaming path and the progressive finalize pass, so the
    * two paths cannot drift in DCT convention.
    */
  private def idct8x8(coef: Array[Double], tmp: Array[Double],
                      out: Array[Int]): Unit = {
    // tmp(u)(y) = sum_v CosT(y)(v) * coef(u*8+v)  [u = row index]
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += CosT(y)(v) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var uu = 0
        while (uu < 8) { acc += CosT(x)(uu) * tmp(uu * 8 + y); uu += 1 }
        val px = math.round(acc + 128.0).toInt
        out(x * 8 + y) = if (px < 0) 0 else if (px > 255) 255 else px
        y += 1
      }
      x += 1
    }
  }

  /** Crop + upsample (nearest) + color conversion from component
    * planes to the packed output — shared by both decode paths.
    */
  private def assemble(comps: Array[Component], planes: Array[Array[Byte]],
                       planeW: Array[Int], w: Int, h: Int,
                       hmax: Int, vmax: Int): DecodedImage =
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w)
        y += 1
      }
      DecodedImage(w, h, 1, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      val yPlane = planes(0); val cbPlane = planes(1); val crPlane = planes(2)
      val yW = planeW(0)
      val cbW = planeW(1); val crW = planeW(2)
      val c0 = comps(0); val c1 = comps(1); val c2 = comps(2)
      var y = 0
      while (y < h) {
        val yRow = y * c0.v / vmax
        val cbRow = y * c1.v / vmax
        val crRow = y * c2.v / vmax
        var x = 0
        while (x < w) {
          val Y = yPlane(yRow * yW + (x * c0.h / hmax)) & 0xff
          val cb = (cbPlane(cbRow * cbW + (x * c1.h / hmax)) & 0xff) - 128
          val cr = (crPlane(crRow * crW + (x * c2.h / hmax)) & 0xff) - 128
          val r = math.round(Y + 1.402 * cr).toInt
          val g = math.round(Y - 0.344136 * cb - 0.714136 * cr).toInt
          val bl = math.round(Y + 1.772 * cb).toInt
          val o = (y * w + x) * 3
          out(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(o + 2) = (if (bl < 0) 0 else if (bl > 255) 255 else bl).toByte
          x += 1
        }
        y += 1
      }
      DecodedImage(w, h, 3, out)
    }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    try decodeImpl(bytes)
    catch { case _: Exception => None }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Parse a DHT segment payload [start, end) into the table slots;
    * false on any structural corruption. Shared by both decode paths.
    */
  private def parseDhtPayload(b: Array[Byte], start: Int, end: Int,
      dcTables: Array[HuffTable], acTables: Array[HuffTable]): Boolean = {
    var o = start
    while (o < end) {
      val tcth = b(o) & 0xff
      val tc = tcth >> 4; val th = tcth & 0xf
      if (tc > 1 || th > 3 || o + 17 > end) return false
      val bits = new Array[Int](17)
      var total = 0
      var l = 1
      while (l <= 16) { bits(l) = b(o + l) & 0xff; total += bits(l); l += 1 }
      if (total > 256 || o + 17 + total > end) return false
      val vals = new Array[Byte](total)
      System.arraycopy(b, o + 17, vals, 0, total)
      val t = new HuffTable(bits, vals)
      if (tc == 0) dcTables(th) = t else acTables(th) = t
      o += 17 + total
    }
    true
  }

  /** Parse a DQT segment payload [start, end) into the quant slots
    * (zigzag order, as written); false on corruption. Shared by both
    * decode paths.
    */
  private def parseDqtPayload(b: Array[Byte], start: Int, end: Int,
      quant: Array[Array[Int]], quantSeen: Array[Boolean]): Boolean = {
    var o = start
    while (o < end) {
      val pqtq = b(o) & 0xff
      val pq = pqtq >> 4; val tq = pqtq & 0xf
      if (pq > 1 || tq > 3) return false
      val n = if (pq == 0) 64 else 128
      if (o + 1 + n > end) return false
      var k = 0
      while (k < 64) {
        quant(tq)(k) =
          if (pq == 0) b(o + 1 + k) & 0xff
          else be16(b, o + 1 + 2 * k)
        k += 1
      }
      quantSeen(tq) = true
      o += 1 + n
    }
    true
  }

  private def decodeImpl(b: Array[Byte]): Option[DecodedImage] = {
    if (!isJpeg(b)) return None
    var pos = 2
    val quant = Array.ofDim[Int](4, 64) // zigzag order, as written
    val quantSeen = new Array[Boolean](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var sosAt = -1

    // ---- marker scan up to SOS ----
    while (sosAt < 0) {
      // tolerate fill bytes (T.81 allows repeated FF before a marker)
      while (pos < b.length && (b(pos) & 0xff) != 0xff) return None
      while (pos < b.length && (b(pos) & 0xff) == 0xff) pos += 1
      if (pos >= b.length) return None
      val marker = b(pos) & 0xff
      pos += 1
      marker match {
        case 0xd8 => // stray SOI — ignore
        case 0xd9 => return None // EOI before any scan
        case 0xc0 => // SOF0 baseline
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length || len < 8) return None
          val precision = b(pos + 2) & 0xff
          h = be16(b, pos + 3); w = be16(b, pos + 5)
          val nc = b(pos + 7) & 0xff
          if (precision != 8 || w <= 0 || h <= 0) return None
          if (nc != 1 && nc != 3) return None
          if (w.toLong * h * nc > MaxPixelBytes) return None
          if (len < 8 + 3 * nc) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val cid = b(o) & 0xff
            val hv = b(o + 1) & 0xff
            Component(cid, hv >> 4, hv & 0xf, b(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3))
            return None
          pos += len
        case 0xc2 => // SOF2 progressive: restart the parse on that path
          return decodeProgressiveImpl(b)
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // extended/arithmetic/lossless: out of scope
        case 0xc4 => // DHT (possibly several tables)
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length) return None
          if (!parseDhtPayload(b, pos + 2, pos + len, dcTables, acTables))
            return None
          pos += len
        case 0xdb => // DQT (possibly several tables)
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length) return None
          if (!parseDqtPayload(b, pos + 2, pos + len, quant, quantSeen))
            return None
          pos += len
        case 0xdd => // DRI
          if (pos + 4 > b.length) return None
          val len = be16(b, pos)
          if (len != 4) return None
          restartInterval = be16(b, pos + 2)
          pos += len
        case 0xda => // SOS
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length || comps == null) return None
          val ns = b(pos + 2) & 0xff
          if (ns != comps.length || len < 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cs = b(pos + 3 + 2 * i) & 0xff
            val tt = b(pos + 4 + 2 * i) & 0xff
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.dcTable = tt >> 4
            comp.acTable = tt & 0xf
            if (comp.dcTable > 3 || comp.acTable > 3) return None
            i += 1
          }
          sosAt = pos + len
        case 0x01 => // TEM, no payload
        case m if m >= 0xd0 && m <= 0xd7 => // RST outside scan: ignore
        case _ => // APPn, COM, everything else: skip by length
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (len < 2 || pos + len > b.length) return None
          pos += len
      }
    }

    // ---- validate tables present ----
    for (c <- comps) {
      if (!quantSeen(c.tq)) return None
      if (dcTables(c.dcTable) == null || acTables(c.acTable) == null) return None
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH

    // per-component planes at component resolution (padded to MCU grid)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(comps.length) { i =>
      new Array[Byte](planeW(i) * planeH(i))
    }

    val reader = new BitReader(b, sosAt)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    val blockOut = new Array[Int](64)

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!reader.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        val dcT = dcTables(c.dcTable)
        val acT = acTables(c.acTable)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // ---- decode one block ----
            java.util.Arrays.fill(coef, 0.0)
            val t = reader.decodeHuff(dcT)
            if (t < 0 || t > 15) return None
            val diffBits = reader.receive(t)
            if (diffBits < 0 && t > 0) return None
            dcPred(ci) += extend(diffBits, t)
            coef(0) = dcPred(ci).toDouble * qt(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = reader.decodeHuff(acT)
              if (rs < 0) return None
              val r = rs >> 4; val s = rs & 0xf
              if (s == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return None
                val vr = reader.receive(s)
                if (vr < 0) return None
                coef(ZigNat(k)) = extend(vr, s).toDouble * qt(k)
                k += 1
              }
            }
            // ---- IDCT (separable, double) ----
            idct8x8(coef, tmp, blockOut)
            // ---- place block in component plane ----
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((py0 + yy) * pw + (px0 + xx)) =
                  blockOut(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // ---- color convert + crop + upsample (nearest) ----
    Some(assemble(comps, planes, planeW, w, h, hmax, vmax))
  }

  // =======================================================================
  // Progressive decoder (SOF2, ITU-T T.81 Annex G, Huffman coding)
  // =======================================================================

  /** Progressive JPEG: the stream carries MULTIPLE scans, each covering
    * a spectral band (Ss..Se) at a bit precision (successive
    * approximation Ah→Al), so decoding is two-phase — accumulate raw
    * coefficients across scans into a per-component buffer, then
    * dequantize + IDCT once at the end. All four scan kinds are
    * implemented: DC first / DC refine (raw-bit), AC first / AC refine
    * (with EOB-run coding, the progressive-only Huffman extension).
    * Interleaved MCU order for multi-component (DC) scans,
    * per-component block order for the single-component AC scans T.81
    * mandates, restart markers in both. Same outer contract as the
    * baseline path: structural corruption → None, never a throw, and
    * the coefficient buffer is bounded BEFORE allocation. Truncation
    * tolerance mirrors GifCodec: a payload cut off mid-stream still
    * decodes from the scans that completed (progressive's defining
    * property — every prefix is a coarser image), as long as at least
    * one scan landed.
    */
  private def decodeProgressiveImpl(b: Array[Byte]): Option[DecodedImage] = {
    var pos = 2
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var hmax = 0; var vmax = 0
    var mcusX = 0; var mcusY = 0
    // per component: raw (un-dequantized) coefficients in ZIGZAG order,
    // blocks row-major over the MCU-padded grid, 64 ints per block
    var coefs: Array[Array[Int]] = null
    var blocksPerRow: Array[Int] = null
    var scansDone = 0

    def finalizeImage(): Option[DecodedImage] = {
      if (comps == null || scansDone == 0) return None
      for (c <- comps) if (!quantSeen(c.tq)) return None
      val planeW = comps.map(c => mcusX * c.h * 8)
      val planeH = comps.map(c => mcusY * c.v * 8)
      val planes = Array.tabulate(comps.length) { i =>
        new Array[Byte](planeW(i) * planeH(i))
      }
      val coefD = new Array[Double](64)
      val tmp = new Array[Double](64)
      val blockOut = new Array[Int](64)
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        val bw = blocksPerRow(ci)
        val bh = mcusY * c.v
        val cf = coefs(ci)
        var row = 0
        while (row < bh) {
          var colB = 0
          while (colB < bw) {
            val base = (row * bw + colB) * 64
            java.util.Arrays.fill(coefD, 0.0)
            var k = 0
            while (k < 64) {
              val v = cf(base + k)
              if (v != 0) coefD(ZigNat(k)) = v.toDouble * qt(k)
              k += 1
            }
            idct8x8(coefD, tmp, blockOut)
            val px0 = colB * 8
            val py0 = row * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((py0 + yy) * pw + (px0 + xx)) =
                  blockOut(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            colB += 1
          }
          row += 1
        }
        ci += 1
      }
      Some(assemble(comps, planes, planeW, w, h, hmax, vmax))
    }

    /** Decode one scan's entropy data; returns the position of the
      * next marker, or -1 on corruption, or -2 on truncation (caller
      * finalizes what accumulated).
      */
    def runScan(scanComp: Array[Int], dcSel: Array[Int], acSel: Array[Int],
                ss: Int, se: Int, ah: Int, al: Int, start: Int): Int = {
      val reader = new BitReader(b, start)
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      val p1 = 1 << al
      val m1 = -1 << al

      def refineNonzero(cf: Array[Int], idx: Int): Boolean = {
        val cb = reader.bit()
        if (cb < 0) return false
        if (cb == 1 && (cf(idx) & p1) == 0)
          cf(idx) += (if (cf(idx) >= 0) p1 else m1)
        true
      }

      def decodeBlock(si: Int, ci: Int, blockIdx: Int): Boolean = {
        val cf = coefs(ci)
        val base = blockIdx * 64
        if (ss == 0) {
          if (ah == 0) { // DC first
            val t = reader.decodeHuff(dcTables(dcSel(si)))
            if (t < 0 || t > 15) return false
            var diff = 0
            if (t > 0) {
              val v = reader.receive(t)
              if (v < 0) return false
              diff = extend(v, t)
            }
            dcPred(ci) += diff
            cf(base) = dcPred(ci) << al
          } else { // DC refine: one raw bit per block
            val bit = reader.bit()
            if (bit < 0) return false
            if (bit == 1) cf(base) |= p1
          }
          true
        } else if (ah == 0) { // AC first
          if (eobrun > 0) { eobrun -= 1; return true }
          var k = ss
          while (k <= se) {
            val rs = reader.decodeHuff(acTables(acSel(si)))
            if (rs < 0) return false
            val r = rs >> 4; val s = rs & 0xf
            if (s == 0) {
              if (r == 15) k += 16
              else {
                eobrun = (1 << r) - 1
                if (r > 0) {
                  val e = reader.receive(r)
                  if (e < 0) return false
                  eobrun += e
                }
                return true
              }
            } else {
              k += r
              if (k > se) return false
              val v = reader.receive(s)
              if (v < 0) return false
              cf(base + k) = extend(v, s) << al
              k += 1
            }
          }
          true
        } else { // AC refine (T.81 G.1.2.3 correction-bit walk)
          var k = ss
          if (eobrun == 0) {
            var toEob = false
            while (k <= se && !toEob) {
              val rs = reader.decodeHuff(acTables(acSel(si)))
              if (rs < 0) return false
              var r = rs >> 4; val s = rs & 0xf
              var newVal = 0
              if (s == 0) {
                if (r < 15) {
                  // NOTE the off-by-one vs AC-first: the run count here
                  // INCLUDES the current block, whose band tail still
                  // takes correction bits below before the decrement
                  eobrun = 1 << r
                  if (r > 0) {
                    val e = reader.receive(r)
                    if (e < 0) return false
                    eobrun += e
                  }
                  toEob = true
                }
                // r == 15: ZRL — pass over 16 zero-HISTORY positions
              } else {
                if (s != 1) return false // refine can only create ±1<<Al
                val sb = reader.bit()
                if (sb < 0) return false
                newVal = if (sb == 1) p1 else m1
              }
              if (!toEob) {
                // advance: nonzero-history coefs take a correction bit
                // (and do NOT consume r); zero-history ones count down
                // r, the (r+1)-th receives the new value (if any)
                var placed = false
                while (k <= se && !placed) {
                  val idx = base + k
                  if (cf(idx) != 0) {
                    if (!refineNonzero(cf, idx)) return false
                  } else if (r == 0) {
                    if (newVal != 0) cf(idx) = newVal
                    placed = true
                  } else r -= 1
                  k += 1
                }
                if (!placed && newVal != 0) return false // ran off band
              }
            }
          }
          if (eobrun > 0) {
            // EOB run covers the REST of this band, but correction
            // bits still flow for already-nonzero coefficients
            while (k <= se) {
              val idx = base + k
              if (cf(idx) != 0 && !refineNonzero(cf, idx)) return false
              k += 1
            }
            eobrun -= 1
          }
          true
        }
      }

      var ok = true
      var truncated = false
      if (scanComp.length > 1) { // interleaved (DC scans)
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total && ok) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!reader.restart()) { ok = false; truncated = true }
            java.util.Arrays.fill(dcPred, 0)
            eobrun = 0
          }
          if (ok) {
            val mx = mcu % mcusX
            val my = mcu / mcusX
            var si = 0
            while (si < scanComp.length && ok) {
              val ci = scanComp(si)
              val c = comps(ci)
              var by = 0
              while (by < c.v && ok) {
                var bx = 0
                while (bx < c.h && ok) {
                  ok = decodeBlock(si, ci,
                    (my * c.v + by) * blocksPerRow(ci) + (mx * c.h + bx))
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
          }
          mcu += 1
        }
      } else { // non-interleaved: component block order, unpadded dims
        val ci = scanComp(0)
        val c = comps(ci)
        val bw = ((w * c.h + hmax - 1) / hmax + 7) / 8
        val bh = ((h * c.v + vmax - 1) / vmax + 7) / 8
        var blk = 0
        val total = bw * bh
        while (blk < total && ok) {
          if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
            if (!reader.restart()) { ok = false; truncated = true }
            java.util.Arrays.fill(dcPred, 0)
            eobrun = 0
          }
          if (ok)
            ok = decodeBlock(0, ci, (blk / bw) * blocksPerRow(ci) + blk % bw)
          blk += 1
        }
      }
      if (!ok)
        return if (truncated || reader.pos >= b.length) -2 else -1
      // drain pad bits / stray bytes up to the next marker
      while (!reader.hitMarker && reader.bit() >= 0) {}
      if (reader.hitMarker) reader.pos else b.length
    }

    // ---- marker loop over the whole stream ----
    while (true) {
      while (pos < b.length && (b(pos) & 0xff) != 0xff)
        return if (scansDone > 0) finalizeImage() else None
      while (pos < b.length && (b(pos) & 0xff) == 0xff) pos += 1
      if (pos >= b.length)
        return if (scansDone > 0) finalizeImage() else None
      val marker = b(pos) & 0xff
      pos += 1
      marker match {
        case 0xd8 => // stray SOI — ignore
        case 0xd9 => // EOI: the stream is complete
          return finalizeImage()
        case 0xc2 => // SOF2
          if (comps != null) return None // second frame: corrupt
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length || len < 8) return None
          val precision = b(pos + 2) & 0xff
          h = be16(b, pos + 3); w = be16(b, pos + 5)
          val nc = b(pos + 7) & 0xff
          if (precision != 8 || w <= 0 || h <= 0) return None
          if (nc != 1 && nc != 3) return None
          if (w.toLong * h * nc > MaxPixelBytes) return None
          if (len < 8 + 3 * nc) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val cid = b(o) & 0xff
            val hv = b(o + 1) & 0xff
            Component(cid, hv >> 4, hv & 0xf, b(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3))
            return None
          hmax = comps.map(_.h).max
          vmax = comps.map(_.v).max
          mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          // coefficient-buffer bound BEFORE allocation (frame-bomb
          // discipline): padded planes are ≤ (w+15)(h+15) per
          // component, ints are 4 bytes — cap the total at 4×
          // MaxPixelBytes so a crafted SOF cannot allocate past the
          // same order of memory the baseline path is allowed
          val totalBlocks = comps.map(c =>
            (mcusX * c.h).toLong * (mcusY * c.v)).sum
          if (totalBlocks * 64L * 4L > 4L * MaxPixelBytes) return None
          blocksPerRow = comps.map(c => mcusX * c.h)
          coefs = comps.map(c => new Array[Int](mcusX * c.h * mcusY * c.v * 64))
          pos += len
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc2 && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // a second, non-progressive frame: corrupt
        case 0xc4 =>
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length) return None
          if (!parseDhtPayload(b, pos + 2, pos + len, dcTables, acTables))
            return None
          pos += len
        case 0xdb =>
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length) return None
          if (!parseDqtPayload(b, pos + 2, pos + len, quant, quantSeen))
            return None
          pos += len
        case 0xdd =>
          if (pos + 4 > b.length) return None
          val len = be16(b, pos)
          if (len != 4) return None
          restartInterval = be16(b, pos + 2)
          pos += len
        case 0xda => // SOS: one progressive scan
          if (comps == null) return None
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (pos + len > b.length) return None
          val ns = b(pos + 2) & 0xff
          if (ns < 1 || ns > comps.length || len < 6 + 2 * ns) return None
          val scanComp = new Array[Int](ns)
          val dcSel = new Array[Int](ns)
          val acSel = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = b(pos + 3 + 2 * i) & 0xff
            val tt = b(pos + 4 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) return None
            scanComp(i) = ci
            dcSel(i) = tt >> 4
            acSel(i) = tt & 0xf
            if (dcSel(i) > 3 || acSel(i) > 3) return None
            i += 1
          }
          val ssB = b(pos + 3 + 2 * ns) & 0xff
          val seB = b(pos + 4 + 2 * ns) & 0xff
          val ahal = b(pos + 5 + 2 * ns) & 0xff
          val ah = ahal >> 4; val al = ahal & 0xf
          // T.81 scan-header constraints: DC band is exactly 0..0, AC
          // bands are 1..63 single-component; approximation shifts ≤13
          if (ssB > 63 || seB > 63 || seB < ssB) return None
          if (ssB == 0 && seB != 0) return None
          if (ssB > 0 && ns != 1) return None
          if (ah > 13 || al > 13 || (ah != 0 && ah != al + 1)) return None
          // table presence per scan kind (DC refine needs none)
          i = 0
          while (i < ns) {
            if (ssB == 0 && ah == 0 && dcTables(dcSel(i)) == null) return None
            if (ssB > 0 && acTables(acSel(i)) == null) return None
            i += 1
          }
          val next = runScan(scanComp, dcSel, acSel, ssB, seB, ah, al,
            pos + len)
          if (next == -1) return None
          if (next == -2) // truncated mid-scan: keep COMPLETE scans only
            return if (scansDone > 0) finalizeImage() else None
          scansDone += 1
          pos = next
        case 0x01 => // TEM, no payload
        case m if m >= 0xd0 && m <= 0xd7 => // RST outside scan: ignore
        case _ =>
          if (pos + 2 > b.length) return None
          val len = be16(b, pos)
          if (len < 2 || pos + len > b.length) return None
          pos += len
      }
    }
    None // unreachable
  }

  // =======================================================================
  // Encoder
  // =======================================================================

  /** libjpeg's classic quality → table scaling (public knowledge). */
  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  private final class HuffEncTable(bits: Array[Int], vals: Array[Byte]) {
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l)) {
          codeOf(vals(k) & 0xff) = code
          sizeOf(vals(k) & 0xff) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1s (T.81 F.1.2.3)
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf & 0xff)
      if ((buf & 0xff) == 0xff) out.write(0x00)
      buf = 0; cnt = 0
    }
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Forward DCT + quantize: in natural-order pixels (level-shifted),
    * out quantized coefficients in ZIGZAG order.
    */
  private def fdctQuant(block: Array[Double], qtZig: Array[Int],
                        outZig: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // tmp(u)(y) = sum_x CosT(x)(u) * block(x*8+y)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += CosT(x)(u) * block(x * 8 + y); x += 1 }
        tmp(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    var uu = 0
    while (uu < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) { acc += CosT(y)(v) * tmp(uu * 8 + y); y += 1 }
        coef(uu * 8 + v) = acc
        v += 1
      }
      uu += 1
    }
    var k = 0
    while (k < 64) {
      outZig(k) = math.round(coef(ZigNat(k)) / qtZig(k)).toInt
      k += 1
    }
  }

  private def encodeBlock(bw: BitWriter, zig: Array[Int], dcPred: Int,
                          dcT: HuffEncTable, acT: HuffEncTable): Int = {
    val diff = zig(0) - dcPred
    val s = magnitude(diff)
    bw.write(dcT.codeOf(s), dcT.sizeOf(s))
    if (s > 0) {
      val v = if (diff < 0) diff + (1 << s) - 1 else diff
      bw.write(v, s)
    }
    var run = 0
    var k = 1
    while (k < 64) {
      if (zig(k) == 0) run += 1
      else {
        while (run > 15) { bw.write(acT.codeOf(0xf0), acT.sizeOf(0xf0)); run -= 16 }
        val ss = magnitude(zig(k))
        val rs = (run << 4) | ss
        bw.write(acT.codeOf(rs), acT.sizeOf(rs))
        val v = if (zig(k) < 0) zig(k) + (1 << ss) - 1 else zig(k)
        bw.write(v, ss)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.write(acT.codeOf(0x00), acT.sizeOf(0x00)) // EOB
    zig(0)
  }

  private def writeBe16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeSegment(out: ByteArrayOutputStream, marker: Int,
                           body: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    writeBe16(out, body.length + 2)
    body.foreach(b => out.write(b & 0xff))
  }

  /** Baseline JPEG encode. `subsample420` picks 4:2:0 (2×2 Y sampling,
    * box-averaged chroma) vs 4:4:4. `rgb` is w*h*3 interleaved.
    */
  def encodeJpeg(w: Int, h: Int, rgb: Array[Byte], quality: Int = 85,
                 subsample420: Boolean = false): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb must be w*h*3 bytes")
    val lq = scaledQuant(LumQuant, quality)
    val cq = scaledQuant(ChromQuant, quality)
    val lqZig = Array.tabulate(64)(k => lq(ZigNat(k)))
    val cqZig = Array.tabulate(64)(k => cq(ZigNat(k)))

    // component planes as doubles, level-shifted
    val n = w * h
    val yP = new Array[Double](n)
    val cbP = new Array[Double](n)
    val crP = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
      cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
      crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }

    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 JFIF
    writeSegment(out, 0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (lum), table 1 (chrom), zigzag order
    writeSegment(out, 0xdb, 0 +: lqZig)
    writeSegment(out, 0xdb, 1 +: cqZig)
    // SOF0
    val (yh, yv) = if (subsample420) (2, 2) else (1, 1)
    writeSegment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 3,
      1, (yh << 4) | yv, 0,
      2, 0x11, 1,
      3, 0x11, 1))
    // DHT × 4
    def dhtBody(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Array[Int] =
      ((tc << 4) | th) +: (bits.drop(1) ++ vals.map(_ & 0xff))
    writeSegment(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    writeSegment(out, 0xc4, dhtBody(1, 0, AcLumBits, AcLumVals))
    writeSegment(out, 0xc4, dhtBody(0, 1, DcChromBits, DcChromVals))
    writeSegment(out, 0xc4, dhtBody(1, 1, AcChromBits, AcChromVals))
    // SOS
    writeSegment(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw = new BitWriter(out)
    val dcLum = new HuffEncTable(DcLumBits, DcLumVals)
    val acLum = new HuffEncTable(AcLumBits, AcLumVals)
    val dcChrom = new HuffEncTable(DcChromBits, DcChromVals)
    val acChrom = new HuffEncTable(AcChromBits, AcChromVals)
    val block = new Array[Double](64)
    val zig = new Array[Int](64)

    // edge-replicating plane sampler
    @inline def sample(p: Array[Double], x: Int, y: Int): Double =
      p(math.min(h - 1, y) * w + math.min(w - 1, x))

    def loadBlock(p: Array[Double], x0: Int, y0: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          block(yy * 8 + xx) = sample(p, x0 + xx, y0 + yy)
          xx += 1
        }
        yy += 1
      }
    }

    var dcY = 0; var dcCb = 0; var dcCr = 0
    if (!subsample420) {
      val mcusX = (w + 7) / 8
      val mcusY = (h + 7) / 8
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          loadBlock(yP, mx * 8, my * 8)
          fdctQuant(block, lqZig, zig)
          dcY = encodeBlock(bw, zig, dcY, dcLum, acLum)
          loadBlock(cbP, mx * 8, my * 8)
          fdctQuant(block, cqZig, zig)
          dcCb = encodeBlock(bw, zig, dcCb, dcChrom, acChrom)
          loadBlock(crP, mx * 8, my * 8)
          fdctQuant(block, cqZig, zig)
          dcCr = encodeBlock(bw, zig, dcCr, dcChrom, acChrom)
          mx += 1
        }
        my += 1
      }
    } else {
      // 4:2:0 — MCU 16×16: 4 Y blocks + 1 Cb + 1 Cr (box-averaged 2×2)
      val mcusX = (w + 15) / 16
      val mcusY = (h + 15) / 16
      def loadSub(p: Array[Double], x0: Int, y0: Int): Unit = {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sx = x0 + xx * 2; val sy = y0 + yy * 2
            block(yy * 8 + xx) = (sample(p, sx, sy) + sample(p, sx + 1, sy) +
              sample(p, sx, sy + 1) + sample(p, sx + 1, sy + 1)) / 4.0
            xx += 1
          }
          yy += 1
        }
      }
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              loadBlock(yP, mx * 16 + bx * 8, my * 16 + by * 8)
              fdctQuant(block, lqZig, zig)
              dcY = encodeBlock(bw, zig, dcY, dcLum, acLum)
              bx += 1
            }
            by += 1
          }
          loadSub(cbP, mx * 16, my * 16)
          fdctQuant(block, cqZig, zig)
          dcCb = encodeBlock(bw, zig, dcCb, dcChrom, acChrom)
          loadSub(crP, mx * 16, my * 16)
          fdctQuant(block, cqZig, zig)
          dcCr = encodeBlock(bw, zig, dcCr, dcChrom, acChrom)
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Baseline grayscale JPEG encode. `gray` is w*h bytes. */
  def encodeJpegGray(w: Int, h: Int, gray: Array[Byte],
                     quality: Int = 85): Array[Byte] = {
    require(gray.length == w * h, "gray must be w*h bytes")
    val lq = scaledQuant(LumQuant, quality)
    val lqZig = Array.tabulate(64)(k => lq(ZigNat(k)))
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    writeSegment(out, 0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xdb, 0 +: lqZig)
    writeSegment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0))
    def dhtBody(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Array[Int] =
      ((tc << 4) | th) +: (bits.drop(1) ++ vals.map(_ & 0xff))
    writeSegment(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    writeSegment(out, 0xc4, dhtBody(1, 0, AcLumBits, AcLumVals))
    writeSegment(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    val dcLum = new HuffEncTable(DcLumBits, DcLumVals)
    val acLum = new HuffEncTable(AcLumBits, AcLumVals)
    val block = new Array[Double](64)
    val zig = new Array[Int](64)
    var dc = 0
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sx = math.min(w - 1, mx * 8 + xx)
            val sy = math.min(h - 1, my * 8 + yy)
            block(yy * 8 + xx) = (gray(sy * w + sx) & 0xff) - 128.0
            xx += 1
          }
          yy += 1
        }
        fdctQuant(block, lqZig, zig)
        dc = encodeBlock(bw, zig, dc, dcLum, acLum)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
