package graft.ops

/** JVM-pure GIF decoder/encoder (first frame), completing the legacy
  * raster set next to [[ImageCodec]] (PNG/BMP/PNM) and [[JpegCodec]]:
  * GIF is the one remaining magic-byte family a web-crawl media column
  * actually contains in volume. Public-spec implementation
  * (GIF87a/GIF89a, CompuServe 1987/1989): logical screen descriptor,
  * global/local color table, sub-block framing, variable-width LZW
  * (3..12-bit codes, clear/EOI semantics, KwKwK case, deferred-clear
  * tolerance), and interlaced row order (pass starts 0/4/2/1, steps
  * 8/8/4/2).
  *
  * Contract matches the sibling codecs: `decode` returns None on any
  * malformed stream — length-field bombs are rejected before
  * allocation, a corrupt blob can never kill a stage. GIF is lossless
  * over palette indices, so (unlike JPEG) decoded PIXELS are
  * bit-exact and oracle-checkable, like PNG.
  *
  * Scope (documented, spec-pinned): first image frame only (animation
  * = repeated image blocks; a training-data pipeline wants frame 0 as
  * the thumbnail), transparency index ignored (output is opaque RGB),
  * extensions skipped per framing rules.
  */
object GifCodec {

  import ImageCodec.DecodedImage

  /** Same pre-allocation guard as ImageCodec. */
  private val MaxPixelBytes: Int = 64 << 20

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decode(b: Array[Byte]): Option[DecodedImage] =
    try {
      if (!isGif(b) || b.length < 14) return None
      var off = 6
      // logical screen descriptor (7 bytes); screen dims are advisory —
      // the frame's own descriptor carries the real dims.
      val packed = b(off + 4) & 0xff
      off += 7
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 0x07) + 1)
        if (off + 3 * n > b.length) return None
        gct = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
        off += 3 * n
      }
      // block stream: extensions until the first image descriptor
      while (off < b.length) {
        (b(off) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            off += 2
            while (off < b.length && b(off) != 0) off += 1 + (b(off) & 0xff)
            off += 1 // terminator
          case 0x2c => // image descriptor
            if (off + 10 > b.length) return None
            val w = le16(b, off + 5)
            val h = le16(b, off + 7)
            val ip = b(off + 9) & 0xff
            off += 10
            if (w <= 0 || h <= 0 || w.toLong * h * 3 > MaxPixelBytes) return None
            var pal = gct
            if ((ip & 0x80) != 0) {
              val n = 1 << ((ip & 0x07) + 1)
              if (off + 3 * n > b.length) return None
              pal = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
              off += 3 * n
            }
            if (pal == null) return None
            val interlaced = (ip & 0x40) != 0
            val minCodeSize = b(off) & 0xff
            off += 1
            if (minCodeSize < 2 || minCodeSize > 8) return None
            // concatenate data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while (off < b.length && b(off) != 0) {
              val len = b(off) & 0xff
              if (off + 1 + len > b.length) return None
              data.write(b, off + 1, len)
              off += 1 + len
            }
            val idx = lzwDecode(data.toByteArray, minCodeSize, w * h)
              .getOrElse(return None)
            val rowOrder =
              if (!interlaced) 0 until h
              else Seq((0, 8), (4, 8), (2, 4), (1, 2))
                .flatMap { case (start, step) => start until h by step }
            val npal = pal.length / 3
            val rgb = new Array[Byte](w * h * 3)
            var src = 0
            rowOrder.foreach { y =>
              var x = 0
              while (x < w) {
                val ci = idx(src) & 0xff
                if (ci >= npal) return None
                val d = (y * w + x) * 3
                rgb(d) = pal(ci * 3)
                rgb(d + 1) = pal(ci * 3 + 1)
                rgb(d + 2) = pal(ci * 3 + 2)
                src += 1
                x += 1
              }
            }
            return Some(DecodedImage(w, h, 3, rgb))
          case 0x3b => return None // trailer before any image
          case _ => return None    // unknown block type: malformed
        }
      }
      None
    } catch { case _: Exception => None }

  /** GIF-LZW decode: LSB-first variable-width codes. Returns exactly
    * `expected` indices or None (short data, bad code, oversize).
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    val out = new Array[Byte](expected)
    var n = 0
    var acc = 0L
    var bits = 0
    var pos = 0
    while (n < expected) {
      while (bits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << bits
        bits += 8
        pos += 1
      }
      if (bits < codeSize) return None // ran out of data
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      bits -= codeSize
      if (code == clear) {
        codeSize = minCodeSize + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        return if (n == expected) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a root
        out(n) = code.toByte; n += 1
        prev = code
      } else {
        if (code > next || code == clear || code == eoi) return None
        var top = 0
        var firstChar: Byte = 0
        if (code == next) {
          // KwKwK: string(prev) + firstChar(string(prev))
          var c = prev
          while (c >= clear) { stack(top) = suffix(c); top += 1; c = prefix(c) }
          firstChar = c.toByte
          stack(top) = firstChar; top += 1
          // string(prev) emitted root-first, then firstChar appended —
          // but stack(top-1..0) already holds string(prev) + firstChar
          // root-last, so one reversed walk emits the whole KwKwK string.
          // (stack top currently: firstChar, then string(prev) reversed)
          var i = top - 1
          while (i >= 0) {
            if (n >= expected) return None
            out(n) = stack(i); n += 1; i -= 1
          }
          if (n >= expected) return None
          out(n) = firstChar; n += 1
        } else {
          var c = code
          while (c >= clear) { stack(top) = suffix(c); top += 1; c = prefix(c) }
          firstChar = c.toByte
          stack(top) = firstChar; top += 1
          var i = top - 1
          while (i >= 0) {
            if (n >= expected) return None
            out(n) = stack(i); n += 1; i -= 1
          }
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstChar
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        } // else: deferred clear — stop growing, keep decoding
        prev = code
      }
    }
    Some(out)
  }

  /** Encode palette indices as a GIF89a stream. Exact: decode returns
    * pal[indices] byte-for-byte. LZW is emitted in "literal mode" —
    * root codes only, with a clear code every 250 literals so the code
    * width never leaves minCodeSize+1 (a classic spec-conforming
    * encoder shortcut; compression is not the point of a fixture
    * encoder).
    *
    * @param pal 3*n bytes, n a power of two in [2,256]
    */
  def encodeGif(w: Int, h: Int, pal: Array[Byte], indices: Array[Byte],
                interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h,
      s"bad dims ${w}x$h for ${indices.length} indices")
    val npal = pal.length / 3
    require(npal >= 2 && npal <= 256 && (npal & (npal - 1)) == 0 &&
      pal.length == npal * 3, s"palette size $npal must be a power of two")
    val palBits = 31 - Integer.numberOfLeadingZeros(npal) // log2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | ((palBits - 1) & 0x07) | 0x70) // GCT flag + size + color res
    out.write(0); out.write(0)                      // bg index, aspect
    out.write(pal)
    out.write(0x2c)                                 // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlaced) 0x40 else 0x00)
    val minCodeSize = math.max(2, palBits)
    out.write(minCodeSize)
    val rowOrder =
      if (!interlaced) 0 until h
      else Seq((0, 8), (4, 8), (2, 4), (1, 2))
        .flatMap { case (start, step) => start until h by step }
    val ordered = new Array[Byte](indices.length)
    var d = 0
    rowOrder.foreach { y =>
      System.arraycopy(indices, y * w, ordered, d, w)
      d += w
    }
    out.write(subBlocks(lzwEncodeLiteral(ordered, minCodeSize)))
    out.write(0x00)                                 // data terminator
    out.write(0x3b)                                 // trailer
    out.toByteArray
  }

  /** Literal-mode LZW: clear, then root codes at minCodeSize+1 bits,
    * re-clearing before the decoder's dictionary (`next`, which grows
    * by one per literal after a clear's first) can reach the
    * width-growth threshold 1<<(minCodeSize+1): after a clear plus k
    * literals next = clear+2+(k-1), so k is capped at clear-2 (min 1
    * for the degenerate 2-entry palette), keeping both sides at a
    * fixed code width. Then EOI.
    */
  private def lzwEncodeLiteral(indices: Array[Byte],
                               minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val codeSize = minCodeSize + 1
    val maxRun = math.max(1, clear - 2)
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var bits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << bits
      bits += codeSize
      while (bits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        bits -= 8
      }
    }
    emit(clear)
    var run = 0
    var i = 0
    while (i < indices.length) {
      if (run == maxRun) { emit(clear); run = 0 }
      emit(indices(i) & 0xff)
      run += 1
      i += 1
    }
    emit(eoi)
    if (bits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  private def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.toByteArray
  }
}
