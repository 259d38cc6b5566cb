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
  * Two decode surfaces: [[decode]] (first frame only, transparency
  * ignored — the thumbnail path, oracle-pinned since r6a) and
  * [[decodeFrames]] (full animation: graphic-control extensions,
  * per-frame delay/disposal/transparency, canvas composition — the
  * real video-frame source for the frame-sampling pipeline).
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
    requireIndicesInRange(indices, npal)
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

  /** Every index must address the palette: an out-of-range index is
    * not merely a wrong color — `lzwEncodeLiteral` would emit it as a
    * literal WIDER than the code size, smearing bits into subsequent
    * codes and producing a structurally-plausible but undecodable
    * stream. Fail fast instead.
    */
  private def requireIndicesInRange(indices: Array[Byte], npal: Int): Unit = {
    var i = 0
    while (i < indices.length) {
      val v = indices(i) & 0xff
      require(v < npal, s"palette index $v at position $i >= palette size $npal")
      i += 1
    }
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

  /** One decoded animation frame: the FULL logical-screen canvas after
    * compositing this frame (what a video pipeline samples), plus the
    * frame's graphic-control timing/disposal facts.
    */
  case class GifFrame(frameIdx: Int, delayCs: Int, disposal: Int,
                      canvas: DecodedImage)

  /** Full animated decode (GIF89a animation = repeated image blocks,
    * each optionally preceded by a graphic control extension): walks
    * every image block, composites onto the logical-screen canvas at
    * the frame's (left, top) rect honoring the transparent index, and
    * snapshots the canvas per frame — the composited sequence a video
    * frame-sampler consumes, not the raw partial rects.
    *
    * Disposal semantics (GIF89a spec §23): 0/1 leave the canvas; 2
    * restores the frame rect to the background color; 3 restores the
    * canvas to its pre-frame state. The canvas is opaque RGB (like the
    * sibling codecs), so "background" is the global-palette background
    * color when one exists, else black.
    *
    * Tolerance contract: malformed before the FIRST frame completes →
    * None (same as [[decode]]); truncation or corruption after ≥1
    * complete frame returns the frames decoded so far — a half-fetched
    * animation still yields its leading frames, mirroring
    * [[AudioCodec]]'s truncated-data tolerance. `maxFrames` bounds
    * output memory against frame-bomb payloads.
    */
  def decodeFrames(b: Array[Byte],
                   maxFrames: Int = 1024): Option[Vector[GifFrame]] =
    try {
      if (!isGif(b) || b.length < 14) return None
      var off = 6
      val cw = le16(b, off)
      val ch = le16(b, off + 2)
      val packed = b(off + 4) & 0xff
      val bgIdx = b(off + 5) & 0xff
      off += 7
      if (cw <= 0 || ch <= 0 || cw.toLong * ch * 3 > MaxPixelBytes) return None
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 0x07) + 1)
        if (off + 3 * n > b.length) return None
        gct = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
        off += 3 * n
      }
      val canvas = new Array[Byte](cw * ch * 3)
      def fillRect(l: Int, t: Int, fw: Int, fh: Int): Unit = {
        val hasBg = gct != null && bgIdx < gct.length / 3
        val br = if (hasBg) gct(bgIdx * 3) else 0.toByte
        val bg = if (hasBg) gct(bgIdx * 3 + 1) else 0.toByte
        val bb = if (hasBg) gct(bgIdx * 3 + 2) else 0.toByte
        var y = t
        while (y < t + fh) {
          var x = l
          while (x < l + fw) {
            val d = (y * cw + x) * 3
            canvas(d) = br; canvas(d + 1) = bg; canvas(d + 2) = bb
            x += 1
          }
          y += 1
        }
      }
      fillRect(0, 0, cw, ch)
      var frames = Vector.empty[GifFrame]
      var delay = 0
      var disposal = 0
      var transFlag = false
      var tIdx = 0
      def done(): Option[Vector[GifFrame]] =
        if (frames.nonEmpty) Some(frames) else None
      while (off < b.length) {
        (b(off) & 0xff) match {
          case 0x21 =>
            if (off + 1 >= b.length) return done()
            val label = b(off + 1) & 0xff
            if (label == 0xf9 && off + 7 < b.length && (b(off + 2) & 0xff) >= 4) {
              val p = b(off + 3) & 0xff
              disposal = (p >> 2) & 7
              transFlag = (p & 1) != 0
              delay = le16(b, off + 4)
              tIdx = b(off + 6) & 0xff
            }
            off += 2
            while (off < b.length && b(off) != 0) off += 1 + (b(off) & 0xff)
            off += 1
          case 0x2c =>
            if (off + 10 > b.length) return done()
            val left = le16(b, off + 1)
            val top = le16(b, off + 3)
            val fw = le16(b, off + 5)
            val fh = le16(b, off + 7)
            val ip = b(off + 9) & 0xff
            off += 10
            if (fw <= 0 || fh <= 0 || left + fw > cw || top + fh > ch)
              return done()
            var pal = gct
            if ((ip & 0x80) != 0) {
              val n = 1 << ((ip & 0x07) + 1)
              if (off + 3 * n > b.length) return done()
              pal = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
              off += 3 * n
            }
            if (pal == null) return done()
            val interlaced = (ip & 0x40) != 0
            if (off >= b.length) return done()
            val minCodeSize = b(off) & 0xff
            off += 1
            if (minCodeSize < 2 || minCodeSize > 8) return done()
            val data = new java.io.ByteArrayOutputStream()
            while (off < b.length && b(off) != 0) {
              val len = b(off) & 0xff
              if (off + 1 + len > b.length) return done()
              data.write(b, off + 1, len)
              off += 1 + len
            }
            off += 1 // sub-block terminator
            val idx = lzwDecode(data.toByteArray, minCodeSize, fw * fh)
              .getOrElse(return done())
            val saved = if (disposal == 3) canvas.clone() else null
            val rowOrder =
              if (!interlaced) 0 until fh
              else Seq((0, 8), (4, 8), (2, 4), (1, 2))
                .flatMap { case (start, step) => start until fh by step }
            val npal = pal.length / 3
            var src = 0
            rowOrder.foreach { fy =>
              var fx = 0
              while (fx < fw) {
                val ci = idx(src) & 0xff
                src += 1
                if (ci >= npal) return done()
                if (!(transFlag && ci == tIdx)) {
                  val d = ((top + fy) * cw + (left + fx)) * 3
                  canvas(d) = pal(ci * 3)
                  canvas(d + 1) = pal(ci * 3 + 1)
                  canvas(d + 2) = pal(ci * 3 + 2)
                }
                fx += 1
              }
            }
            frames = frames :+ GifFrame(frames.size, delay, disposal,
              DecodedImage(cw, ch, 3, canvas.clone()))
            if (frames.size >= maxFrames) return Some(frames)
            disposal match {
              case 2 => fillRect(left, top, fw, fh)
              case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
              case _ =>
            }
            delay = 0; disposal = 0; transFlag = false; tIdx = 0
          case 0x3b => return done()
          case _ => return done()
        }
      }
      done()
    } catch { case _: Exception => None }

  /** One animation frame for [[encodeGifAnim]]: a palette-index rect
    * composited at (left, top) with GIF89a graphic-control facts.
    */
  case class AnimFrame(left: Int, top: Int, width: Int, height: Int,
                       indices: Array[Byte], delayCs: Int,
                       disposal: Int = 1, transparentIdx: Int = -1)

  /** Animated fixture encoder: a GCE + image block per frame, same
    * literal-mode LZW as [[encodeGif]]. Lossless over palette indices,
    * so [[decodeFrames]] round-trips composited canvases bit-exactly.
    */
  def encodeGifAnim(w: Int, h: Int, pal: Array[Byte],
                    frames: Seq[AnimFrame],
                    bgIndex: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "animation needs at least one frame")
    val npal = pal.length / 3
    require(npal >= 2 && npal <= 256 && (npal & (npal - 1)) == 0 &&
      pal.length == npal * 3, s"palette size $npal must be a power of two")
    val palBits = 31 - Integer.numberOfLeadingZeros(npal)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | ((palBits - 1) & 0x07) | 0x70)
    out.write(bgIndex & 0xff); out.write(0)
    out.write(pal)
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.width > 0 && f.height > 0 &&
        f.left + f.width <= w && f.top + f.height <= h &&
        f.indices.length == f.width * f.height,
        s"bad frame rect ${f.width}x${f.height}@(${f.left},${f.top}) in ${w}x$h")
      requireIndicesInRange(f.indices, npal)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(((f.disposal & 7) << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      out.write(f.delayCs & 0xff); out.write((f.delayCs >> 8) & 0xff)
      out.write(if (f.transparentIdx >= 0) f.transparentIdx & 0xff else 0)
      out.write(0)
      out.write(0x2c)
      out.write(f.left & 0xff); out.write(f.left >> 8)
      out.write(f.top & 0xff); out.write(f.top >> 8)
      out.write(f.width & 0xff); out.write(f.width >> 8)
      out.write(f.height & 0xff); out.write(f.height >> 8)
      out.write(0x00) // no local palette, not interlaced
      val minCodeSize = math.max(2, palBits)
      out.write(minCodeSize)
      out.write(subBlocks(lzwEncodeLiteral(f.indices, minCodeSize)))
      out.write(0x00)
    }
    out.write(0x3b)
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
