package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GifCodec, ImageCodec}

/** Round-trip and malformed-input pins for the JVM-pure GIF codec:
  * exact pixel recovery (GIF is lossless over palette indices) in both
  * sequential and interlaced row order, LZW re-clear behavior across
  * palette sizes, sub-block framing at the 255-byte boundary, and the
  * decode-never-throws contract on corrupt streams.
  */
class GifCodecSpec extends AnyFunSuite {

  private def pal256: Array[Byte] = {
    val p = new Array[Byte](768)
    for (i <- 0 until 256) {
      p(i * 3) = i.toByte
      p(i * 3 + 1) = ((i * 7) % 256).toByte
      p(i * 3 + 2) = ((i * 13) % 256).toByte
    }
    p
  }

  private def expand(pal: Array[Byte], idx: Array[Byte]): Array[Byte] = {
    val rgb = new Array[Byte](idx.length * 3)
    for (i <- idx.indices) {
      val c = idx(i) & 0xff
      rgb(i * 3) = pal(c * 3)
      rgb(i * 3 + 1) = pal(c * 3 + 1)
      rgb(i * 3 + 2) = pal(c * 3 + 2)
    }
    rgb
  }

  test("sequential round-trip is pixel-exact (256-entry palette)") {
    val w = 8; val h = 5
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 37 + 11) % 256).toByte)
    val gif = GifCodec.encodeGif(w, h, pal256, idx)
    val img = ImageCodec.decode(gif).getOrElse(fail("decode returned None"))
    assert(img.width === w && img.height === h && img.channels === 3)
    assert(img.pixels.toSeq === expand(pal256, idx).toSeq)
  }

  test("interlaced round-trip is pixel-exact and differs on the wire") {
    val w = 6; val h = 13 // odd height exercises all four pass groups
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 53 + 7) % 256).toByte)
    val seq = GifCodec.encodeGif(w, h, pal256, idx, interlaced = false)
    val ilc = GifCodec.encodeGif(w, h, pal256, idx, interlaced = true)
    assert(!java.util.Arrays.equals(seq, ilc),
      "interlaced stream should reorder rows on the wire")
    val a = ImageCodec.decode(seq).get
    val b = ImageCodec.decode(ilc).get
    assert(a.pixels.toSeq === b.pixels.toSeq, "deinterlace must restore order")
    assert(b.pixels.toSeq === expand(pal256, idx).toSeq)
  }

  test("small palettes re-clear correctly (2/4/16 entries)") {
    for (npal <- Seq(2, 4, 16)) {
      val pal = new Array[Byte](npal * 3)
      for (i <- 0 until npal) {
        pal(i * 3) = (i * 17).toByte
        pal(i * 3 + 1) = (255 - i * 9).toByte
        pal(i * 3 + 2) = (i * 29).toByte
      }
      val w = 16; val h = 16 // 256 indices: many re-clear cycles at npal=2
      val idx = Array.tabulate[Byte](w * h)(i => (i % npal).toByte)
      val img = ImageCodec.decode(GifCodec.encodeGif(w, h, pal, idx))
        .getOrElse(fail(s"decode failed at palette size $npal"))
      assert(img.pixels.toSeq === expand(pal, idx).toSeq,
        s"pixel mismatch at palette size $npal")
    }
  }

  test("payload crossing the 255-byte sub-block boundary") {
    val w = 32; val h = 32 // 1024 indices -> several sub-blocks
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 3) % 251).toByte)
    val gif = GifCodec.encodeGif(w, h, pal256, idx)
    val img = ImageCodec.decode(gif).get
    assert(img.pixels.toSeq === expand(pal256, idx).toSeq)
  }

  test("1x1 and single-row edge dims") {
    for ((w, h) <- Seq((1, 1), (7, 1), (1, 9))) {
      val idx = Array.tabulate[Byte](w * h)(i => (i * 41 % 256).toByte)
      val img = ImageCodec.decode(GifCodec.encodeGif(w, h, pal256, idx)).get
      assert(img.width === w && img.height === h)
      assert(img.pixels.toSeq === expand(pal256, idx).toSeq)
    }
  }

  test("malformed streams return None, never throw") {
    val good = GifCodec.encodeGif(4, 4, pal256,
      Array.tabulate[Byte](16)(_.toByte))
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "GIF8".getBytes("US-ASCII"),                    // truncated magic
      "GIF89a".getBytes("US-ASCII"),                  // header only
      good.take(20),                                  // truncated mid-GCT
      good.take(good.length - 3),                     // truncated data
      { val b = good.clone(); b(779) = 0x99.toByte; b }, // corrupt block type
      { val b = good.clone()                          // width bomb
        b(6) = 0xff.toByte; b(7) = 0x7f.toByte
        b(781) = 0xff.toByte; b(782) = 0x7f.toByte; b },
      Array.fill[Byte](64)(0x21))                     // extension garbage
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val r = GifCodec.decode(bytes)
      assert(r.isEmpty || i == 5 || i == 6,
        s"case $i decoded unexpectedly") // corrupt cases may legitimately
      // still parse if the flipped byte lands in pixel data; the pin is
      // only that decode NEVER throws (reaching this line proves it).
    }
  }

  test("decode dispatch recognizes GIF magic in ImageCodec") {
    val gif = GifCodec.encodeGif(2, 2, pal256, Array[Byte](1, 2, 3, 4))
    assert(GifCodec.isGif(gif))
    assert(ImageCodec.decode(gif).isDefined)
  }

  // ---- animated decode (decodeFrames) ---------------------------------

  import GifCodec.AnimFrame

  private def frame(w: Int, h: Int, seed: Int, left: Int = 0, top: Int = 0,
                    delay: Int = 4, disposal: Int = 1,
                    tIdx: Int = -1): AnimFrame =
    AnimFrame(left, top, w, h,
      Array.tabulate[Byte](w * h)(i => ((i * 29 + seed) % 256).toByte),
      delay, disposal, tIdx)

  test("animated round-trip: full frames, exact canvases, GCE facts") {
    val fs = Seq(frame(8, 8, 3, delay = 4), frame(8, 8, 77, delay = 6),
      frame(8, 8, 150, delay = 8))
    val gif = GifCodec.encodeGifAnim(8, 8, pal256, fs)
    val out = GifCodec.decodeFrames(gif).getOrElse(fail("decode None"))
    assert(out.size === 3)
    out.zip(fs).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(got.frameIdx === i && got.delayCs === exp.delayCs)
      assert(got.canvas.width === 8 && got.canvas.height === 8)
      assert(got.canvas.pixels.toSeq === expand(pal256, exp.indices).toSeq,
        s"frame $i pixels")
    }
    // first-frame decode surface sees the same leading frame
    assert(ImageCodec.decode(gif).get.pixels.toSeq ===
      expand(pal256, fs.head.indices).toSeq)
  }

  test("partial frame composites at its rect over the previous canvas") {
    val f1 = frame(4, 4, 10)
    val f2 = frame(2, 2, 200, left = 1, top = 2)
    val gif = GifCodec.encodeGifAnim(4, 4, pal256, Seq(f1, f2))
    val out = GifCodec.decodeFrames(gif).get
    val want = expand(pal256, f1.indices)
    for (fy <- 0 until 2; fx <- 0 until 2) {
      val ci = f2.indices(fy * 2 + fx) & 0xff
      val d = ((2 + fy) * 4 + (1 + fx)) * 3
      want(d) = pal256(ci * 3)
      want(d + 1) = pal256(ci * 3 + 1)
      want(d + 2) = pal256(ci * 3 + 2)
    }
    assert(out(1).canvas.pixels.toSeq === want.toSeq)
  }

  test("disposal 2 restores background; disposal 3 restores previous") {
    val base = frame(4, 4, 10)
    val rect2 = frame(2, 2, 200, left = 0, top = 0, disposal = 2)
    val rect3 = frame(2, 2, 200, left = 0, top = 0, disposal = 3)
    val last = frame(1, 1, 99, left = 3, top = 3)
    // bgIndex 5 -> background color = palette entry 5
    val gifBg = GifCodec.encodeGifAnim(4, 4, pal256,
      Seq(base, rect2, last), bgIndex = 5)
    val afterBg = GifCodec.decodeFrames(gifBg).get(2).canvas.pixels
    // rect2's 2x2 area was wiped to the BACKGROUND color before `last`
    for (fy <- 0 until 2; fx <- 0 until 2) {
      val d = (fy * 4 + fx) * 3
      assert((afterBg(d) & 0xff) === 5 &&
        (afterBg(d + 1) & 0xff) === 35 && (afterBg(d + 2) & 0xff) === 65,
        s"bg restore at ($fx,$fy)")
    }
    val gifPrev = GifCodec.encodeGifAnim(4, 4, pal256,
      Seq(base, rect3, last), bgIndex = 5)
    val afterPrev = GifCodec.decodeFrames(gifPrev).get(2).canvas.pixels
    // rect3's area reverted to frame-1 content before `last` composited
    val baseRgb = expand(pal256, base.indices)
    for (fy <- 0 until 2; fx <- 0 until 2) {
      val d = (fy * 4 + fx) * 3
      assert(afterPrev(d) === baseRgb(d) && afterPrev(d + 1) === baseRgb(d + 1)
        && afterPrev(d + 2) === baseRgb(d + 2), s"prev restore at ($fx,$fy)")
    }
  }

  test("transparent index leaves the underlying canvas pixel intact") {
    val f1 = frame(4, 4, 10)
    // frame 2 paints index 7 everywhere except one transparent hole
    val idx2 = Array.fill[Byte](16)(7.toByte)
    idx2(5) = 42 // declared transparent below: must NOT paint
    val f2 = AnimFrame(0, 0, 4, 4, idx2, 5, disposal = 1, transparentIdx = 42)
    val gif = GifCodec.encodeGifAnim(4, 4, pal256, Seq(f1, f2))
    val c2 = GifCodec.decodeFrames(gif).get(1).canvas.pixels
    val baseRgb = expand(pal256, f1.indices)
    assert(c2(5 * 3) === baseRgb(5 * 3) && c2(5 * 3 + 1) === baseRgb(5 * 3 + 1)
      && c2(5 * 3 + 2) === baseRgb(5 * 3 + 2), "transparent hole")
    assert((c2(0) & 0xff) === 7, "opaque pixels painted")
  }

  test("truncated animation yields the complete leading frames") {
    val fs = Seq(frame(6, 6, 1), frame(6, 6, 2), frame(6, 6, 3))
    val gif = GifCodec.encodeGifAnim(6, 6, pal256, fs)
    // cut inside the third frame's data: two complete frames survive
    val cut = GifCodec.decodeFrames(gif.take(gif.length - 10)).get
    assert(cut.size === 2)
    assert(cut(1).canvas.pixels.toSeq === expand(pal256, fs(1).indices).toSeq)
    // garbage before any frame completes -> None, never throw
    assert(GifCodec.decodeFrames(gif.take(20)).isEmpty)
    assert(GifCodec.decodeFrames(null).isEmpty)
  }

  test("frame-bomb payloads are bounded by maxFrames") {
    val fs = Vector.fill(40)(frame(2, 2, 9))
    val gif = GifCodec.encodeGifAnim(2, 2, pal256, fs)
    assert(GifCodec.decodeFrames(gif, maxFrames = 8).get.size === 8)
  }
}
