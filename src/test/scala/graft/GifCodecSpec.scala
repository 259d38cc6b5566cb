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
}
