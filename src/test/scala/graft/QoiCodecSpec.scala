package graft

import graft.ops.{ImageCodec, QoiCodec}

/** QOI codec: hand-assembled byte streams per op (so decode and the
  * fixture encoder cannot share a systematic spec misreading),
  * encoder byte-exactness on a hand-computed stream, adversarial
  * round-trips (62-run chunking, index eviction, wrapping deltas,
  * RGBA), and malformed-input behavior (None, never a throw).
  */
class QoiCodecSpec extends SparkTestBase {

  private def header(w: Int, h: Int, ch: Int): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      ch.toByte, 0)

  private val endMarker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  private def stream(w: Int, h: Int, ch: Int, ops: Int*): Array[Byte] =
    header(w, h, ch) ++ ops.map(_.toByte) ++ endMarker

  private def px(img: ImageCodec.DecodedImage): Seq[Seq[Int]] =
    img.pixels.grouped(img.channels).map(_.map(_ & 0xff).toSeq).toSeq

  test("hand vector: RGB, DIFF, RUN, INDEX ops decode to the spec'd pixels") {
    // (10,20,30); DIFF(+1,0,-2) -> (11,20,28); RUN 1 -> repeat;
    // INDEX slot of (10,20,30): (3*10+5*20+7*30+11*255)%64 = 9
    val got = QoiCodec.decode(stream(2, 2, 3,
      0xfe, 10, 20, 30, 0x78, 0xc0, 0x09)).get
    assert((got.width, got.height, got.channels) == (2, 2, 3))
    assert(px(got) == Seq(Seq(10, 20, 30), Seq(11, 20, 28),
      Seq(11, 20, 28), Seq(10, 20, 30)))
  }

  test("hand vector: LUMA from the implicit (0,0,0,255) start state") {
    // dg=5 -> 0x80|37; (dr-dg,db-dg)=(-3,7) -> 0x5f => (2,5,12)
    val got = QoiCodec.decode(stream(1, 1, 3, 0xa5, 0x5f)).get
    assert(px(got) == Seq(Seq(2, 5, 12)))
  }

  test("hand vector: DIFF wraps modulo 256") {
    val got = QoiCodec.decode(stream(2, 1, 3,
      0xfe, 255, 255, 255, 0x7f)).get // DIFF(+1,+1,+1) wraps to 0
    assert(px(got) == Seq(Seq(255, 255, 255), Seq(0, 0, 0)))
  }

  test("hand vector: RGBA op switches alpha; index hashes include it") {
    val got = QoiCodec.decode(stream(2, 1, 4,
      0xff, 1, 2, 3, 128, 0xc0)).get
    assert(got.channels == 4)
    assert(px(got) == Seq(Seq(1, 2, 3, 128), Seq(1, 2, 3, 128)))
  }

  test("encoder emits the hand-computed byte stream") {
    val pixels = Array[Byte](10, 20, 30, 10, 20, 30, 11, 20, 28, 10, 20, 30)
    val want = header(1, 4, 3) ++
      Array[Byte](0xfe.toByte, 10, 20, 30, 0xc0.toByte, 0x78, 0x09) ++ endMarker
    assert(QoiCodec.encode(1, 4, 3, pixels).toSeq == want.toSeq)
  }

  test("round-trip: constant image chunks runs at 62") {
    val n = 200
    val pixels = Array.fill(n * 3)(77.toByte)
    val enc = QoiCodec.encode(1, n, 3, pixels)
    // RGB + 61-run, 62-run, 62-run, 14-run (first pixel emitted by RGB op)
    val got = QoiCodec.decode(enc).get
    assert(got.pixels.toSeq == pixels.toSeq)
    assert(enc.length == 14 + 4 + 4 + 8) // header + FE rgb + 4 run bytes + marker
  }

  test("round-trip: seeded random RGB and RGBA, gradient, index eviction") {
    val rnd = new scala.util.Random(99)
    // random: exercises RGB/LUMA/DIFF/INDEX arbitrarily
    val randRgb = Array.fill(37 * 11 * 3)(rnd.nextInt(256).toByte)
    assert(QoiCodec.decode(QoiCodec.encode(37, 11, 3, randRgb)).get
      .pixels.toSeq == randRgb.toSeq)
    // random alpha: exercises RGBA
    val randRgba = Array.fill(16 * 16 * 4)(rnd.nextInt(256).toByte)
    val gotA = QoiCodec.decode(QoiCodec.encode(16, 16, 4, randRgba)).get
    assert(gotA.channels == 4 && gotA.pixels.toSeq == randRgba.toSeq)
    // smooth gradient: mostly DIFF/LUMA
    val grad = Array.tabulate(64 * 4 * 3)(i => ((i / 3) % 256).toByte)
    assert(QoiCodec.decode(QoiCodec.encode(64, 4, 3, grad)).get
      .pixels.toSeq == grad.toSeq)
    // >64 distinct recurring colors: recent-color slots evict and reload
    val cyc = Array.tabulate(100 * 2)(i => (i * 97) % 200)
      .flatMap(v => Seq(v.toByte, ((v * 7) % 256).toByte, ((v * 13) % 256).toByte))
    assert(QoiCodec.decode(QoiCodec.encode(100, 2, 3, cyc)).get
      .pixels.toSeq == cyc.toSeq)
  }

  test("malformed payloads return None, never throw") {
    val good = QoiCodec.encode(4, 4, 3, Array.fill(48)(5.toByte))
    assert(QoiCodec.decode(null).isEmpty)
    assert(QoiCodec.decode(Array[Byte]()).isEmpty)
    assert(QoiCodec.decode("qoix".getBytes ++ good.drop(4)).isEmpty) // bad magic
    (1 until good.length - 1).foreach { k => // every truncation point
      assert(QoiCodec.decode(good.take(k)).isEmpty, s"truncated at $k")
    }
    assert(QoiCodec.decode(good ++ Array[Byte](0)).isEmpty) // trailing garbage
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 2
    assert(QoiCodec.decode(badEnd).isEmpty)
    // zero / bomb dimensions
    assert(QoiCodec.decode(stream(0, 4, 3, 0xc0)).isEmpty)
    assert(QoiCodec.decode(header(1 << 30, 1 << 30, 3) ++ endMarker).isEmpty)
    assert(QoiCodec.decode(stream(1, 1, 5, 0xfe, 1, 2, 3)).isEmpty) // channels
    // run overshooting the pixel budget
    assert(QoiCodec.decode(stream(1, 1, 3, 0xfe, 1, 2, 3, 0xc5)).isEmpty)
  }

  test("ImageCodec.decode dispatches QOI by magic") {
    val pixels = Array.tabulate(8 * 2 * 3)(i => (i * 11 % 256).toByte)
    val got = ImageCodec.decode(QoiCodec.encode(8, 2, 3, pixels)).get
    assert((got.width, got.height, got.channels) == (8, 2, 3))
    assert(got.pixels.toSeq == pixels.toSeq)
  }
}
