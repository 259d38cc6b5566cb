package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing: schema/batch shape are real; decode is a
  * deterministic stub (no codecs in this environment).
  */
class MultimodalSpec extends SparkTestBase {

  private def media = {
    import spark.implicits._
    Multimodal.syntheticMedia(
      Seq((0L, "alpha bravo charlie delta echo"),
        (1L, "some audio-ish text payload that is a bit longer than the rest"),
        (2L, "video doc payload with words"),
        (3L, "x"))
        .toDF("doc_id", "text"))
  }

  test("synthetic media: kinds cycle, metadata derives from byte length") {
    val kinds = media.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds === Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
  }

  test("extractFeatures: fixed dim, deterministic, one row per media") {
    val f1 = Multimodal.extractFeatures(media, dim = 8, batchSize = 2)
      .collect().map(f => f.media_id -> f.embedding.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8, batchSize = 3)
      .collect().map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(f1.keySet === Set(0L, 1L, 2L, 3L))
    assert(f1.values.forall(_.length === 8))
    assert(f1 === f2, "batch size must not change results")
    assert(f1.values.flatten.forall(v => v >= -1f && v <= 1f))
  }

  test("sampleFrames: only videos, at most maxFrames, strided indices") {
    val rows = Multimodal.sampleFrames(media, maxFrames = 4).collect()
    assert(rows.nonEmpty)
    val byMedia = rows.groupBy(_.getLong(0))
    assert(byMedia.keySet === Set(2L))
    byMedia.values.foreach { frames =>
      assert(frames.length <= 4)
      val n = frames.head.getInt(1)
      val idx = frames.map(_.getLong(3))
      assert(idx.forall(i => i >= 0 && i < n))
      assert(idx.distinct.length === idx.length)
    }
  }

  test("audioChunks: offsets tile the payload without overlap or gap") {
    val rows = Multimodal.audioChunks(media, chunkSeconds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_._2).toSeq
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (_, _, off1, len1) = pair(0)
          val (_, _, off2, _) = pair(1)
          assert(off1 + len1 === off2, "chunks must tile contiguously")
        }
      }
      assert(sorted.forall(_._4 > 0))
    }
  }

  test("decode stub returns declared dims and a stable checksum") {
    val (w, h, c1) = Multimodal.decodeImageStub("payload".getBytes, 64, 48)
    val (_, _, c2) = Multimodal.decodeImageStub("payload".getBytes, 64, 48)
    assert((w, h) === (64, 48))
    assert(c1 === c2)
  }

  test("aspectBucket: nearest target aspect, square/portrait/landscape, no bytes read") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", 1000, 1000), // square -> (1024, 1024)
      (2L, "image", 500, 1000), // strong portrait ar=0.5 -> (640, 1536) ar 0.417 vs (768,1344) 0.571: dist 0.5/0.417=1.2 vs 0.571/0.5=1.14 -> (768, 1344)
      (3L, "image", 2000, 800), // strong landscape ar=2.5 -> (1536, 640) ar=2.4
      (4L, "video", 100, 100), // not an image: excluded
      (5L, "image", 1100, 900)) // ar 1.222 -> (1152, 896) ar 1.286 vs (1024,1024): 1.222 vs 1.286/1.222=1.052 -> (1152,896)? dist sq=1.222, rect=1.052 -> rect
      .toDF("media_id", "kind", "width", "height")
    val got = Multimodal.aspectBucket(media)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(got === Map(
      1L -> ((1024, 1024)),
      2L -> ((768, 1344)),
      3L -> ((1536, 640)),
      5L -> ((1152, 896))))
  }
}
