package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Structured Streaming behavior: windowed aggs, watermark dedup, gap
  * sessionization, and streaming/batch parity of the stateless stages.
  */
class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("WARC intake stream: archives dropped into the landing dir " +
    "arrive as parsed records, incrementally per file") {
    import java.nio.file.Files
    import graft.sources.Warc
    import spark.implicits._
    def rec(i: Int, wtype: String): Warc.WarcRecord = {
      val p = s"body $i".getBytes("UTF-8")
      Warc.WarcRecord(wtype, s"<urn:s:$i>", "2024-01-01T00:00:00Z",
        s"https://example.org/$i", "text/plain", p.length.toLong, p)
    }
    def drop(dir: String, name: String, recs: Seq[Warc.WarcRecord]): Unit = {
      val f = new java.io.FileOutputStream(s"$dir/$name")
      recs.foreach(r => f.write(Warc.encodeGzipMember(r)))
      f.close()
    }
    val dir = Files.createTempDirectory("warcstream").toString
    drop(dir, "a.warc.gz", (0 until 3).map(rec(_, "response")))
    drop(dir, "b.warc.gz", (3 until 5).map(rec(_, "conversion")))
    val agg = Streaming.readWarc(spark, dir)
      .groupBy("warc_type")
      .agg(count(lit(1)).as("n"), sum("content_length").as("bytes"))
    val q = agg.writeStream.format("memory").queryName("warc_intake")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val first = spark.table("warc_intake")
        .select("warc_type", "n").as[(String, Long)].collect().toMap
      assert(first === Map("response" -> 3L, "conversion" -> 2L))
      // a later drop is picked up incrementally, prior files not re-read
      drop(dir, "c.warc.gz", (5 until 9).map(rec(_, "response")))
      q.processAllAvailable()
      val second = spark.table("warc_intake")
        .select("warc_type", "n").as[(String, Long)].collect().toMap
      assert(second === Map("response" -> 7L, "conversion" -> 2L))
    } finally q.stop()
  }

  test("WARC -> pipeline composition: crawl drops flow through the " +
    "batch cleaning stages unchanged (response split + WET passthrough, " +
    "non-2xx and non-text dropped)") {
    import java.nio.file.Files
    import graft.sources.Warc
    import spark.implicits._
    def resp(i: Int, status: Int, ct: String, body: String): Warc.WarcRecord = {
      val p = Warc.encodeHttpResponse(status, ct, body.getBytes("UTF-8"))
      Warc.WarcRecord("response", s"<urn:c:$i>", "2024-01-01T00:00:00Z",
        s"https://example.org/$i", "application/http;msgtype=response",
        p.length.toLong, p)
    }
    val wet = Warc.WarcRecord("conversion", "<urn:c:9>",
      "2024-01-01T00:00:00Z", "https://example.org/wet", "text/plain",
      9L, "wet  text extracted from the page body here".getBytes("UTF-8"))
    val dir = Files.createTempDirectory("warcpipe").toString
    val f = new java.io.FileOutputStream(s"$dir/drop.warc.gz")
    Seq(
      resp(1, 200, "text/html", "<p>Hello   crawl world</p>"),
      resp(2, 404, "text/html", "not found page"),
      resp(3, 200, "image/png", "binarybinary"),
      wet).foreach(r => f.write(Warc.encodeGzipMember(r)))
    f.close()
    val cleaned = Streaming.cleanStream(Streaming.warcDocs(spark, dir))
      .select("url", "text_deep_clean", "drop_reason")
    val q = cleaned.writeStream.format("memory").queryName("warc_pipe")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("warc_pipe")
        .select("url", "text_deep_clean").as[(String, String)].collect().toMap
      // only the 2xx text response and the WET conversion survive intake
      assert(rows.keySet === Set("https://example.org/1",
        "https://example.org/wet"))
      // and the BATCH stage transforms ran: HTML stripped, spaces
      // collapsed, exactly as Pipeline.cleanAndFilter does on parquet
      assert(rows("https://example.org/1") === "Hello crawl world")
      assert(rows("https://example.org/wet")
        === "wet text extracted from the page body here")
    } finally q.stop()
  }

  test("tumbling window aggregates per event type (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = Streaming.eventsTumbling(
      in.toDF().toDF("ts", "event_type", "value"), window_ = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      in.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(40), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("event_type", "n_events", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowed Count-Min grid equals the batch sketch per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val sk = Streaming.sketchedTermFreq(in.toDF().toDF("ts", "text"),
      window_ = "30 minutes")
    val q = sk.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      in.addData(
        (ts(1), "alpha beta alpha"), (ts(7), "beta gamma"),
        (ts(40), "alpha alpha"), (ts(45), "delta"))
      q.processAllAvailable()
      val got = spark.table("cms_stream")
        .as[(Timestamp, Int, Long, Long)].collect()
        .groupBy(_._1).map { case (w, rows) =>
          w -> rows.map(r => (r._2, r._3) -> r._4).toMap
        }
      // batch twin per window, same cells bit-for-bit
      def batch(texts: Seq[String]) =
        graft.ops.CountMin.sketch(
          texts.flatMap(_.split(" ")).toDF("tok"), "tok")
          .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got(ts(0)) == batch(Seq("alpha beta alpha", "beta gamma")))
      assert(got(ts(30)) == batch(Seq("alpha alpha", "delta")))
      // bounded state: never more than Depth x Width cells per window
      got.values.foreach(cells =>
        assert(cells.size <= graft.ops.CountMin.Depth * graft.ops.CountMin.Width))
    } finally q.stop()
  }

  test("windowed heavy hitters: per-window MG guarantees, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val K = 4
    val hh = Streaming.heavyTermsStream(in.toDF().toDF("ts", "text"),
      window_ = "30 minutes", k = K)
    val q = hh.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      // window 1: 'alpha' dominates a 9-term vocabulary (> K counters)
      val w1 = Seq.fill(30)("alpha") ++ (0 until 12).map(i => s"t$i" * 1 + (i % 6).toString)
      // window 2: 'beta' dominates a different mix
      val w2 = Seq.fill(20)("beta") ++ (0 until 10).map(i => s"u${i % 7}")
      in.addData((ts(1), w1.mkString(" ")), (ts(40), w2.mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("hh_stream")
        .as[(Timestamp, String, Long)].collect()
        .groupBy(_._1).map { case (w, rows) =>
          w -> rows.map(r => r._2 -> r._3).toMap
        }
      def check(w: Timestamp, terms: Seq[String]): Unit = {
        val exact = terms.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
        val n = terms.size.toLong
        val sum = got(w)
        assert(sum.size <= K, s"window $w state ${sum.size} > k")
        sum.foreach { case (t, est) =>
          val tru = exact.getOrElse(t, 0L)
          assert(est <= tru && (tru - est) * (K + 1) <= n,
            s"window $w: $t est=$est true=$tru n=$n")
        }
        exact.filter(_._2 * (K + 1) > n).keys.foreach(t =>
          assert(sum.contains(t), s"window $w: heavy $t missing"))
      }
      check(ts(0), w1)
      check(ts(30), w2)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups exact text within horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val deduped = Streaming.dedupStream(
      in.toDF().toDF("ingest_ts", "text"), "text", "ingest_ts")
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData((ts(0), "Hello   World"), (ts(1), "hello world"), (ts(2), "other doc"))
      q.processAllAvailable()
      // canon collapses case/whitespace -> first two rows share a hash
      assert(spark.table("dedup").count() === 2)
    } finally q.stop()
  }

  test("perceptual stream dedup: QOI and PNG of the same pixels collapse; " +
    "different pixels and undecodable payloads survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = 16; val h = 16
    def px(f: Int => Int): Array[Byte] = {
      val a = new Array[Byte](w * h * 3)
      (0 until w * h).foreach { p =>
        val v = f(p)
        a(p * 3) = v.toByte; a(p * 3 + 1) = ((7 * v) % 256).toByte
        a(p * 3 + 2) = ((13 * v) % 256).toByte
      }
      a
    }
    val pix = px(p => (p * 37) % 256)
    val asQoi = graft.ops.QoiCodec.encode(w, h, 3, pix)
    val asPng = graft.ops.ImageCodec.encodePng(w, h, pix)
    val other = graft.ops.QoiCodec.encode(w, h, 3, px(p => (p * 5 + 9) % 256))
    val junkA = Array.fill[Byte](64)(3)
    val junkB = Array.fill[Byte](64)(4)
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val deduped = Streaming.dedupPerceptualStream(
      in.toDF().toDF("ingest_ts", "media_id", "content"),
      "content", "ingest_ts")
    val q = deduped.writeStream.format("memory").queryName("pdedup")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, asQoi), (ts(1), 2L, asPng), (ts(2), 3L, other),
        (ts(3), 4L, junkA), (ts(4), 5L, junkB))
      q.processAllAvailable()
      val kept = spark.table("pdedup").select("media_id")
        .as[Long].collect().toSet
      // byte hashes of asQoi/asPng are disjoint, but the signatures
      // collide: cross-FORMAT perceptual dedup keeps only the first;
      // the two distinct junk payloads both survive on the raw: key
      assert(kept === Set(1L, 3L, 4L, 5L), s"kept $kept")
    } finally q.stop()
  }

  test("perceptual audio stream dedup: WAV and FLAC of the same recording " +
    "collapse; different audio survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val samples = Array.tabulate(400)(i => ((i * 53) % 256 - 128) * 64)
    val asFlac = graft.ops.FlacCodec.encodeFlac16(8000, 1, samples,
      subframe = 0, midSide = false, partitions2 = true)
    val asWav = graft.ops.AudioCodec.encodeWav16(8000, 1,
      samples.map(_ / 32768f))
    val other = graft.ops.FlacCodec.encodeFlac16(8000, 1,
      Array.tabulate(400)(i => ((i * 91 + 7) % 256 - 128) * 64),
      subframe = 1, midSide = false, partitions2 = false)
    val in = MemoryStream[(Timestamp, Long, Array[Byte])]
    val deduped = Streaming.dedupPerceptualAudioStream(
      in.toDF().toDF("ingest_ts", "media_id", "content"),
      "content", "ingest_ts")
    val q = deduped.writeStream.format("memory").queryName("adedup")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, asFlac), (ts(1), 2L, asWav), (ts(2), 3L, other))
      q.processAllAvailable()
      val kept = spark.table("adedup").select("media_id")
        .as[Long].collect().toSet
      // byte hashes of asFlac/asWav are disjoint; the energy signature
      // is container-invariant, so only the first arrival survives
      assert(kept === Set(1L, 3L), s"kept $kept")
    } finally q.stop()
  }

  test("flagged stateful dedup: kept rows match dropDuplicatesWithinWatermark, dups carry cross-batch lineage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val df = in.toDF().toDF("ingest_ts", "id", "text")
    val flagged = Streaming.dedupStreamFlagged(df, "text", "id", "ingest_ts")
    val builtin = Streaming.dedupStream(df, "text", "ingest_ts")
    val qf = flagged.writeStream.format("memory").queryName("flagged")
      .outputMode("append").start()
    val qb = builtin.writeStream.format("memory").queryName("builtin")
      .outputMode("append").start()
    try {
      in.addData((ts(0), "a", "Hello   World"), (ts(1), "b", "hello world"),
        (ts(2), "c", "other doc"))
      qf.processAllAvailable(); qb.processAllAvailable()
      // micro-batch 2: a cross-batch duplicate of "hello world" + a fresh doc
      in.addData((ts(3), "d", "HELLO WORLD"), (ts(4), "e", "new doc"))
      qf.processAllAvailable(); qb.processAllAvailable()

      val keptFlagged = spark.table("flagged").filter(!col("is_dup_exact"))
        .select("dedup_id").as[String].collect().toSet
      val keptBuiltin = spark.table("builtin")
        .select("id").as[String].collect().toSet
      assert(keptFlagged === keptBuiltin)
      assert(keptFlagged === Set("a", "c", "e"))

      // duplicates carry lineage to the first arrival — including d,
      // whose keeper was seen in the PREVIOUS micro-batch (the
      // incremental-dedup state shape dropDuplicates can't express)
      val dupOf = spark.table("flagged").filter(col("is_dup_exact"))
        .select("dedup_id", "dup_of").as[(String, Option[String])]
        .collect().toMap
      assert(dupOf === Map("b" -> Some("a"), "d" -> Some("a")))
    } finally { qf.stop(); qb.stop() }
  }

  test("streaming CDX collapse: kept captures match the batch lag-window " +
    "semantics across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, String)]
    val kept = Streaming.collapseStream(
      in.toDF().toDF("surt", "cdx_ts", "digest"))
    val q = kept.writeStream.format("memory").queryName("collapse")
      .outputMode("append").start()
    try {
      // u1: digest changes at every capture; u2: constant; u3: changes
      // only at its 3rd capture, which arrives in the NEXT micro-batch
      in.addData(
        ("u1", ts(0), "a"), ("u1", ts(1), "b"),
        ("u2", ts(0), "x"), ("u2", ts(1), "x"),
        ("u3", ts(0), "p"), ("u3", ts(1), "p"))
      q.processAllAvailable()
      in.addData(("u1", ts(2), "c"), ("u2", ts(2), "x"), ("u3", ts(2), "q"))
      q.processAllAvailable()
      val got = spark.table("collapse")
        .select("surt", "digest").as[(String, String)].collect().toSet
      // batch semantics: lag(digest) over (partition by surt order by ts)
      assert(got === Set(("u1", "a"), ("u1", "b"), ("u1", "c"),
        ("u2", "x"), ("u3", "p"), ("u3", "q")))
      assert(spark.table("collapse").count() === 6)
    } finally q.stop()
  }

  test("foreachBatch dedup against a persistent parquet corpus state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("corpus_dedup").toString
    val in = MemoryStream[(String, String)]
    val q = Streaming.dedupAgainstCorpus(in.toDF().toDF("id", "text"),
      textCol = "text", idCol = "id",
      stateDir = s"$base/state", outDir = s"$base/out",
      checkpointDir = s"$base/ckpt")
    try {
      in.addData(("a", "Hello   World"), ("b", "other doc"))
      q.processAllAvailable()
      // micro-batch 2: c is a cross-batch duplicate of a
      in.addData(("c", "HELLO WORLD"), ("d", "third doc"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
      val dups = out.filter(col("is_dup_exact"))
        .select("dedup_id", "dup_of").as[(String, String)].collect().toMap
      // dup_of crosses the batch boundary via the state table's kept id
      assert(dups === Map("c" -> "a"))
      // the corpus state holds exactly the kept rows' (hash, id)
      val state = spark.read.parquet(s"$base/state")
        .select("dedup_id").as[String].collect().toSet
      assert(state === Set("a", "b", "d"))
    } finally q.stop()
  }

  test("foreachBatch near-dedup against a persistent sketch corpus state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("corpus_near").toString
    val para = "the quick brown fox jumps over the lazy dog again and again today"
    val in = MemoryStream[(Long, String)]
    val q = Streaming.nearDedupAgainstCorpus(in.toDF().toDF("doc_id", "text"),
      textCol = "text", idCol = "doc_id",
      stateDir = s"$base/state", outDir = s"$base/out",
      checkpointDir = s"$base/ckpt", threshold = 0.6)
    try {
      // batch 1: 2 is an INTRA-batch near-dup of 1
      in.addData((1L, s"$para with corpus trailing words"),
        (2L, s"$para with corpus trailing words"),
        (3L, "entirely different first-batch content about nothing shared"))
      q.processAllAvailable()
      // batch 2: 10 is a near-dup of 1 ACROSS the batch boundary
      in.addData((10L, s"$para with corpus trailing words"),
        (11L, "novel second-batch material unlike anything previous"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
      val corpusDups = out.filter(col("is_dup_near_corpus"))
        .select("doc_id", "near_dup_of").as[(Long, Long)].collect().toMap
      assert(corpusDups === Map(10L -> 1L))
      val batchDups = out.filter(col("is_dup_near_batch"))
        .select("doc_id", "batch_dup_of").as[(Long, Long)].collect().toMap
      assert(batchDups === Map(2L -> 1L))
      // state holds sketches for exactly the kept docs — the intra-batch
      // duplicate 2 never polluted it
      val stateIds = spark.read.parquet(s"$base/state")
        .select("id").as[Long].collect().toSet
      assert(stateIds === Set(1L, 3L, 11L))
    } finally q.stop()
  }

  test("streaming politeness scheduler: batch-ordered replay equals the " +
    "batch law; host positions continue across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 urls over 4 hosts, ragged delays — the crawlSchedule law
    val rows = (0L until 40L).map(i => (s"h${i % 4}.example.org", i, 1L + i % 3))
    val in = MemoryStream[(Timestamp, String, Long, Long)]
    val sched = Streaming.scheduleStream(
      in.toDF().toDF("ts", "host", "doc_id", "crawl_delay"))
    val q = sched.writeStream.format("memory").queryName("sched")
      .outputMode("append").start()
    try {
      // two micro-batches in doc_id order: positions must CONTINUE
      // across the boundary, not reset per batch
      in.addData(rows.take(20).map { case (h, i, d) => (ts(i.toInt), h, i, d) }: _*)
      q.processAllAvailable()
      in.addData(rows.drop(20).map { case (h, i, d) => (ts(i.toInt), h, i, d) }: _*)
      q.processAllAvailable()
      val got = spark.table("sched")
        .select("host", "doc_id", "seq", "fetch_at_sec").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val expect = rows.groupBy(_._1).values.flatMap { grp =>
        grp.sortBy(_._2).zipWithIndex.map { case ((h, i, d), k) =>
          (h, i, k.toLong, k * d) }
      }.toSet
      assert(got === expect)
    } finally q.stop()
  }

  test("gap sessionization emits a session once the watermark closes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val sessions = Streaming.sessionize(
      in.toDF().toDF("user_id", "ts", "value"),
      gapMinutes = 10, watermark = "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // burst 1: user 7, 10:00-10:04; then silence > gap
      in.addData((7L, ts(0), 1.0), (7L, ts(4), 2.0))
      q.processAllAvailable()
      // a much later event advances the watermark past 10:04+gap
      in.addData((9L, ts(45), 9.0))
      q.processAllAvailable()
      in.addData((9L, ts(59), 1.0)) // push watermark again so timeout fires
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((7L, 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("native session_window aggregate closes the same gap session") {
    // the built-in operator form of the sessionizer above (and of batch
    // q_session_window) — same 10-min gap, same session once the
    // watermark passes end+gap
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val sw = in.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "5 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("n_events"), col("sum_value"))
    val q = sw.writeStream.format("memory").queryName("sw_sessions")
      .outputMode("append").start()
    try {
      in.addData((7L, ts(0), 1.0), (7L, ts(4), 2.0))
      q.processAllAvailable()
      in.addData((9L, ts(45), 9.0))
      q.processAllAvailable()
      in.addData((9L, ts(59), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sw_sessions")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows.contains((7L, 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("stream-static join: events enriched from a static dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double)]
    val enriched = in.toDF().toDF("user_id", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((7L, 1.0), (9L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user_id", "tier").as[(Long, Option[String])]
        .collect().toSet
      assert(rows === Set((7L, Some("gold")), (9L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with trailing clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val purchasesIn = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    val joined = Streaming.joinPurchasesWithClicks(
      purchasesIn.toDF().toDF(cols: _*), clicksIn.toDF().toDF(cols: _*),
      lookback = "20 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // user 7: clicks at 10:05 (outside 20-min lookback) and 10:15 (inside);
      // user 8's click belongs to another user — must not pair.
      clicksIn.addData((101L, 7L, ts(5)), (102L, 7L, ts(15)), (103L, 8L, ts(29)))
      purchasesIn.addData((201L, 7L, ts(30)))
      q.processAllAvailable()
      val pairs = spark.table("ssjoin").select("p_event", "c_event")
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((201L, 102L)))
    } finally q.stop()
  }

  test("end-to-end file pipeline: landing JSONL -> cleaned deduped parquet") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("stream_e2e").toString
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()
    val doc = "This is a perfectly reasonable document with enough words to pass the filters in place."
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$landing/batch1.jsonl"),
      s"""{"url": "https://ok.example.com/a", "text": "$doc"}
         |{"url": "https://ok.example.com/b", "text": "$doc"}
         |{"url": "https://ok.example.com/c", "text": "too short"}
         |""".stripMargin)
    val schema = StructType(Seq(StructField("url", StringType), StructField("text", StringType)))
    val q = Streaming.runPipeline(spark, schema, landing,
      s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$base/out")
    // duplicate b collapsed by the watermark dedup; c kept but flagged
    assert(out.count() === 2)
    assert(out.filter(col("drop_reason").isNull).count() === 1)
    assert(out.columns.contains("text_pii_masked"))
    // stage-5 scoring ran on the stream: scores present and in range
    assert(out.columns.contains("quality_score") && out.columns.contains("subset"))
    val scores = out.select("quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0), scores.toSeq.toString)
    // stage-6 tokenisation ran on the stream: native-kernel ids match the
    // batch tokenizer, mask is all ones
    val kept = out.filter(col("drop_reason").isNull)
      .select("text_pii_masked", "input_ids", "n_tokens").collect()(0)
    assert(kept.getSeq[Int](1) === graft.text.Tokenize.encode(kept.getString(0)))
    assert(kept.getLong(2) === kept.getSeq[Int](1).length.toLong)
  }

  test("streaming boilerplate scrub equals the batch scrub per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("scrub").toString
    val shared = "a b c d e f g h i j" // one 10-token boilerplate line
    val corpus = Seq((100L, s"$shared corpus1"), (101L, s"$shared corpus2"))
      .toDF("doc_id", "text")
    val frequent = graft.ops.Curation.frequentLines(corpus)
    val in = MemoryStream[(Long, String)]
    val q = Streaming.scrubBoilerplate(in.toDF().toDF("doc_id", "text"),
      frequent, textCol = "text", idCol = "doc_id",
      outDir = s"$base/out", checkpointDir = s"$base/ckpt")
    try {
      in.addData((1L, s"$shared fresh tail"), (2L, "nothing shared here"))
      q.processAllAvailable()
      in.addData((3L, shared)) // scrubbed to empty
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select("doc_id", "n_lines", "n_removed", "clean_md5").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(out(1L) === ((2L, 1L, md5("fresh tail"))))
      assert(out(2L) === ((1L, 0L, md5("nothing shared here"))))
      assert(out(3L) === ((1L, 1L, md5(""))))
    } finally q.stop()
  }

  test("stream-static ANN probe scoring flags only above-threshold arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = Seq((100L, Array(1.0, 0.0)), (101L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val in = MemoryStream[(Long, Array[Double])]
    val stream = Streaming.scoreAgainstProbes(
      in.toDF().toDF("vec_id", "embedding"), probes, threshold = 0.9)
    val q = stream.writeStream.format("memory").queryName("probescore")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, Array(0.99, 0.1)), // near probe 100
        (2L, Array(0.7, 0.7)), // ~45° from both: below threshold
        (3L, Array(0.05, -0.9))) // near -probe101: cosine negative
      q.processAllAvailable()
      val rows = spark.table("probescore").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 100L)))
    } finally q.stop()
  }

  test("intake monitor: per-window doc/token/blank/dup accounting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val stream = Streaming.intakeMonitor(
      in.toDF().toDF("ts", "text"), window_ = "10 minutes")
    val q = stream.writeStream.format("memory").queryName("intake")
      .outputMode("complete").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      in.addData(
        (ts(1), "a b c"), (ts(2), "a b c"), // dup pair in window 10:00
        (ts(3), "  "), // blank
        (ts(12), "x y")) // next window
      q.processAllAvailable()
      val rows = spark.table("intake").collect()
        .map(r => r.getTimestamp(0).toString.substring(11, 16) ->
          (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))).toMap
      // window 10:00: 3 docs, 6 tokens, 1 blank, dup mass 1 (two "a b c")
      assert(rows("10:00") === ((3L, 6L, 1L, 1L)))
      assert(rows("10:10") === ((1L, 2L, 0L, 0L)))
    } finally q.stop()
  }

  test("trending terms: sliding windows count tokens per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val stream = Streaming.trendingTerms(
      in.toDF().toDF("ts", "text"),
      window_ = "10 minutes", slide = "5 minutes")
    val q = stream.writeStream.format("memory").queryName("trending")
      .outputMode("complete").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      in.addData((ts(1), "spark spark merge"), (ts(6), "spark sort"))
      q.processAllAvailable()
      val rows = spark.table("trending")
        .collect().map(r => (r.getTimestamp(0).toString.substring(11, 16),
          r.getString(1)) -> r.getLong(2)).toMap
      // 10:01 lands in windows [09:55,10:05) and [10:00,10:10);
      // 10:06 in [10:00,10:10) and [10:05,10:15)
      assert(rows(("09:55", "spark")) === 2L)
      assert(rows(("10:00", "spark")) === 3L)
      assert(rows(("10:05", "spark")) === 1L)
      assert(rows(("10:05", "sort")) === 1L)
      assert(!rows.contains(("09:55", "sort")))
    } finally q.stop()
  }

  test("stateless clean stage: streaming result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      ("https://ok.example.com/a", "This is a perfectly reasonable document with enough words to pass the filters in place."),
      ("https://ok.example.com/b", "too short"),
      ("https://ok.example.com/c", "12345.678"),
      ("https://ok.example.com/d", null.asInstanceOf[String])
    )
    val cols = Seq("url", "text")
    val batch = Streaming.cleanStream(docs.toDF(cols: _*))
      .select("url", "text_norm", "drop_reason", "token_count")
    val in = MemoryStream[(String, String)]
    val stream = Streaming.cleanStream(in.toDF().toDF(cols: _*))
      .select("url", "text_norm", "drop_reason", "token_count")
    val q = stream.writeStream.format("memory").queryName("cleaned")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("cleaned").collect().map(_.toSeq).toSet
      val want = batch.collect().map(_.toSeq).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("drift monitor: steady windows stay quiet, a level shift alerts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Long)]
    val out = Streaming.driftMonitor(
      in.toDF().toDF("source", "ts", "n_chars"), watermark = "2 minutes")
    val q = out.writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    try {
      // source a: five steady 1-minute windows of mean length 100,
      // then a 10x level shift in minute 5
      val steady = (0 to 4).flatMap(m =>
        Seq(("a", ts(m), 90L), ("a", ts(m), 110L)))
      val shift = Seq(("a", ts(5), 1000L), ("a", ts(5), 1000L))
      in.addData(steady ++ shift: _*)
      q.processAllAvailable()
      // sentinel events push the watermark past minute 5's window end
      in.addData(("zz", ts(20), 1L))
      q.processAllAvailable()
      in.addData(("zz", ts(40), 1L))
      q.processAllAvailable()
      val rows = spark.table("drift").filter(col("source") === "a")
        .orderBy("window_start")
        .select("n_docs", "mean_len_q", "alert")
        .as[(Long, Long, Boolean)].collect()
      assert(rows.length === 6, s"got ${rows.toSeq}")
      // every window saw both docs; means quantized x1e4
      assert(rows.take(5).forall(r => r._1 == 2L && r._2 == 1000000L))
      assert(rows.take(5).forall(!_._3), "steady state must not alert")
      assert(rows(5) === ((2L, 10000000L, true)), "10x shift must alert")
    } finally q.stop()
  }

  test("drift monitor: idle sources are evicted and restart their baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Long)]
    val out = Streaming.driftMonitor(
      in.toDF().toDF("source", "ts", "n_chars"), watermark = "2 minutes")
    val q = out.writeStream.format("memory").queryName("drift_evict")
      .outputMode("append").start()
    def nudge(m: Int): Unit = { in.addData(("zz", ts(m), 1L)); q.processAllAvailable() }
    try {
      in.addData(("e", ts(0), 100L), ("e", ts(0), 100L))
      q.processAllAvailable()
      nudge(20); nudge(22) // close window 0, arm idle timer at wm+30min
      nudge(50); nudge(51) // watermark crosses the idle horizon: evict
      in.addData(("e", ts(52), 900L), ("e", ts(52), 900L))
      q.processAllAvailable()
      nudge(56); nudge(57); nudge(58) // close window 52
      val rows = spark.table("drift_evict").filter(col("source") === "e")
        .orderBy("window_start")
        .select("mean_len_q", "ewma_q", "dd_q", "alert")
        .as[(Long, Long, Long, Boolean)].collect()
      assert(rows.length === 2, s"got ${rows.toSeq}")
      // post-eviction window starts a FRESH baseline: ewma equals its
      // own mean with zero deviation — the old 100-char baseline is
      // gone (un-evicted state would blend 1000000 toward 9000000 and
      // carry a huge dd)
      assert(rows(0) === ((1000000L, 1000000L, 0L, false)))
      assert(rows(1) === ((9000000L, 9000000L, 0L, false)))
    } finally q.stop()
  }

  test("drift monitor: an extreme shift still alerts (no d*d wraparound)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Long)]
    val out = Streaming.driftMonitor(
      in.toDF().toDF("source", "ts", "n_chars"), watermark = "2 minutes")
    val q = out.writeStream.format("memory").queryName("drift_big")
      .outputMode("append").start()
    try {
      // four tiny steady windows, then a GIGANTIC one: the squared
      // deviation (~1e26 in q-units) would wrap a pure-Long d*d
      // negative and silently suppress exactly this alert
      val evs = (0 to 3).map(m => ("g", ts(m), 10L)) :+
        ("g", ts(4), 1000000000L)
      in.addData(evs: _*)
      q.processAllAvailable()
      in.addData(("zz", ts(30), 1L)); q.processAllAvailable()
      in.addData(("zz", ts(50), 1L)); q.processAllAvailable()
      val rows = spark.table("drift_big").filter(col("source") === "g")
        .orderBy("window_start")
        .select("dd_q", "ewvar_q", "alert")
        .as[(Long, Long, Boolean)].collect()
      assert(rows.length === 5)
      assert(rows.last._3, "the extreme shift MUST alert")
      assert(rows.forall(r => r._1 >= 0L && r._2 >= 0L),
        "deviation and variance never go negative")
    } finally q.stop()
  }

  test("drift monitor: window closing order is batch-boundary-proof") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same events, different batch slicing -> identical EWMA trajectory
    def run(name: String, slices: Seq[Seq[(String, Timestamp, Long)]]) = {
      val in = MemoryStream[(String, Timestamp, Long)]
      val q = Streaming.driftMonitor(
        in.toDF().toDF("source", "ts", "n_chars"), watermark = "2 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        slices.foreach { s => in.addData(s: _*); q.processAllAvailable() }
        spark.table(name).filter(col("source") === "b")
          .orderBy("window_start")
          .select("mean_len_q", "ewma_q", "ewvar_q", "alert")
          .as[(Long, Long, Long, Boolean)].collect().toSeq
      } finally q.stop()
    }
    val evs = (0 to 6).map(m => ("b", ts(m), 100L + 13L * m)) :+
      ("zz", ts(40), 1L)
    val oneShot = run("drift_one", Seq(evs))
    val sliced = run("drift_two", evs.grouped(2).toSeq)
    assert(oneShot.nonEmpty && oneShot === sliced)
  }
}
