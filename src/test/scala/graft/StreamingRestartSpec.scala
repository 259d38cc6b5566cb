package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Checkpoint-restart recovery: a streaming query stopped mid-stream and
  * restarted from its checkpoint must resume with its STATE — source
  * offsets (no reprocessing), dedup keys seen before the stop, custom
  * flagged-dedup lineage — not recompute from scratch or double-emit.
  * This is the failure-recovery half of the streaming contract; the
  * behavior specs in [[StreamingSpec]] cover the steady-state half.
  */
class StreamingRestartSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("file pipeline restart: offsets, sink exactly-once, and dedup state survive") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("stream_restart").toString
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()
    val docA = "This is a perfectly reasonable document with enough words to pass the filters in place."
    val docC = "Another entirely different document that also has plenty of words to clear every filter."
    val schema = StructType(Seq(StructField("url", StringType), StructField("text", StringType)))

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$landing/batch1.jsonl"),
      s"""{"url": "https://ok.example.com/a", "text": "$docA"}
         |""".stripMargin)
    val q1 = Streaming.runPipeline(spark, schema, landing, s"$base/out", s"$base/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(s"$base/out").count() === 1)

    // while the query is DOWN: a re-arrival of docA (upper-cased — same
    // canon hash) and a genuinely new doc land in the directory
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$landing/batch2.jsonl"),
      s"""{"url": "https://ok.example.com/a2", "text": "${docA.toUpperCase}"}
         |{"url": "https://ok.example.com/c", "text": "$docC"}
         |""".stripMargin)
    val q2 = Streaming.runPipeline(spark, schema, landing, s"$base/out", s"$base/ckpt")
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(s"$base/out")
    // batch1 was NOT reprocessed (file-sink exactly-once through the
    // checkpoint manifest): docA appears exactly once in total, and the
    // watermark-dedup state RECOVERED from the checkpoint dropped its
    // post-restart re-arrival; only docC is new
    assert(out.count() === 2, out.select("url").collect().toSeq.toString)
    assert(out.select("url").collect().map(_.getString(0)).toSet ===
      Set("https://ok.example.com/a", "https://ok.example.com/c"))
  }

  test("flagged stateful dedup restart: keyed state and lineage recover from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("flagged_restart").toString
    val in = MemoryStream[(Timestamp, String, String)]
    val df = in.toDF().toDF("ingest_ts", "id", "text")

    // parquet sink, not memory: the memory sink refuses checkpoint
    // recovery by design; the file sink's manifest is the recovery path
    // a real deployment uses
    def start() = Streaming.dedupStreamFlagged(df, "text", "id", "ingest_ts")
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()

    val q1 = start()
    try {
      in.addData((ts(0), "a", "Hello   World"), (ts(1), "b", "other doc"))
      q1.processAllAvailable()
    } finally q1.stop()
    val before = spark.read.parquet(s"$base/out")
      .select("dedup_id", "is_dup_exact").as[(String, Boolean)].collect().toMap
    assert(before === Map("a" -> false, "b" -> false))

    // restart from the checkpoint: the flatMapGroupsWithState keyed
    // state (exact_hash -> keeper id) must come back from the state
    // store, so a post-restart duplicate of "a" is flagged with lineage
    // to the PRE-restart keeper — cross-restart, not just cross-batch
    val q2 = start()
    try {
      in.addData((ts(2), "c", "HELLO WORLD"), (ts(3), "d", "new doc"))
      q2.processAllAvailable()
      // "c" can only be flagged as a dup of "a" if the keyed state came
      // back from the checkpoint — "a" itself never flowed through q2.
      // Pre-restart rows appear exactly once (file-sink manifest).
      val out = spark.read.parquet(s"$base/out")
      val dupOf = out.filter(col("is_dup_exact"))
        .select("dedup_id", "dup_of").as[(String, Option[String])]
        .collect().toMap
      assert(dupOf === Map("c" -> Some("a")))
      val kept = out.filter(!col("is_dup_exact"))
        .select("dedup_id").as[String].collect().toSet
      assert(kept === Set("a", "b", "d"))
    } finally q2.stop()
  }

  test("politeness scheduler restart: per-host positions continue from recovered state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sched_restart").toString
    val in = MemoryStream[(Timestamp, String, Long, Long)]
    val df = in.toDF().toDF("ts", "host", "doc_id", "crawl_delay")

    def start() = Streaming.scheduleStream(df)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()

    val q1 = start()
    try {
      in.addData((ts(0), "a.example.org", 1L, 10L),
        (ts(1), "a.example.org", 2L, 10L),
        (ts(2), "b.example.org", 3L, 5L))
      q1.processAllAvailable()
    } finally q1.stop()
    def slots() = spark.read.parquet(s"$base/out")
      .select("host", "doc_id", "seq", "fetch_at_sec")
      .as[(String, Long, Long, Long)].collect().toSeq
    val before = slots()
    assert(before.toSet === Set(
      ("a.example.org", 1L, 0L, 0L), ("a.example.org", 2L, 1L, 10L),
      ("b.example.org", 3L, 0L, 0L)))

    // restart from the checkpoint: host a's next position (2) must come
    // back from the recovered GroupState — a reset to seq=0 would
    // double-book the host's politeness slots, and a re-emission of the
    // pre-stop rows would double-fetch them (the scaladoc's
    // cross-restart continuation claim, pinned; its cross-BATCH half
    // lives in StreamingSpec)
    val q2 = start()
    try {
      in.addData((ts(3), "a.example.org", 4L, 10L),
        (ts(4), "c.example.org", 5L, 7L))
      q2.processAllAvailable()
    } finally q2.stop()
    val after = slots()
    assert(after.size === 5, s"pre-restart slots must appear exactly once: $after")
    assert(after.toSet === before.toSet ++ Set(
      ("a.example.org", 4L, 2L, 20L), ("c.example.org", 5L, 0L, 0L)))
  }

  test("windowed aggregation restart: buffers merge rows from both sides of the stop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("window_restart").toString
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")

    def start() = Streaming.eventsTumbling(df, window_ = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()

    // two rows land in the 10:00-10:10 window, then the query STOPS
    // with the window still open (watermark has not passed 10:10)
    val q1 = start()
    try {
      in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$base/out").count() === 0,
      "open window must not emit before the watermark closes it")

    // after restart: one more row in the SAME window, then an event far
    // enough ahead to close it — the emitted count must include the
    // pre-restart rows, which only works if the aggregation buffer came
    // back from the state store
    val q2 = start()
    try {
      in.addData((ts(7), "click", 4.0))
      q2.processAllAvailable()
      in.addData((ts(30), "click", 0.5))
      q2.processAllAvailable()
      val closed = spark.read.parquet(s"$base/out")
        .filter(col("event_type") === "click" &&
          col("window_start") === ts(0))
        .select("n_events", "sum_value").collect()
      assert(closed.length === 1, "exactly one emission for the closed window")
      assert(closed(0).getLong(0) === 3L, "count must span the restart")
      assert(closed(0).getDouble(1) === 7.0, "sum must span the restart")
    } finally q2.stop()
  }

  test("corpus-state near-dup restart: crashed attempt replaced, flags = uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val para = "the quick brown fox jumps over the lazy dog again and again today"
    val batch0 = Seq((1L, s"$para with corpus trailing words"),
      (2L, "entirely different first-batch content about nothing shared"))
    val batch1 = Seq(
      (10L, s"$para with corpus trailing words"), // corpus near-dup of 1
      (11L, "novel second-batch material unlike anything previous"),
      (12L, "novel second-batch material unlike anything previous")) // batch dup of 11

    // run the two micro-batches through a fresh pipeline; between them,
    // optionally plant a CRASHED ATTEMPT of batch 1: the worst failure
    // window is "both sinks written, checkpoint never committed", so the
    // plant is a full copy of what batch 1 legitimately writes (taken
    // from the clean run), plus a footer-less zero-byte parquet file —
    // the shape a mid-write kill leaves behind
    def run(plantFrom: Option[String]): String = {
      val base = java.nio.file.Files.createTempDirectory("near_restart").toString
      val in = MemoryStream[(Long, String)]
      def start() = Streaming.nearDedupAgainstCorpus(in.toDF().toDF("doc_id", "text"),
        textCol = "text", idCol = "doc_id",
        stateDir = s"$base/state", outDir = s"$base/out",
        checkpointDir = s"$base/ckpt", threshold = 0.6)
      val q1 = start()
      try { in.addData(batch0: _*); q1.processAllAvailable() } finally q1.stop()
      plantFrom.foreach { src =>
        for (d <- Seq("state", "out")) {
          val from = java.nio.file.Paths.get(s"$src/$d/batch=1")
          val to = java.nio.file.Paths.get(s"$base/$d/batch=1")
          java.nio.file.Files.createDirectories(to)
          java.nio.file.Files.list(from).forEach { f =>
            java.nio.file.Files.copy(f, to.resolve(f.getFileName.toString))
          }
          java.nio.file.Files.write(to.resolve("part-99999-crashed.parquet"),
            Array.emptyByteArray) // the mid-write torso
        }
      }
      val q2 = start()
      try { in.addData(batch1: _*); q2.processAllAvailable() } finally q2.stop()
      base
    }

    def snapshot(base: String): (Map[Long, (Boolean, Any, Boolean, Any)], Seq[Long]) = {
      val out = spark.read.parquet(s"$base/out")
        .select(col("doc_id"), col("is_dup_near_batch"), col("batch_dup_of"),
          col("is_dup_near_corpus"), col("near_dup_of")).collect()
      val flags = out.map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.get(2), r.getBoolean(3), r.get(4)))).toMap
      val stateIds = spark.read.parquet(s"$base/state")
        .select("id").as[Long].collect().toSeq
      (flags, stateIds)
    }

    val clean = run(plantFrom = None)
    val (cleanFlags, cleanState) = snapshot(clean)
    // sanity on the clean run itself
    assert(cleanFlags(10L)._3 && cleanFlags(10L)._4 === 1L, "10 corpus-dups 1")
    assert(cleanFlags(12L)._1 && cleanFlags(12L)._2 === 11L, "12 batch-dups 11")
    assert(cleanState.sorted === Seq(1L, 2L, 11L), "kept sketches only")

    val replayed = run(plantFrom = Some(clean))
    val (replayFlags, replayState) = snapshot(replayed)
    // every output row exactly once (overwrite replaced the planted copy)
    assert(spark.read.parquet(s"$replayed/out").count() === 5)
    // no sketch lost, none double-appended
    assert(replayState.sorted === cleanState.sorted)
    assert(replayState.distinct.length === replayState.length)
    // and the flags are bit-identical to the uninterrupted run — in
    // particular 12 must stay a BATCH dup of 11, which only holds if the
    // replay did not read its own crashed attempt's sketches as corpus
    assert(replayFlags === cleanFlags)
  }

  test("corpus-state lineage guard: fresh checkpoint against old state fails fast") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("lineage_guard").toString
    // a prior run's state: batches 0 and 1 already on disk
    Seq(("h0", "d0")).toDF("exact_hash", "dedup_id")
      .write.parquet(s"$base/state/batch=0")
    Seq(("h1", "d1")).toDF("exact_hash", "dedup_id")
      .write.parquet(s"$base/state/batch=1")
    val in = MemoryStream[(Timestamp, String, String)]
    // FRESH checkpoint -> this query's ids restart at 0; per-batch
    // overwrite would silently destroy the prior state batch by batch,
    // so the reader must refuse the mismatched lineage loudly
    val q = Streaming.dedupAgainstCorpus(
      in.toDF().toDF("ingest_ts", "id", "text"), "text", "id",
      s"$base/state", s"$base/out", s"$base/ckpt_fresh")
    try {
      in.addData((ts(0), "a", "some doc"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("different checkpoint lineage")),
        s"got: ${msgs(ex)}")
      // and the prior state was NOT touched
      assert(spark.read.parquet(s"$base/state/batch=1").count() === 1)
    } finally q.stop()
  }

  test("drift monitor restart: EWMA trajectory is bit-identical across the stop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the monitor's claim is a bit-deterministic alert trajectory; the
    // hard half of that claim is RESTART — the EWMA/EW-variance state and
    // the open-window accumulators must recover from the checkpoint so the
    // post-restart windows continue the same integer sequence
    val lens = (0 to 7).map(m => 100L + 31L * m) // drifting means
    def events(ms: Range) = ms.flatMap(m =>
      Seq(("d", ts(m), lens(m) - 5L), ("d", ts(m), lens(m) + 5L)))
    val sentinel1 = ("zz", ts(20), 1L)
    val sentinel2 = ("zz", ts(40), 1L)

    def run(base: String, split: Boolean): Seq[(Long, Long, Long, Long, Boolean)] = {
      val in = MemoryStream[(String, Timestamp, Long)]
      def start() = Streaming.driftMonitor(
        in.toDF().toDF("source", "ts", "n_chars"), watermark = "2 minutes")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      val q1 = start()
      try {
        in.addData(events(0 to 3): _*)
        q1.processAllAvailable()
        if (!split) {
          in.addData(events(4 to 7) :+ sentinel1: _*)
          q1.processAllAvailable()
          in.addData(sentinel2)
          q1.processAllAvailable()
        }
      } finally q1.stop()
      if (split) {
        // restart from the checkpoint, then feed the remaining windows
        val q2 = start()
        try {
          in.addData(events(4 to 7) :+ sentinel1: _*)
          q2.processAllAvailable()
          in.addData(sentinel2)
          q2.processAllAvailable()
        } finally q2.stop()
      }
      spark.read.parquet(s"$base/out").filter(col("source") === "d")
        .orderBy("window_start")
        .select(col("window_start").cast("long"), col("mean_len_q"),
          col("ewma_q"), col("ewvar_q"), col("alert"))
        .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    }

    val clean = run(
      java.nio.file.Files.createTempDirectory("drift_clean").toString,
      split = false)
    val restarted = run(
      java.nio.file.Files.createTempDirectory("drift_restart").toString,
      split = true)
    assert(clean.length === 8, s"got $clean")
    assert(clean.map(_._1).distinct.length === 8, "exactly-once per window")
    assert(restarted === clean,
      "restart must continue the identical integer EWMA sequence")
  }

  test("streaming crawl chain e2e: intake -> robots gate -> clean -> " +
    "watermark dedup, with offsets and dedup state surviving a restart") {
    import spark.implicits._
    import graft.sources.Warc
    val docA = "This is a perfectly reasonable crawled document with " +
      "enough words to pass every quality filter in the chain."
    val docC = "Another entirely different crawled page that also has " +
      "plenty of words to clear each and every filter easily."
    def resp(path: String, body: String, minute: Int): Warc.WarcRecord = {
      val p = Warc.encodeHttpResponse(200, "text/html", body.getBytes("UTF-8"))
      Warc.WarcRecord("response", s"<urn:cx:$path>",
        f"2026-01-01T10:$minute%02d:00Z", s"https://ok.example.org$path",
        "application/http;msgtype=response", p.length.toLong, p)
    }
    def drop(dir: String, name: String, recs: Seq[Warc.WarcRecord]): Unit = {
      val f = new java.io.FileOutputStream(s"$dir/$name")
      recs.foreach(r => f.write(Warc.encodeGzipMember(r)))
      f.close()
    }
    val base = java.nio.file.Files.createTempDirectory("crawl_restart").toString
    val landing = s"$base/warc"
    new java.io.File(landing).mkdirs()
    val rules = Seq(
      ("ok.example.org", "/", true),
      ("ok.example.org", "/private/", false))
      .toDF("host", "rule_path", "allow")
    // drop 1: a keeper, a robots-blocked page, an in-batch duplicate of
    // the keeper (same body, later path), and a too-short page
    drop(landing, "a.warc.gz", Seq(
      resp("/doc/1", docA, 1),
      resp("/private/2", docA, 2),
      resp("/doc/3", docA, 3),
      resp("/doc/4", "tiny", 4)))
    def start() = Streaming.runCrawl(spark, landing, rules,
      s"$base/out", s"$base/ckpt")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val first = spark.read.parquet(s"$base/out")
      .select("url").as[String].collect().toSet
    // robots blocked /private/2 BEFORE dedup (a blocked page must not
    // shadow the keeper), quality dropped /doc/4, dedup kept first
    assert(first === Set("https://ok.example.org/doc/1"), first.toString)
    // while the query is DOWN: a re-arrival of docA, a new page, and a
    // record with a MALFORMED WARC-Date land (the event time must fall
    // back to the archive file's mtime — not NULL, which the
    // watermarked dedup would silently discard as late data)
    val docD = "This is one more of the crawled pages that we have and " +
      "it has all of the words that you need to pass every filter here."
    val badDate = {
      val p = Warc.encodeHttpResponse(200, "text/html", docD.getBytes("UTF-8"))
      Warc.WarcRecord("response", "<urn:cx:bad>", "not-a-date",
        "https://ok.example.org/doc/7",
        "application/http;msgtype=response", p.length.toLong, p)
    }
    drop(landing, "b.warc.gz", Seq(
      resp("/doc/5", docA, 10),
      resp("/doc/6", docC, 11),
      badDate))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(s"$base/out").select("url").as[String]
      .collect().toSeq
    // drop 1 not reprocessed (exactly-once), dedup state recovered from
    // the checkpoint swallowed the docA re-arrival, docC is new, and the
    // malformed-date record SURVIVED on its file-mtime event time
    assert(out.sorted === Seq("https://ok.example.org/doc/1",
      "https://ok.example.org/doc/6",
      "https://ok.example.org/doc/7"), out.toString)
  }

  test("media crawl restart: perceptual dedup state survives — a " +
    "cross-format re-arrival after the restart is swallowed, new media " +
    "and new raw payloads pass") {
    import spark.implicits._
    import graft.sources.Warc
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
    val pixA = px(p => (p * 37) % 256)
    val pixB = px(p => (p * 5 + 9) % 256)
    val samples = Array.tabulate(400)(i => ((i * 53) % 256 - 128) * 64)
    val junkA = Array.fill[Byte](64)(3)
    val junkB = Array.fill[Byte](64)(4)
    def media(path: String, ctype: String, body: Array[Byte],
              minute: Int): Warc.WarcRecord = {
      val p = Warc.encodeHttpResponse(200, ctype, body)
      Warc.WarcRecord("response", s"<urn:mx:$path>",
        f"2026-01-01T10:$minute%02d:00Z", s"https://media.example.org$path",
        "application/http;msgtype=response", p.length.toLong, p)
    }
    def drop(dir: String, name: String, recs: Seq[Warc.WarcRecord]): Unit = {
      val f = new java.io.FileOutputStream(s"$dir/$name")
      recs.foreach(r => f.write(Warc.encodeGzipMember(r)))
      f.close()
    }
    val base = java.nio.file.Files.createTempDirectory("media_restart").toString
    val landing = s"$base/warc"
    new java.io.File(landing).mkdirs()
    // drop 1: one image (QOI), one audio clip (FLAC), one undecodable
    // image payload (raw: fallback key)
    drop(landing, "a.warc.gz", Seq(
      media("/img/1", "image/qoi", graft.ops.QoiCodec.encode(w, h, 3, pixA), 1),
      media("/aud/1", "audio/flac", graft.ops.FlacCodec.encodeFlac16(
        8000, 1, samples, subframe = 0, midSide = false, partitions2 = true), 2),
      media("/bin/1", "image/x-junk", junkA, 3)))
    def start() = Streaming.runMediaCrawl(spark, landing,
      s"$base/out", s"$base/ckpt")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val first = spark.read.parquet(s"$base/out")
      .select("url").as[String].collect().toSet
    assert(first === Set("https://media.example.org/img/1",
      "https://media.example.org/aud/1",
      "https://media.example.org/bin/1"), first.toString)
    // while the query is DOWN: pixA re-arrives AS A PNG (byte-disjoint,
    // perceptually identical — only the checkpointed SIGNATURE state
    // can catch it), the same recording re-arrives AS A WAV, the same
    // junk bytes re-arrive, plus one genuinely new image and one new
    // junk payload
    drop(landing, "b.warc.gz", Seq(
      media("/img/2", "image/png", graft.ops.ImageCodec.encodePng(w, h, pixA), 10),
      media("/img/3", "image/qoi", graft.ops.QoiCodec.encode(w, h, 3, pixB), 11),
      media("/aud/2", "audio/wav", graft.ops.AudioCodec.encodeWav16(
        8000, 1, samples.map(_ / 32768f)), 12),
      media("/bin/2", "image/x-junk", junkA, 13),
      media("/bin/3", "image/x-junk", junkB, 14)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(s"$base/out").select("url").as[String]
      .collect().toSeq
    // drop 1 not reprocessed (exactly-once); the recovered signature
    // state swallowed the PNG re-encode, the WAV re-container and the
    // byte-identical junk; the new image and new junk survive
    assert(out.sorted === Seq("https://media.example.org/aud/1",
      "https://media.example.org/bin/1",
      "https://media.example.org/bin/3",
      "https://media.example.org/img/1",
      "https://media.example.org/img/3"), out.toString)
  }
}
