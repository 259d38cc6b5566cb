package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** The restart suite's key scenarios re-proven under Spark's RocksDB
  * state-store provider ([[Streaming.withRocksDbStateStore]]) — the
  * bounded-memory configuration a 100 TB intake runs with (the default
  * HDFS-backed provider holds all state on-heap; RocksDB spills to
  * local disk). Recovery semantics must be IDENTICAL: keyed
  * flatMapGroupsWithState state and open window buffers come back from
  * the checkpoint exactly as they do under the default provider, and
  * each test additionally proves RocksDB was really engaged by
  * inspecting the state checkpoint layout (RocksDB writes .zip/
  * .changelog snapshot artifacts; the HDFS provider writes .delta).
  */
class StreamingRocksDbSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  /** Files under a checkpoint's state/ tree, by extension. */
  private def stateFiles(base: String): Seq[String] = {
    val root = java.nio.file.Paths.get(s"$base/ckpt/state")
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val out = Seq.newBuilder[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) out += p.toString
    }
    out.result()
  }

  private def assertRocksDbEngaged(base: String): Unit = {
    val files = stateFiles(base)
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB snapshot artifacts under $base/ckpt/state: $files")
    assert(!files.exists(_.endsWith(".delta")),
      "HDFS-provider .delta files present: the toggle did not engage")
  }

  test("flagged dedup restart recovers keyed state under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Streaming.withRocksDbStateStore(spark) {
      val base = java.nio.file.Files.createTempDirectory("rocks_flagged").toString
      val in = MemoryStream[(Timestamp, String, String)]
      val df = in.toDF().toDF("ingest_ts", "id", "text")
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
      val q2 = start()
      try {
        in.addData((ts(2), "c", "HELLO WORLD"), (ts(3), "d", "new doc"))
        q2.processAllAvailable()
        val out = spark.read.parquet(s"$base/out")
        // "c" flagged as dup of "a" proves the keyed state store
        // round-tripped the RocksDB checkpoint — "a" never flowed
        // through q2
        val dupOf = out.filter(col("is_dup_exact"))
          .select("dedup_id", "dup_of").as[(String, Option[String])]
          .collect().toMap
        assert(dupOf === Map("c" -> Some("a")))
        assert(out.filter(!col("is_dup_exact"))
          .select("dedup_id").as[String].collect().toSet === Set("a", "b", "d"))
      } finally q2.stop()
      assertRocksDbEngaged(base)
    }
  }

  test("windowed aggregation restart merges buffers across the stop under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Streaming.withRocksDbStateStore(spark) {
      val base = java.nio.file.Files.createTempDirectory("rocks_window").toString
      val in = MemoryStream[(Timestamp, String, Double)]
      val df = in.toDF().toDF("ts", "event_type", "value")
      def start() = Streaming.eventsTumbling(df, window_ = "10 minutes",
          watermark = "5 minutes")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .start()
      val q1 = start()
      try {
        in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(spark.read.parquet(s"$base/out").count() === 0,
        "open window must not emit before the watermark closes it")
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
        assert(closed.length === 1)
        assert(closed(0).getLong(0) === 3L, "count must span the restart")
        assert(closed(0).getDouble(1) === 7.0, "sum must span the restart")
      } finally q2.stop()
      assertRocksDbEngaged(base)
    }
  }

  test("crawl chain dedup state recovers across a restart under RocksDB") {
    import spark.implicits._
    import graft.sources.Warc
    val docA = "This is a perfectly reasonable crawled document with " +
      "enough words to pass every quality filter in the chain."
    val docC = "Another entirely different crawled page that also has " +
      "plenty of words to clear each and every filter easily."
    def resp(path: String, body: String, minute: Int): Warc.WarcRecord = {
      val p = Warc.encodeHttpResponse(200, "text/html", body.getBytes("UTF-8"))
      Warc.WarcRecord("response", s"<urn:rdb:$path>",
        f"2026-01-01T10:$minute%02d:00Z", s"https://ok.example.org$path",
        "application/http;msgtype=response", p.length.toLong, p)
    }
    def drop(dir: String, name: String, recs: Seq[Warc.WarcRecord]): Unit = {
      val f = new java.io.FileOutputStream(s"$dir/$name")
      recs.foreach(r => f.write(Warc.encodeGzipMember(r)))
      f.close()
    }
    val base = java.nio.file.Files.createTempDirectory("crawl_rocks").toString
    val landing = s"$base/warc"
    new java.io.File(landing).mkdirs()
    val rules = Seq(("ok.example.org", "/", true))
      .toDF("host", "rule_path", "allow")
    Streaming.withRocksDbStateStore(spark) {
      drop(landing, "a.warc.gz", Seq(resp("/doc/1", docA, 1)))
      def start() = Streaming.runCrawl(spark, landing, rules,
        s"$base/out", s"$base/ckpt")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      drop(landing, "b.warc.gz", Seq(
        resp("/doc/2", docA, 10), resp("/doc/3", docC, 11)))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val out = spark.read.parquet(s"$base/out").select("url").as[String]
        .collect().toSeq
      assert(out.sorted === Seq("https://ok.example.org/doc/1",
        "https://ok.example.org/doc/3"),
        s"dedup state must recover under RocksDB: $out")
      assertRocksDbEngaged(base)
    }
  }

  test("politeness scheduler positions continue across a restart under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Streaming.withRocksDbStateStore(spark) {
      val base = java.nio.file.Files.createTempDirectory("rocks_sched").toString
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
          (ts(1), "a.example.org", 2L, 10L))
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start()
      try {
        in.addData((ts(2), "a.example.org", 3L, 10L))
        q2.processAllAvailable()
      } finally q2.stop()
      val got = spark.read.parquet(s"$base/out")
        .select("host", "doc_id", "seq", "fetch_at_sec")
        .as[(String, Long, Long, Long)].collect().toSet
      // seq=2 for the post-restart URL proves the per-host position
      // (one long) round-tripped the RocksDB checkpoint
      assert(got === Set(
        ("a.example.org", 1L, 0L, 0L), ("a.example.org", 2L, 1L, 10L),
        ("a.example.org", 3L, 2L, 20L)))
      assertRocksDbEngaged(base)
    }
  }

  test("the toggle scopes and restores the previous provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    Streaming.withRocksDbStateStore(spark) {
      assert(spark.conf.get(key) === Streaming.RocksDbProviderClass)
    }
    assert(spark.conf.getOption(key) === before,
      "provider conf must be restored after the scope")
  }
}
