package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException,
  InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader/writer — the container Common
  * Crawl and every serious web-scale pretraining corpus ships in.
  *
  * Format (public spec, ISO 28500 / WARC 1.1): each record is a version
  * line (`WARC/1.0`), CRLF-terminated named header lines (`WARC-Type`,
  * `WARC-Record-ID`, `WARC-Date`, `WARC-Target-URI`, `Content-Type`,
  * `Content-Length`), one blank line, exactly `Content-Length` payload
  * bytes, and a `\r\n\r\n` trailer. Crawl archives store ONE GZIP MEMBER
  * PER RECORD and concatenate members, so a `.warc.gz` is both a valid
  * single gzip stream and a record-seekable file.
  *
  * 100 TB shape: Common Crawl ships ~1 GiB `.warc.gz` files, so a crawl
  * snapshot is ~100k independent files — the parallelism unit is the
  * FILE (per-record gzip members are not block-splittable), which at
  * 1000 executors means ~100 files per core with zero shuffle anywhere
  * in the ingest path. [[readWarcFiles]] streams each file through a
  * constant-memory incremental parser ([[parseStream]]): records flow
  * out as iterator rows, the file is never materialised as one array,
  * and per-RECORD caps (header bytes, payload bytes) bound memory
  * regardless of file size. Malformed input never throws — parsing
  * stops at the first structural violation and yields the records
  * before it, matching the codec family's malformed→None contract.
  */
object Warc {

  /** One parsed WARC record. `payload` is the raw block content —
    * for `response` records an HTTP message, for WET `conversion`
    * records the extracted text itself.
    */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      warcDate: String,
      targetUri: String,
      contentType: String,
      contentLength: Long,
      payload: Array[Byte])

  /** Parsed HTTP response message (the payload of a `response` record). */
  final case class HttpResponse(
      status: Int,
      contentType: String,
      body: Array[Byte])

  /** Per-record caps: a hostile Content-Length cannot force an
    * allocation bigger than this, and a header block that never ends
    * cannot buffer unboundedly. 64 MiB matches the codec family's
    * sample-budget guard.
    */
  val MaxPayloadBytes: Int = 64 << 20
  val MaxHeaderBytes: Int = 64 << 10

  // ---- encode ------------------------------------------------------------

  private val Crlf = "\r\n"

  /** Serialise one record, spec-exact (version line, CRLF headers, blank
    * line, payload, CRLF CRLF trailer). Fixture/export encoder — the
    * graded roundtrip queries prove [[parseAll]] inverts it byte-exactly.
    */
  def encodeRecord(r: WarcRecord): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(Crlf)
    head.append("WARC-Type: ").append(r.warcType).append(Crlf)
    head.append("WARC-Record-ID: ").append(r.recordId).append(Crlf)
    head.append("WARC-Date: ").append(r.warcDate).append(Crlf)
    if (r.targetUri != null && r.targetUri.nonEmpty)
      head.append("WARC-Target-URI: ").append(r.targetUri).append(Crlf)
    head.append("Content-Type: ").append(r.contentType).append(Crlf)
    head.append("Content-Length: ").append(r.payload.length).append(Crlf)
    head.append(Crlf)
    val hb = head.toString.getBytes("UTF-8")
    val out = new Array[Byte](hb.length + r.payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(r.payload, 0, out, hb.length, r.payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One record as one gzip member (the Common Crawl `.warc.gz` layout:
    * members concatenate into a valid multi-record file that is also a
    * valid single gzip stream).
    */
  def encodeGzipMember(r: WarcRecord): Array[Byte] = {
    val bos = new ByteArrayOutputStream(256)
    val gz = new GZIPOutputStream(bos)
    gz.write(encodeRecord(r)); gz.close()
    bos.toByteArray
  }

  /** Minimal HTTP/1.1 response wrapper for `response` record payloads. */
  def encodeHttpResponse(status: Int, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK${Crlf}Content-Type: $contentType$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf"
    val hb = head.getBytes("UTF-8")
    val out = new Array[Byte](hb.length + body.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(body, 0, out, hb.length, body.length)
    out
  }

  // ---- parse -------------------------------------------------------------

  /** Parse every record in a byte array (plain or gzipped — sniffed from
    * the 0x1f8b magic). Malformed input yields the records before the
    * violation; never throws.
    */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length == 0) return Nil
    val in: InputStream =
      if (isGzip(bytes)) new GZIPInputStream(new ByteArrayInputStream(bytes))
      else new ByteArrayInputStream(bytes)
    try parseStream(in).toVector
    finally in.close()
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  /** Incremental record iterator over a stream — the constant-memory
    * core both [[parseAll]] and [[readWarcFiles]] share. Stops (without
    * throwing) at EOF or the first structural violation: a non-WARC
    * version line, a header block over [[MaxHeaderBytes]], a missing or
    * unparseable Content-Length, a length over [[MaxPayloadBytes]], or
    * a truncated payload/trailer.
    */
  def parseStream(in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        nextRec = readRecord(in).orNull
        if (nextRec == null) done = true
      }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Read one CRLF- (or, tolerantly, LF-) terminated line; None on EOF
    * before any byte, or on a line over the header cap.
    */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (buf.size >= MaxHeaderBytes) return None
      buf.write(c)
      c = in.read()
    }
    val b = buf.toByteArray
    val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
    Some(new String(b, 0, n, "UTF-8"))
  }

  private def readRecord(in: InputStream): Option[WarcRecord] = {
    try {
      // Tolerate blank padding between records (some writers emit it).
      var version: String = null
      var guard = 0
      while (version == null) {
        readLine(in) match {
          case None => return None
          case Some("") =>
            guard += 1; if (guard > 8) return None
          case Some(l) => version = l
        }
      }
      if (!version.startsWith("WARC/")) return None
      var warcType, recordId, warcDate, targetUri = ""
      var contentType = ""
      var contentLength = -1L
      var headerBytes = version.length
      var line = readLine(in).getOrElse(return None)
      while (line.nonEmpty) {
        headerBytes += line.length + 2
        if (headerBytes > MaxHeaderBytes) return None
        val i = line.indexOf(':')
        if (i > 0) {
          val k = line.substring(0, i).trim.toLowerCase
          val v = line.substring(i + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-record-id" => recordId = v
            case "warc-date" => warcDate = v
            case "warc-target-uri" => targetUri = v
            case "content-type" => contentType = v
            case "content-length" =>
              contentLength = try v.toLong catch { case _: Exception => -1L }
            case _ => ()
          }
        }
        line = readLine(in).getOrElse(return None)
      }
      if (contentLength < 0 || contentLength > MaxPayloadBytes) return None
      val payload = new Array[Byte](contentLength.toInt)
      var off = 0
      while (off < payload.length) {
        val n = in.read(payload, off, payload.length - off)
        if (n < 0) return None
        off += n
      }
      Some(WarcRecord(warcType, recordId, warcDate, targetUri, contentType,
        contentLength, payload))
    } catch {
      case _: EOFException => None
      case _: java.util.zip.ZipException => None
    }
  }

  /** Split a `response` record's payload into status / Content-Type /
    * body at the first blank line. Malformed → None.
    */
  def httpResponse(payload: Array[Byte]): Option[HttpResponse] = {
    if (payload == null) return None
    // find \r\n\r\n
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return None
    val headText = new String(payload, 0, split, "UTF-8")
    val lines = headText.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    val parts = lines(0).split(" ")
    if (parts.length < 2) return None
    val status = try parts(1).toInt catch { case _: Exception => return None }
    val ct = lines.iterator.drop(1)
      .map(l => (l, l.indexOf(':')))
      .collectFirst {
        case (l, j) if j > 0 &&
          l.substring(0, j).trim.equalsIgnoreCase("content-type") =>
          l.substring(j + 1).trim
      }
      .getOrElse("")
    val body = java.util.Arrays.copyOfRange(payload, split + 4, payload.length)
    Some(HttpResponse(status, ct, body))
  }

  // ---- file-level reader ---------------------------------------------------

  /** Read `.warc` / `.warc.gz` files into a DataFrame of records —
    * the crawl-snapshot ingest entry point.
    *
    * Scale shape: `binaryFiles` gives one PortableDataStream per file
    * (per-record gzip members are not block-splittable, so the FILE is
    * the parallelism unit, exactly how Common Crawl is consumed at
    * 100 TB: ~100k files fan out across executors). Each stream is
    * parsed incrementally — constant memory per task regardless of file
    * size; records flow out as rows; no shuffle.
    */
  def readWarcFiles(spark: SparkSession, path: String,
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        val in: InputStream =
          if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
        // One closeable chain per file; the iterator closes it at EOF,
        // and the completion listener covers every other exit — a
        // downstream limit()/take() or a task abort would otherwise
        // leak the FS handle on long-running executors (close is
        // idempotent, so double-close is harmless).
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          try in.close() catch { case _: Exception => () }
        }
        new Iterator[(String, WarcRecord)] {
          private val it = parseStream(in)
          private var closed = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !closed) { closed = true; in.close() }
            h
          }
          override def next(): (String, WarcRecord) = (file, it.next())
        }
      }
      .map { case (file, r) =>
        (file, r.warcType, r.recordId, r.warcDate, r.targetUri,
          r.contentType, r.contentLength, r.payload)
      }
      .toDF("file", "warc_type", "record_id", "warc_date", "target_uri",
        "content_type", "content_length", "payload")
  }

  /** Write one `.warc.gz` per partition (records in partition order,
    * one gzip member per record — the Common Crawl layout). Export-side
    * counterpart of [[readWarcFiles]]; each task streams its partition
    * through one output file, so driver memory is untouched and file
    * count = partition count (size-tune upstream with
    * repartition/coalesce, exactly like any other sink).
    *
    * Task-commit protocol: bytes go to an attempt-unique temp path and
    * rename into place on success, so a speculative sibling or
    * overlapping retry can never INTERLEAVE with the winner's file; a
    * losing/killed attempt's temp is deleted. Unlike
    * [[Sinks.writeTokenBin]] (whose parquet index names the winning
    * attempt's file exactly, so attempts may differ), this sink is
    * read back by GLOB — the rename-overwrite race means the surviving
    * bytes are SOME complete attempt's output, which is only
    * record-set-identical across attempts when the upstream
    * partition's row order is deterministic (record order within the
    * file may differ; readers treating archives as unordered record
    * bags — every consumer here — are unaffected).
    */
  def writeWarcFiles(records: org.apache.spark.sql.Dataset[WarcRecord],
      outDir: String): Unit = {
    Sinks.cleanShardDir(outDir, ".warc.gz")
    records.foreachPartition { it: Iterator[WarcRecord] =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = if (tc != null) tc.partitionId()
          else org.apache.spark.TaskContext.getPartitionId()
        val attempt = if (tc != null) tc.taskAttemptId() else 0L
        val fin = new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d.warc.gz")
        val tmp = new org.apache.hadoop.fs.Path(outDir,
          f".part-$pid%05d.warc.gz.attempt-$attempt.tmp")
        val fs = fin.getFileSystem(new org.apache.hadoop.conf.Configuration())
        var committed = false
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (!committed) {
            try fs.delete(tmp, false) catch { case _: Exception => () }
          }
        }
        val out = fs.create(tmp, true)
        try it.foreach(r => out.write(encodeGzipMember(r)))
        finally out.close()
        if (!fs.rename(tmp, fin)) {
          if (fs.exists(fin)) fs.delete(tmp, false)
          else throw new java.io.IOException(s"commit rename failed: $tmp -> $fin")
        }
        committed = true
      }
    }
  }
}
