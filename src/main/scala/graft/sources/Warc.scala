package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (Web ARChive, ISO 28500) ingestion — the wire format Common Crawl
 * publishes, i.e. the REAL upstream of the `input_hint` pages table. A
 * WARC file is a sequence of records:
 *
 *   WARC/1.0<CRLF>
 *   <Name>: <value><CRLF> ...          (named headers)
 *   <CRLF>
 *   <Content-Length payload bytes>     (arbitrary binary — may contain CRLFs)
 *   <CRLF><CRLF>
 *
 * Parsing is length-delimited (`Content-Length`), never delimiter-split:
 * payloads carry raw HTTP/HTML bytes with embedded blank lines, so any
 * line-oriented reader corrupts them. Records parse inside a typed
 * `Dataset.flatMap` over Spark's `binaryFile` source — each file parses
 * independently in its own task, mirroring how Common Crawl's ~1 GB
 * segment files are the unit of parallelism. `.warc.gz` is supported:
 * Common Crawl gzips each record as its own gzip MEMBER, and
 * `GZIPInputStream` consumes concatenated members as one stream, so the
 * decompressed bytes are the plain WARC byte sequence.
 */
object Warc {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      warcDate: String,
      recordId: String,
      contentType: String,
      payload: Array[Byte])

  /**
   * STREAMING record parser: records materialize one at a time from the
   * input stream (a segment NEVER exists as one decompressed array — a
   * real ~1 GB `.warc.gz` inflates past the 2 GB JVM array limit, and
   * even below it, whole-segment buffering triples peak memory). Throws
   * (with the byte offset) on malformed input — a truncated crawl
   * segment should fail the task loudly, not yield silently fewer pages.
   */
  def parseStream(in: java.io.InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      // `pos` = 0-based stream position OF THE LOOKAHEAD BYTE, so error
      // offsets point AT the malformed byte, not past it
      private var pos = -1L
      private var closed = false
      private var nextByte: Int = read() // 1-byte lookahead
      private def read(): Int = {
        if (closed) return -1
        val b = in.read()
        pos += 1
        if (b < 0) { closed = true; in.close() } // EOF releases the stream
        b
      }
      private def fail(msg: String): Nothing = {
        if (!closed) { closed = true; in.close() } // errors release it too
        throw new IllegalArgumentException(msg)
      }
      private def check(ok: Boolean, msg: => String): Unit = if (!ok) fail(msg)
      private def advance(): Int = { val b = nextByte; nextByte = read(); b }
      private def skipCrlf(): Unit =
        while (nextByte == '\r') {
          advance()
          check(nextByte == '\n', s"WARC: lone CR at offset ${pos - 1}")
          advance()
        }
      skipCrlf()
      override def hasNext: Boolean = nextByte >= 0
      override def next(): WarcRecord = {
        val start = pos
        // header block: bytes until CRLF CRLF
        val hb = new java.io.ByteArrayOutputStream(256)
        var run = 0 // consecutive \r\n\r\n progress
        while (run < 4) {
          check(nextByte >= 0, s"WARC: unterminated header block at offset $start")
          val b = advance()
          run = (run, b) match {
            case (0, '\r') => 1
            case (1, '\n') => 2
            case (2, '\r') => 3
            case (3, '\n') => 4
            case (_, '\r') => 1
            case _ => 0
          }
          hb.write(b)
        }
        val lines = new String(hb.toByteArray, UTF_8).stripSuffix("\r\n\r\n").split("\r\n")
        check(lines.nonEmpty && lines(0).startsWith("WARC/"),
          s"WARC: expected version line at offset $start, got '${lines.headOption.getOrElse("")}'")
        val headers = lines.tail.map { l =>
          val i = l.indexOf(':')
          check(i > 0, s"WARC: malformed header '$l' at offset $start")
          l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
        }.toMap
        val clen = headers.getOrElse("content-length",
          fail(s"WARC: missing Content-Length at offset $start")).toLong
        check(clen >= 0 && clen <= Int.MaxValue - 8,
          s"WARC: invalid Content-Length $clen at offset $start")
        // bulk payload read (first byte comes from the lookahead)
        val payload = new Array[Byte](clen.toInt)
        if (clen > 0) {
          check(nextByte >= 0,
            s"WARC: truncated payload at offset $pos (need $clen bytes)")
          payload(0) = nextByte.toByte
          var got = 1
          while (got < clen) {
            val n = if (closed) -1 else in.read(payload, got, clen.toInt - got)
            check(n > 0,
              s"WARC: truncated payload at offset ${pos + got} (need $clen bytes)")
            got += n
          }
          pos += clen - 1
          nextByte = read()
        }
        skipCrlf() // the record's closing CRLF CRLF (and any padding)
        WarcRecord(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""),
          headers.getOrElse("warc-record-id", ""),
          headers.getOrElse("content-type", ""),
          payload)
      }
    }

  /** Convenience wrapper over [[parseStream]] for in-memory fixtures. */
  def parseAll(bytes: Array[Byte]): Iterator[WarcRecord] =
    parseStream(new java.io.ByteArrayInputStream(bytes))

  /** All records of every `*.warc` / `*.warc.gz` under `path`, as a typed
    * Dataset (the flatMap is Dataset-typed, not an RDD — input_hint
    * mandate). The file BYTES are streamed too, not just the gzip
    * decompression: only `path` rides the binaryFile scan (column pruning
    * keeps `content` out of the plan), and each task opens its file with
    * a Hadoop `FileSystem` input stream inside the flatMap — so a task's
    * memory is O(buffer), not O(segment), and files past Spark's ~2 GB
    * binaryFile row limit (a real ~1 GB `.warc.gz` is routine for Common
    * Crawl) parse fine. One file = one task, matching how CC segments are
    * the unit of parallelism. */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"))
      .as[String]
      .flatMap { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val raw = new java.io.BufferedInputStream(
          hp.getFileSystem(conf.value).open(hp), 1 << 16)
        // parseStream closes on EOF/parse-error, but a consumer that stops
        // early (limit/take, a join that quits pulling) abandons the
        // iterator mid-file — close at task end so the handle can't leak.
        // The listener is registered BEFORE the gzip wrap (its constructor
        // eagerly reads the header and throws on a truncated file) and
        // closes the OUTERMOST stream reached: closing the gzip wrapper
        // releases the Inflater's native buffers too, not just the fd.
        val outermost = new java.util.concurrent.atomic.AtomicReference[java.io.InputStream](raw)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          try outermost.get().close() catch { case _: java.io.IOException => () }
        }
        val in =
          if (p.endsWith(".gz"))
            new java.io.BufferedInputStream(
              new java.util.zip.GZIPInputStream(raw), 1 << 16)
          else raw
        outermost.set(in)
        parseStream(in)
      }
  }

  /** WARC `response` payloads are full HTTP messages (status line +
    * headers + CRLFCRLF + body). Returns the body bytes when the record
    * declares an HTTP payload (`Content-Type: application/http...`, the
    * Common Crawl convention) and a header terminator exists; the raw
    * payload otherwise. Pure byte slicing — never decodes. */
  def httpBody(payload: Array[Byte], contentType: String): Array[Byte] = {
    if (!contentType.startsWith("application/http")) return payload
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  /**
   * WARC responses -> the BASELINE.json `input_hint` pages shape
   * `(url, warc_ts, html, text, lang)`. `html` is the byte-exact HTTP
   * BODY (the invariant column) — the status line + header block is
   * stripped via [[httpBody]] when the record declares an HTTP payload,
   * because "html" meaning "response headers included" would silently
   * poison every downstream text operator. `text`/`lang` here are the
   * ingest-time placeholders a real pipeline fills with its extractor +
   * the langid operator (q24's expression over this very column) — the
   * SCHEMA contract is what downstream operators bind to. `text` replaces
   * invalid UTF-8 (a cast, documented lossy); `html` never does.
   */
  def toPages(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.filter(_.warcType == "response")
      .map(r => (r.targetUri, r.warcDate, httpBody(r.payload, r.contentType)))
      .toDF("url", "warcDate", "html")
      .select(
        col("url"),
        to_timestamp(col("warcDate")).as("warc_ts"),
        col("html"),
        col("html").cast("string").as("text"),
        lit("und").as("lang"))
  }

  /** One record's serialized header block (through the blank line) —
    * exposed so offset indexes (CDX-style) can be derived from the
    * SERIALIZER, independently of what the parser later finds. */
  def recordHeader(r: WarcRecord): Array[Byte] =
    (s"WARC/1.0\r\n" +
      s"WARC-Type: ${r.warcType}\r\n" +
      s"WARC-Target-URI: ${r.targetUri}\r\n" +
      s"WARC-Date: ${r.warcDate}\r\n" +
      s"WARC-Record-ID: ${r.recordId}\r\n" +
      s"Content-Type: ${r.contentType}\r\n" +
      s"Content-Length: ${r.payload.length}\r\n\r\n").getBytes(UTF_8)

  /** Serialize records back to WARC bytes (round-trip fixture writer). */
  def writeWarc(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      bos.write(recordHeader(r))
      bos.write(r.payload)
      bos.write("\r\n\r\n".getBytes(UTF_8))
    }
    bos.toByteArray
  }
}
