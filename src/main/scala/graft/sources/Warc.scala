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

  /** Parse one file's bytes into records. Throws (with the byte offset)
    * on malformed input — a truncated crawl segment should fail the task
    * loudly, not yield silently fewer pages. */
  def parseAll(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    def skipCrlf(): Unit =
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
    def findHeaderEnd(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
            bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    skipCrlf()
    while (pos < bytes.length) {
      val headerEnd = findHeaderEnd(pos)
      require(headerEnd >= 0, s"WARC: unterminated header block at offset $pos")
      val lines = new String(bytes, pos, headerEnd - pos, UTF_8).split("\r\n")
      require(lines.nonEmpty && lines(0).startsWith("WARC/"),
        s"WARC: expected version line at offset $pos, got '${lines.headOption.getOrElse("")}'")
      val headers = lines.tail.map { l =>
        val i = l.indexOf(':')
        require(i > 0, s"WARC: malformed header '$l' at offset $pos")
        l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
      }.toMap
      val clen = headers.getOrElse("content-length",
        throw new IllegalArgumentException(s"WARC: missing Content-Length at offset $pos")).toInt
      val payloadStart = headerEnd + 4
      require(payloadStart + clen <= bytes.length,
        s"WARC: truncated payload at offset $payloadStart (need $clen bytes)")
      out += WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-record-id", ""),
        headers.getOrElse("content-type", ""),
        java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + clen))
      pos = payloadStart + clen
      skipCrlf() // the record's closing CRLF CRLF (and any padding)
    }
    out.result().iterator
  }

  /** Decompress a (possibly multi-member) gzip byte sequence. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** All records of every `*.warc` / `*.warc.gz` under `path`, as a typed
    * Dataset (the flatMap is Dataset-typed, not an RDD — input_hint
    * mandate). */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseAll(if (p.endsWith(".gz")) gunzip(bytes) else bytes)
      }
  }

  /**
   * WARC responses -> the BASELINE.json `input_hint` pages shape
   * `(url, warc_ts, html, text, lang)`. `html` is the byte-exact payload
   * (the invariant column); `text`/`lang` here are the ingest-time
   * identity/unknown placeholders a real pipeline fills with its
   * extractor + the langid operator (q24's expression over this very
   * column) — the SCHEMA contract is what downstream operators bind to.
   */
  def toPages(records: Dataset[WarcRecord]): DataFrame =
    records.filter(_.warcType == "response").toDF()
      .select(
        col("targetUri").as("url"),
        to_timestamp(col("warcDate")).as("warc_ts"),
        col("payload").as("html"),
        col("payload").cast("string").as("text"),
        lit("und").as("lang"))

  /** Serialize records back to WARC bytes (round-trip fixture writer). */
  def writeWarc(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val head =
        s"WARC/1.0\r\n" +
          s"WARC-Type: ${r.warcType}\r\n" +
          s"WARC-Target-URI: ${r.targetUri}\r\n" +
          s"WARC-Date: ${r.warcDate}\r\n" +
          s"WARC-Record-ID: ${r.recordId}\r\n" +
          s"Content-Type: ${r.contentType}\r\n" +
          s"Content-Length: ${r.payload.length}\r\n\r\n"
      bos.write(head.getBytes(UTF_8))
      bos.write(r.payload)
      bos.write("\r\n\r\n".getBytes(UTF_8))
    }
    bos.toByteArray
  }
}
