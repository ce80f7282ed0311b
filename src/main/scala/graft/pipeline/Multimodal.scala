package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for the training-data pipeline: image/audio/
 * video payloads are opaque `BINARY` columns with a typed metadata struct,
 * processed by BATCHED partition-level decode — the Scala analog of a
 * `mapInPandas` batch UDF (reference analog: the raster resource cache +
 * per-hole `plt.imread`/`imshow` path, `/root/reference/src/python/
 * plot_courses.py:96-100,153-167`).
 *
 * The container has no image/audio codecs, so the DECODE STEP IS A STUB:
 * [[StubDecoder]] derives features from the bytes with a deterministic
 * rolling hash (clearly marked below). Everything around it — the binary
 * column, metadata schema, partitioning, batch shape, output schema — is
 * real Spark plumbing and is what the tests assert on.
 */
object Multimodal {

  /** Bytes per md5-derived block in the synthetic payload. */
  final val BlockBytes = 16

  /**
   * Attach a deterministic synthetic media payload to each document:
   * `media_type` cycles image/audio/video by doc_id, `media` is
   * `unhex(md5(text) || md5(text||salt) || ...)` — pure engine expressions,
   * no driver-side data — and `media_meta` is the typed metadata struct a
   * real ingest would carry (nulls where the modality doesn't use a field).
   */
  def withMedia(docs: DataFrame): DataFrame = {
    val mt = when(col("doc_id") % 3 === 0, lit("image"))
      .when(col("doc_id") % 3 === 1, lit("audio"))
      .otherwise(lit("video"))
    // payload size scales with modality: image 4 blocks, audio 8, video 16
    val nBlocks = when(col("media_type") === "image", lit(4))
      .when(col("media_type") === "audio", lit(8))
      .otherwise(lit(16))
    val blocks = (0 until 16).map(i =>
      when(lit(i) < col("n_blocks"), md5(concat(col("text"), lit(":"), lit(i))))
        .otherwise(lit("")))
    docs
      .withColumn("media_type", mt)
      .withColumn("n_blocks", nBlocks)
      .withColumn("media", unhex(concat(blocks: _*)))
      .withColumn("media_meta", struct(
        when(col("media_type") === "image", (col("doc_id") % 4 + 1) * 64).cast("int").as("width"),
        when(col("media_type") === "image", (col("doc_id") % 3 + 1) * 64).cast("int").as("height"),
        when(col("media_type") === "audio", lit(16000)).cast("int").as("sample_rate"),
        when(col("media_type") === "video", col("n_blocks")).cast("int").as("n_frames"),
        length(col("media")).as("n_bytes")))
      .drop("n_blocks")
  }

  /** The reference's raster resource tree (read-only mount). */
  final val DefaultResourcesDir = "/root/reference/resources"

  /** Big-endian 4-byte unsigned int at 1-based `off` of a binary column
    * (pure built-ins: substring works on BINARY, conv parses the hex). */
  private def beInt(bin: Column, off: Int): Column =
    conv(hex(bin.substr(lit(off), lit(4))), 16, 10).cast("int")

  /**
   * S3 — binary raster resource scan: REAL file bytes via Spark's
   * `binaryFile` source — the ingestion analog of the reference's
   * memoized `plt.imread` texture/icon cache (plot_courses.py:96-100).
   * Width/height are decoded from the PNG IHDR header (bytes 16-23,
   * big-endian — pure expression math over the binary column; full pixel
   * decode stays behind [[StubDecoder]]). Output shape matches
   * [[withMedia]]'s media/media_meta contract, so every downstream
   * operator (decodeFeatures, resize, marker icon join) takes either.
   */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                    glob: String = "*.png", recursive: Boolean = false): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("content").as("media"))
      .withColumn("media_type", lit("image"))
      .withColumn("is_png",
        hex(col("media").substr(lit(1), lit(8))) === lit("89504E470D0A1A0A"))
      .withColumn("media_meta", struct(
        when(col("is_png"), beInt(col("media"), 17)).as("width"),
        when(col("is_png"), beInt(col("media"), 21)).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("n_frames"),
        length(col("media")).as("n_bytes")))
      .drop("is_png")

  /** Marker icon dimension: itemType -> real icon bytes + decoded dims,
    * broadcast-joined onto marker rows (the Resources-singleton analog —
    * the icon set rides one broadcast, plot_courses.py:29-94,153-167). */
  def markersWithIcons(markers: DataFrame, icons: DataFrame): DataFrame =
    markers.join(
      broadcast(icons.select(
        regexp_replace(col("file_name"), "\\.png$", "").as("itemType"),
        col("media").as("icon_bytes"),
        col("media_meta.width").as("icon_w"),
        col("media_meta.height").as("icon_h"))),
      Seq("itemType"), "left")

  /** Output schema of [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("batch_size", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /**
   * Batched feature extraction over the binary column. Rows are buffered
   * into `batchSize` groups inside each partition and decoded per-batch —
   * the exact control flow a vectorized (Arrow/`mapInPandas`) decode UDF
   * has, so swapping [[StubDecoder.decodeBatch]] for a real codec changes
   * nothing upstream or downstream. Emits the batch size each row rode in,
   * so tests can assert the batch shape actually happened.
   */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64, dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val input = media.select(col("doc_id"), col("media_type"), col("media"))
    val rdd = input.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getLong(0),
          if (ir.isNullAt(1)) null else ir.getUTF8String(1).toString,
          if (ir.isNullAt(2)) Array.empty[Byte] else ir.getBinary(2))
      }
      rows.grouped(batchSize).flatMap { batch =>
        val feats = StubDecoder.decodeBatch(batch.map(_._3).toArray, dims)
        batch.iterator.zip(feats.iterator).map { case ((id, mt, _), f) =>
          Row(id, mt, batch.size, f.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling for video payloads: every `everyN`-th frame as its own
    * row with the frame's byte slice — `substring` works on BINARY, so the
    * slicing is pure codegen'd expressions, no decode involved. */
  def sampleFrames(media: DataFrame, everyN: Int = 2): DataFrame =
    media
      .filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("media_meta.n_frames") - 1),
          i => i % everyN === 0)))
      .select(col("doc_id"), col("frame_idx"),
        col("media").substr(col("frame_idx") * BlockBytes + 1, lit(BlockBytes)).as("frame_bytes"))

  /** "Resize" for image payloads — at this layer a metadata transform plus
    * deterministic payload re-derivation (STUB: a real codec would decode,
    * resample, re-encode; the schema contract is identical). */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      .filter(col("media_type") === "image")
      .select(col("doc_id"), col("media_type"),
        unhex(concat(md5(concat(col("media"), lit(s":$w:$h"))),
          md5(concat(col("media"), lit(s":$w:$h:1"))))).as("media"),
        struct(lit(w).as("width"), lit(h).as("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("int").as("n_frames"),
          lit(2 * BlockBytes).cast("int").as("n_bytes")).as("media_meta"))
}

/**
 * >>> DETERMINISTIC STUB <<< — stands in for an image/audio/video codec
 * (none is installed in this container). Features are a rolling hash of
 * the payload bytes folded into `dims` floats in [0, 1). Replace
 * `decodeBatch` with a real decoder (e.g. JNI codec / ONNX encoder) and
 * every caller keeps working: the batch-in/batch-out signature is the
 * contract.
 */
object StubDecoder {
  def decodeBatch(payloads: Array[Array[Byte]], dims: Int): Array[Array[Float]] =
    payloads.map { bytes =>
      val acc = new Array[Long](dims)
      var i = 0
      while (i < bytes.length) {
        val d = i % dims
        acc(d) = acc(d) * 1000003L + (bytes(i) & 0xffL) + 1L
        i += 1
      }
      acc.map(v => ((v & 0xffffffL).toFloat / 0x1000000L.toFloat))
    }
}
