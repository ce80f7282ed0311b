package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing: schema, batch shape, determinism,
  * frame slicing (the decode itself is a documented stub — see
  * [[graft.pipeline.StubDecoder]]). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.withMedia(docs).cache()

  test("withMedia: payload size and metadata follow the modality contract") {
    val rows = media.select($"media_type", length($"media"), $"media_meta.n_bytes",
      $"media_meta.width", $"media_meta.sample_rate", $"media_meta.n_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mt, nb) = (r.getString(0), r.getInt(1))
      assert(nb === r.getInt(2))
      mt match {
        case "image" => assert(nb === 64 && !r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
        case "audio" => assert(nb === 128 && r.isNullAt(3) && r.getInt(4) === 16000 && r.isNullAt(5))
        case "video" => assert(nb === 256 && r.isNullAt(3) && r.isNullAt(4) && r.getInt(5) === 16)
      }
    }
    assert(rows.map(_.getString(0)).toSet === Set("image", "audio", "video"))
  }

  test("decodeFeatures: batched decode is deterministic, total, and batch-shaped") {
    val feats = Multimodal.decodeFeatures(media, batchSize = 7, dims = 8)
    val collected = feats.collect()
    assert(collected.length === docs.count())
    // batch shape: every row rode in a batch of <= 7, and full batches dominate
    val sizes = collected.map(_.getInt(2))
    assert(sizes.max <= 7 && sizes.max === 7)
    // features are dims-wide floats in [0,1)
    collected.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]](3)
      assert(f.length === 8 && f.forall(v => v >= 0f && v < 1f))
    }
    // determinism: a second run (different batch size) yields identical features
    val again = Multimodal.decodeFeatures(media, batchSize = 64, dims = 8)
      .select($"doc_id", $"feature").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)).toMap
    collected.foreach { r =>
      assert(again(r.getLong(0)) === r.getAs[scala.collection.Seq[Float]](3))
    }
  }

  test("sampleFrames: every 2nd frame, 16-byte slices, videos only") {
    val frames = Multimodal.sampleFrames(media, everyN = 2)
    val nVideos = media.filter($"media_type" === "video").count()
    assert(frames.count() === nVideos * 8) // 16 frames, every 2nd
    val r = frames.select($"frame_idx", length($"frame_bytes")).collect()
    assert(r.forall(x => x.getInt(0) % 2 === 0 && x.getInt(1) === Multimodal.BlockBytes))
    // frame slice matches the byte range of the full payload
    val one = media.filter($"media_type" === "video")
      .select($"doc_id", $"media").head()
    val full = one.getAs[Array[Byte]](1)
    val sliced = frames.filter($"doc_id" === one.getLong(0) && $"frame_idx" === 2)
      .select($"frame_bytes").head().getAs[Array[Byte]](0)
    assert(sliced.toSeq === full.slice(32, 48).toSeq)
  }

  test("readBinaryDir: real PNG bytes flow into the media column with " +
    "header-decoded dimensions (S3)") {
    val res = Multimodal.readBinaryDir(spark, Multimodal.DefaultResourcesDir, recursive = true)
    val rows = res.select($"file_name", $"media_meta.width", $"media_meta.height",
      $"media_meta.n_bytes", $"media").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getAs[Array[Byte]](4))))
      .toMap
    // the reference ships 4 icons + 7 textures
    assert(rows.size === 11)
    // known ground truth (parsed independently): icons are 225x225,
    // HoleBoundary texture is 100x98 at 19665 bytes
    val (iw, ih, inb, ibytes) = rows("LeafyTree.png")
    assert(iw === 225 && ih === 225 && inb === 29466)
    val (tw, th, tnb, tbytes) = rows("HoleBoundary.png")
    assert(tw === 100 && th === 98 && tnb === 19665)
    // REAL file bytes, not synthesized: PNG signature + exact length
    assert(ibytes.length === 29466 &&
      ibytes.take(8).map(b => f"${b & 0xff}%02x").mkString === "89504e470d0a1a0a")
    assert(tbytes.take(8).map(b => f"${b & 0xff}%02x").mkString === "89504e470d0a1a0a")
  }

  test("markersWithIcons: marker rows pick up their icon bytes by itemType") {
    import graft.data.Courses
    import graft.SparkEntry
    val items = Courses.itemsDf(spark, 5)
    val markers = CourseEngine.markers(items, CourseEngine.boundaries(items))
    val icons = Multimodal.readBinaryDir(spark, Multimodal.DefaultResourcesDir + "/icons")
    val joined = Multimodal.markersWithIcons(markers, icons)
      .select($"itemType", $"icon_w", $"icon_h", length($"icon_bytes")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(Courses.markerTypes.contains(r.getString(0)))
      assert(r.getInt(1) === 225 && r.getInt(2) === 225 && r.getInt(3) === 29466)
    }
  }

  test("resizeImages: schema contract holds and output is deterministic") {
    val rs = Multimodal.resizeImages(media, 128, 128)
    val rows = rs.select($"media_meta.width", $"media_meta.height", length($"media")).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getInt(0) === 128 && r.getInt(1) === 128 && r.getInt(2) === 32))
    val a = rs.select($"doc_id", md5($"media")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Multimodal.resizeImages(media, 128, 128)
      .select($"doc_id", md5($"media")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}
