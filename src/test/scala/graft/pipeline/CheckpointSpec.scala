package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.data.{Courses, Pages}

/** Bucket-manifest resume: idempotent, exact, lineage-carrying (north rule
  * "resumable from checkpoint with per-partition lineage + metrics"). */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val bounds = CourseEngine.boundaries(Courses.itemsDf(spark, SparkEntry.NCourses))
  private lazy val cover = SpatialJoin.coverDfFlat(bounds)
  private lazy val pages = Pages.pages(spark, sfDir, SparkEntry.Amp).cache()

  private def oneShot = SpatialJoin.assignPagesFlat(pages, cover, bounds)
    .select($"url", $"clubId", $"courseId", $"holeNumber")

  test("preempted run resumes where it committed; result equals one-shot") {
    val out = Files.createTempDirectory("graft-ckpt").toString
    val nBuckets = 8

    // invocation 1: budget of 3 buckets, then "preempted"
    val r1 = Checkpointed.runAssign(pages, cover, bounds, out, nBuckets, maxBuckets = 3)
    assert(r1.ranBuckets === Seq(0, 1, 2) && r1.skippedBuckets.isEmpty)
    assert(Checkpointed.completedBuckets(out) === Set(0, 1, 2))

    // invocation 2: finishes the rest, skipping committed buckets
    val r2 = Checkpointed.runAssign(pages, cover, bounds, out, nBuckets)
    assert(r2.skippedBuckets === Seq(0, 1, 2) && r2.ranBuckets === Seq(3, 4, 5, 6, 7))

    // invocation 3: no-op
    val r3 = Checkpointed.runAssign(pages, cover, bounds, out, nBuckets)
    assert(r3.ranBuckets.isEmpty && r3.skippedBuckets === (0 until nBuckets))

    val got = spark.read.parquet(s"$out/data")
      .select($"url", $"clubId", $"courseId", $"holeNumber")
    assert(got.count() === oneShot.count())
    assert(got.except(oneShot).count() === 0 && oneShot.except(got).count() === 0)

    // lineage: every bucket reported; totals reconcile; checksum = recompute
    val lin = Checkpointed.lineage(out)
    assert(lin.map(_.bucket) === (0 until nBuckets))
    assert(lin.map(_.nPages).sum === pages.count())
    assert(lin.map(_.nAssigned).sum === oneShot.count())
    val recomputed = spark.read.parquet(s"$out/data")
      .groupBy($"bucket").agg(expr("bit_xor(xxhash64(text))").as("cs"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    lin.filter(_.nAssigned > 0).foreach { l =>
      assert(recomputed(l.bucket) === l.textChecksum)
    }
  }

  test("any stage checkpoints: tile-mask rasterization resumes by hole bucket") {
    val out = Files.createTempDirectory("graft-ckpt3").toString
    val bexpr = pmod(xxhash64($"clubId", $"courseId", $"holeNumber"), lit(4))
    def stage(b: org.apache.spark.sql.DataFrame) =
      CourseEngine.tileMasks(b.drop("bucket"), zoom = 16).withColumn("bucket",
        pmod(xxhash64($"clubId", $"courseId", $"holeNumber"), lit(4)).cast("int"))
    val r1 = Checkpointed.runStage(bounds, bexpr, out, 4, maxBuckets = 2,
      checksumCol = "qk")(stage)
    assert(r1.ranBuckets === Seq(0, 1))
    val r2 = Checkpointed.runStage(bounds, bexpr, out, 4, checksumCol = "qk")(stage)
    assert(r2.ranBuckets === Seq(2, 3))
    val got = spark.read.parquet(s"$out/data")
      .select($"clubId", $"courseId", $"holeNumber", $"z", $"x", $"y", $"mask")
    val oneShot = CourseEngine.tileMasks(bounds, zoom = 16)
      .select($"clubId", $"courseId", $"holeNumber", $"z", $"x", $"y", $"mask")
    assert(got.count() === oneShot.count())
    assert(got.exceptAll(oneShot).count() === 0)
    assert(Checkpointed.lineage(out).map(_.nAssigned).sum === oneShot.count())
  }

  test("a half-written (uncommitted) bucket is rewritten cleanly on retry") {
    val out = Files.createTempDirectory("graft-ckpt2").toString
    val nBuckets = 4
    Checkpointed.runAssign(pages, cover, bounds, out, nBuckets)
    val expected = spark.read.parquet(s"$out/data")
      .select($"url", $"clubId", $"courseId", $"holeNumber").collect().toSet

    // simulate a crash AFTER bucket 1's data write but BEFORE its commit:
    // drop the manifest entry and corrupt the bucket's data to a subset
    Files.delete(Paths.get(out, "_manifest", "bucket-1.json"))
    val b1 = spark.read.parquet(s"$out/data").filter($"bucket" === 1).cache()
    val crippled = b1.limit(1).drop("bucket")
    crippled.withColumn("bucket", lit(1)).write
      .mode("overwrite").partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic").parquet(s"$out/data")
    b1.unpersist()

    val r = Checkpointed.runAssign(pages, cover, bounds, out, nBuckets)
    assert(r.ranBuckets === Seq(1))
    val got = spark.read.parquet(s"$out/data")
      .select($"url", $"clubId", $"courseId", $"holeNumber").collect().toSet
    assert(got === expected)
  }
}
