package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: correct results AND a shuffle-free plan. */
class StorageSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  test("same-key same-bucket-count join plans with zero exchange") {
    val dir = Files.createTempDirectory("graft-buckets").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Storage.writeBucketed(docs, "docs_b", s"$dir/docs_b", "doc_id", 4)
    Storage.writeBucketed(
      docs.select($"doc_id", length($"text").as("len")),
      "lens_b", s"$dir/lens_b", "doc_id", 4)

    val joined = Storage.table(spark, "docs_b")
      .join(Storage.table(spark, "lens_b"), "doc_id")
      .select($"doc_id", $"len")

    // results correct
    assert(joined.count() === docs.count())
    assert(joined.filter($"len".isNotNull).count() === docs.count())

    // plan shape: the bucketed scans satisfy the join's distribution —
    // no ShuffleExchange anywhere
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")

    // contrast: the same join over plain parquet DOES shuffle
    val plain = docs.join(docs.select($"doc_id", length($"text").as("len")), "doc_id")
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange") || plainPlan.contains("Broadcast"),
      "control join should need an exchange or broadcast")

    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS lens_b")
  }
}
