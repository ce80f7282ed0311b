package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV mergeable quantile sketch (q102): merge identity across shard
  * counts, rank accuracy, and partitioning invariance. */
class KmvQuantileSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private val pcts = Seq((25, 8), (50, 16), (75, 24), (90, 29))

  // 3 groups x 200 rows; values are a deterministic scramble so the
  // hash-sample sees an arbitrary value order
  private def fixture = (0L until 600L).map { i =>
    (s"g${i % 3}", i, (i * 7919L) % 1000L)
  }.toDF("grp", "id", "v")

  test("merged-over-shards sample == direct sample for every shard count") {
    for (nShards <- Seq(2, 4, 8)) {
      val out = Sample.kmvQuantileSummary(fixture, 32, pcts, nShards = nShards).collect()
      assert(out.nonEmpty)
      out.foreach(r => assert(r.getAs[Long]("n_mismatch") == 0L,
        s"mergeability broken at nShards=$nShards: $r"))
    }
  }

  test("every estimate's exact in-group rank is within the graded bound") {
    val out = Sample.kmvQuantileSummary(fixture, 32, pcts).collect()
    assert(out.length == 12) // 3 groups x 4 percentiles
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"rank out of bound: $r")
      val rank = r.getAs[Long]("true_rank"); val n = r.getAs[Long]("n_group")
      val pct = r.getAs[Int]("pct")
      assert(math.abs(100.0 * rank / n - pct) <= 30.0)
    }
  }

  test("output is partitioning-invariant") {
    val a = Sample.kmvQuantileSummary(fixture.repartition(1), 32, pcts)
      .collect().map(_.toString).sorted.toSeq
    val b = Sample.kmvQuantileSummary(fixture.repartition(13), 32, pcts)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("a value-sorted adversarial input still samples uniformly (hash is value-independent)") {
    // values equal to id: sample ids must not concentrate in low ids
    val df = (0L until 500L).map(i => ("g", i, i)).toDF("grp", "id", "v")
    val out = Sample.kmvQuantileSummary(df, 32, pcts).collect()
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"biased sample: $r")
      assert(r.getAs[Long]("n_mismatch") == 0L)
    }
    // median estimate of 0..499 should land far from the extremes
    val med = out.find(_.getAs[Int]("pct") == 50).get.getAs[Long]("est_value")
    assert(med > 150 && med < 350, s"median estimate $med suspicious for uniform 0..499")
  }
}
