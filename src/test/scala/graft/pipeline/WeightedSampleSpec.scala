package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic weighted bottom-k (q104): inclusion scales with weight,
  * output is partitioning-invariant, and the sample is mergeable. */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  test("inclusion odds scale ~linearly with weight") {
    // 8000 items, half weight 1 and half weight 4 -> a bottom-800 sample
    // should hold w=4 items at ~4x the rate of w=1 items
    val df = (0L until 8000L).map(i => (i, if (i % 2 == 0) 1 else 4)).toDF("id", "w")
    val got = Sample.weightedBottomK(df, 800).collect()
    val n4 = got.count(_.getAs[Int]("w") == 4).toDouble
    val n1 = got.count(_.getAs[Int]("w") == 1).toDouble
    val ratio = n4 / math.max(n1, 1.0)
    assert(ratio > 2.8 && ratio < 5.5, s"w=4:w=1 inclusion ratio $ratio outside ~4x band")
  }

  test("partitioning-invariant and weight-cap respected") {
    val df = (0L until 2000L).map(i => (i, (i % 40).toInt)).toDF("id", "w") // some w > 16, some 0
    val a = Sample.weightedBottomK(df.repartition(1), 100).collect().map(_.toString).sorted.toSeq
    val b = Sample.weightedBottomK(df.repartition(17), 100).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // w = 0 rows clamp to 1 copy and still compete
    val zeroOnly = Sample.weightedBottomK(
      (0L until 50L).map(i => (i, 0)).toDF("id", "w"), 10).collect()
    assert(zeroOnly.length == 10)
  }

  test("mergeable: bottom-k of shard bottom-ks == direct bottom-k") {
    val df = (0L until 3000L).map(i => (i, (i % 5 + 1).toInt)).toDF("id", "w")
    val direct = Sample.weightedBottomK(df, 120).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("priority"))).sorted.toSeq
    val shards = (0 until 3).map(s0 =>
      Sample.weightedBottomK(df.where(pmod($"id", lit(3)) === s0), 120))
    val union = shards.reduce(_ unionByName _)
      .orderBy($"priority", $"id").limit(120).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("priority"))).sorted.toSeq
    assert(direct == union)
  }
}
