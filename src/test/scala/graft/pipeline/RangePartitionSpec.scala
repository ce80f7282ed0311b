package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-derived range partitioning (q108): bucket assignment matches a
  * pure-Scala replica, bucket order IS global (v, id) order, boundaries
  * are partitioning-invariant, and the sample keeps buckets balanced. */
class RangePartitionSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  // skewed values (quadratic + heavy ties) so the test exercises both
  // tie-splitting and unbalanced value mass
  private def fixture = (0L until 4000L).map(i => (i, (i * i) % 97L)).toDF("id", "v")

  test("bucket assignment matches the pure-Scala replica") {
    val df = fixture
    val bounds = Sample.rangeBoundaries(df, k = 64, nBuckets = 8)
    val got = df.withColumn("bucket", Sample.rangeBucket($"v", $"id", bounds))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, v, b) =>
      val want = bounds.count { case (bv, bid) => bv < v || (bv == v && bid <= id) }
      assert(b == want, s"id=$id v=$v: bucket $b != replica $want")
    }
  }

  test("bucket order is global (v, id) order: concatenated buckets == full sort") {
    val df = fixture
    val bounds = Sample.rangeBoundaries(df, k = 64, nBuckets = 8)
    val rows = df.withColumn("bucket", Sample.rangeBucket($"v", $"id", bounds))
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(0))) // (bucket, v, id)
    val byBucket = rows.sortBy(t => (t._1, t._2, t._3)).map(t => (t._2, t._3)).toSeq
    val global = rows.map(t => (t._2, t._3)).sortBy(identity).toSeq
    assert(byBucket == global, "sorting within buckets in bucket order != global sort")
  }

  test("boundaries are partitioning-invariant") {
    val df = fixture
    val a = Sample.rangeBoundaries(df.repartition(1), 64, 8)
    val b = Sample.rangeBoundaries(df.repartition(17), 64, 8)
    assert(a == b)
  }

  test("buckets stay balanced on the skewed fixture") {
    val df = fixture
    val bounds = Sample.rangeBoundaries(df, k = 64, nBuckets = 8)
    val counts = df.withColumn("bucket", Sample.rangeBucket($"v", $"id", bounds))
      .groupBy($"bucket").count().collect().map(_.getLong(1))
    assert(counts.length == 8, s"expected all 8 buckets non-empty, got ${counts.length}")
    val avg = counts.sum.toDouble / counts.length
    assert(counts.max <= 3 * avg, s"max bucket ${counts.max} > 3x avg $avg")
  }

  test("single-boundary edge + empty-bounds guard") {
    val df = (0L until 100L).map(i => (i, i)).toDF("id", "v")
    val bounds = Sample.rangeBoundaries(df, k = 16, nBuckets = 2)
    assert(bounds.size == 1)
    val n0 = df.withColumn("b", Sample.rangeBucket($"v", $"id", bounds))
      .where($"b" === 0).count()
    assert(n0 > 0 && n0 < 100)
    intercept[IllegalArgumentException] { Sample.rangeBucket($"v", $"id", Seq.empty) }
  }
}
