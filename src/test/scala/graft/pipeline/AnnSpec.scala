package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.{functions => gf}

/** IVF ANN: structural invariants + recall against brute force. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queriesDf = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("query_id"), $"embedding".as("qvec"))

  test("every vector lands in exactly one inverted list; all lists from the corpus") {
    val cents = Ann.centroids(emb, 16)
    assert(cents.count() === 16)
    val lists = Ann.assign(emb, cents)
    assert(lists.count() === emb.count())
    assert(lists.groupBy($"vec_id").count().filter($"count" =!= 1).count() === 0)
    assert(lists.select($"list_id").distinct().count() <= 16)
  }

  test("probing ALL lists equals brute force exactly") {
    val ivfAll = Ann.ivfTopK(emb, queriesDf, k = 5, nLists = 16, nProbe = 16)
      .select($"query_id", $"rank", $"vec_id")
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"vec_id")
    val brute = emb.crossJoin(broadcast(queriesDf))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("sim", gf.cosine_sim($"embedding", $"qvec"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id")
    assert(ivfAll.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(ivfAll).count() === 0)
  }

  test("nProbe=4/16 recall@10 is usefully high, results are a subset-rank") {
    val k = 10
    val ivf = Ann.ivfTopK(emb, queriesDf, k, nLists = 16, nProbe = 4)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"vec_id")
    val brute = emb.crossJoin(broadcast(queriesDf))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("sim", gf.cosine_sim($"embedding", $"qvec"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall@10 = $recall") // 4/16 lists probed
    assert(ivf.size === brute.size)               // k results per query
  }
}
