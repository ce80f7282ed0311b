package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget packing (q69's operator): distributed result == a
  * sequential per-shard replica, at MULTIPLE shard counts (the round-3
  * verdict's fixed-8-shard ceiling is gone — parallelism is now a
  * parameter defaulting to spark.sql.shuffle.partitions), plus the
  * <=1-doc overshoot contract. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  private val Budget = 2000L
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  /** Greedy sequential replica: walk each shard's docs in id order,
    * batch = floor(exclusive-prefix-tokens / budget). */
  private def replica(nShards: Int): Map[(Long, Long), (Long, Long, Long, Long)] = {
    val rows = docs.select($"doc_id".cast("long"),
        size(split(trim($"text"), "\\s+")).cast("long"),
        (conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
          .cast("long") % nShards).as("shard"))
      .as[(Long, Long, Long)].collect()
    rows.groupBy(_._3).iterator.flatMap { case (shard, ds) =>
      var before = 0L
      ds.sortBy(_._1).map { case (id, n, _) =>
        val batch = before / Budget
        before += n
        (shard, batch, id, n)
      }
    }.toSeq.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> (rs.size.toLong, rs.map(_._4).sum, rs.map(_._3).min, rs.map(_._3).max)
    }
  }

  private def engine(nShards: Int): Map[(Long, Long), (Long, Long, Long, Long)] =
    Packing.tokenBatches(docs, Budget, nShards)
      .select($"shard", $"batch_id", $"n_docs", $"total_tokens",
        $"first_doc".cast("long"), $"last_doc".cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap

  for (nShards <- Seq(8, 32)) {
    test(s"distributed packing == sequential replica at $nShards shards") {
      val e = engine(nShards)
      val r = replica(nShards)
      assert(e.keySet == r.keySet,
        s"batch sets differ: onlyEngine=${(e.keySet -- r.keySet).take(3)} " +
          s"onlyReplica=${(r.keySet -- e.keySet).take(3)}")
      e.foreach { case (k, v) => assert(v == r(k), s"batch $k differs: $v vs ${r(k)}") }
      // every doc packed exactly once
      assert(e.values.map(_._1).sum == docs.count())
    }

    test(s"overshoot <= 1 doc per batch at $nShards shards") {
      // a batch ends at the first doc whose exclusive prefix crosses the
      // boundary, so its token total may pass the budget only by part of
      // its LAST doc: total_tokens - n_toks(last_doc) < budget always
      val asg = Packing.tokenBatchAssignments(docs, Budget, nShards)
        .select($"shard", $"batch_id", $"doc_id".cast("long"), $"n_toks")
        .as[(Long, Long, Long, Long)].collect()
      asg.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
        val total = rs.map(_._4).sum
        val lastToks = rs.maxBy(_._3)._4
        assert(total - lastToks < Budget,
          s"batch $k overshoots by more than its last doc: total=$total last=$lastToks")
      }
    }
  }

  test("default shard count follows spark.sql.shuffle.partitions") {
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val d = Packing.tokenBatches(docs, Budget)
    val e = Packing.tokenBatches(docs, Budget, conf)
    assert(d.collect().toSet == e.collect().toSet)
    // shards actually span the configured count (uniform hash, enough docs)
    assert(d.select($"shard").distinct().count() === conf.toLong)
  }
}
