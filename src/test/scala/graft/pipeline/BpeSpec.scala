package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training (q114/q115): the relational rounds equal a pure-Scala
  * CLASSIC greedy trainer — pair stats with overlap, argmax with the
  * (total DESC, s1, s2) tiebreak, sequential left-to-right rewrite. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  /** The textbook sequential trainer. */
  private def replica(freq: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var state: Map[String, Seq[String]] = freq.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + freq(w)
      val ((b1, b2), total) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      merges += ((r, b1, b2, total))
      state = state.map { case (w, syms) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == b1 && syms(i + 1) == b2) {
            out += (b1 + b2); i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> out.toSeq
      }
    }
    (merges.toSeq, state)
  }

  private def engine(freq: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    // docs whose token stream realizes the frequency table exactly
    val text = freq.toSeq.sortBy(_._1)
      .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val (merges, syms) = Bpe.train(docs, rounds)
    val tok = syms.collect().groupBy(_.getString(0)).map { case (w, rows) =>
      w -> rows.sortBy(_.getInt(2)).map(_.getString(3)).toSeq
    }
    (merges, tok)
  }

  test("matches the textbook greedy trainer on the classic example") {
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (em, et) = engine(freq, 6)
    val (rm, rt) = replica(freq, 6)
    assert(em == rm, s"merges differ:\n$em\n$rm")
    assert(et == rt)
  }

  test("repeated-symbol runs: greedy == even-offset islands (aaa cases)") {
    val freq = Map("aaaa" -> 3L, "aaa" -> 2L, "aa" -> 7L, "baaab" -> 1L)
    val (em, et) = engine(freq, 3)
    val (rm, rt) = replica(freq, 3)
    assert(em == rm, s"merges differ:\n$em\n$rm")
    assert(et == rt, s"tokenizations differ:\n$et\n$rt")
  }

  test("fuzz: random small-alphabet corpora agree for 4 rounds") {
    val rnd = new scala.util.Random(114)
    for (trial <- 0 until 5) {
      val words = (0 until 12).map(_ =>
        (0 until (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val freq = words.groupBy(identity).map { case (w, g) =>
        w -> (g.size.toLong + rnd.nextInt(3)) }
      val (em, et) = engine(freq, 4)
      val (rm, rt) = replica(freq, 4)
      assert(em == rm, s"trial $trial merges:\n$em\n$rm\nfreq=$freq")
      assert(et == rt, s"trial $trial tokenization mismatch; freq=$freq")
    }
  }
}
