package graft.pipeline

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.TextOps

/** Gear content-defined chunking (q109): the rolling kernel equals the
  * position-local windowed sum (what the SQL oracle replays), boundaries
  * re-sync after edits, and shared spans produce shared chunk hashes. */
class CdcSpec extends AnyFunSuite {

  private def cuts(s: String, maskBits: Int): Seq[Int] = {
    val a = TextOps.gearCuts(UTF8String.fromString(s), maskBits)
    (0 until a.numElements()).map(a.getInt)
  }

  /** Chunk substrings between consecutive bounds. */
  private def chunks(s: String, maskBits: Int): Seq[String] = {
    val bs = 0 +: cuts(s, maskBits) :+ s.length
    bs.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
  }

  private def randomAscii(rnd: scala.util.Random, n: Int): String =
    (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString

  test("rolling hash == explicit 64-term windowed sum at every position") {
    val rnd = new scala.util.Random(109)
    val gear = Array.tabulate(256)(b => TextOps.mix64(b.toLong))
    for (_ <- 0 until 20) {
      val s = randomAscii(rnd, 50 + rnd.nextInt(400))
      val bytes = s.getBytes("UTF-8")
      // replica: h_i = sum over the last 64 bytes of gear(b_j) << (i-j)
      val cutsWant = (1 until bytes.length).filter { i1 =>
        val i = i1 - 1 // 0-based index of the last byte folded
        var h = 0L
        var j = math.max(0, i - 63)
        while (j <= i) { h += gear(bytes(j) & 0xff) << (i - j); j += 1 }
        (h >>> 58) == 0L
      }
      assert(cuts(s, 6) == cutsWant, s"windowed-sum replica disagrees on: $s")
    }
  }

  test("an insertion re-syncs boundaries: long shared suffix keeps its chunks") {
    val rnd = new scala.util.Random(77)
    val base = randomAscii(rnd, 2000)
    val edited = "XYZ" + base
    val a = chunks(base, 6).toSet
    val b = chunks(edited, 6).toSet
    val shared = a.intersect(b)
    // everything beyond the first ~64 bytes + one chunk must re-align
    assert(shared.map(_.length).sum >= 1500,
      s"only ${shared.map(_.length).sum} shared bytes after a 3-byte prefix edit")
  }

  test("fixed-size blocks would NOT re-sync (the property CDC buys)") {
    val rnd = new scala.util.Random(78)
    val base = randomAscii(rnd, 2000)
    val edited = "Q" + base
    val fixedA = base.grouped(64).toSet
    val fixedB = edited.grouped(64).toSet
    // random content: a 1-byte shift leaves essentially no shared block
    assert(fixedA.intersect(fixedB).map(_.length).sum <= 128)
  }

  test("docs sharing a long middle span share chunk hashes") {
    val rnd = new scala.util.Random(42)
    val span = randomAscii(rnd, 800)
    val d1 = randomAscii(rnd, 300) + span + randomAscii(rnd, 150)
    val d2 = randomAscii(rnd, 90) + span + randomAscii(rnd, 400)
    val shared = chunks(d1, 6).toSet.intersect(chunks(d2, 6).toSet)
    assert(shared.map(_.length).sum >= 500,
      s"shared-span chunks cover only ${shared.map(_.length).sum} bytes")
  }

  test("deltaStats: midpoint insertion churns a bounded slice, accounting is exact") {
    val spark = graft.expr.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(112)
    val v1 = (0L until 20L).map(i => (i, randomAscii(rnd, 1500))).toDF("doc_id", "text")
    val half = floor(length(col("text")) / lit(2)).cast("int")
    val v2 = v1.select(col("doc_id"),
      concat(col("text").substr(lit(1), half), lit(" PATCH "),
        col("text").substr(half + 1, length(col("text")))).as("text"))
    val got = Cdc.deltaStats(v1, v2, col("text"), 6).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val total = r.getAs[Long]("total_v2_bytes")
      val reuse = r.getAs[Long]("reuse_bytes")
      val churn = r.getAs[Long]("churn_bytes")
      assert(reuse + churn == total, "reuse + churn must partition v2 bytes")
      assert(total == 1507, s"v2 length should be 1500 + 7, got $total")
      // the insertion invalidates the containing chunk + <= 64 bytes of
      // window pollution; everything else re-syncs. Generous bound: the
      // churn must stay a small slice, never the whole doc.
      assert(churn < 600, s"doc ${r.getLong(0)}: churn $churn of $total")
    }
    val churnSum = got.map(_.getAs[Long]("churn_bytes")).sum
    val totalSum = got.map(_.getAs[Long]("total_v2_bytes")).sum
    assert(churnSum.toDouble / totalSum < 0.25,
      s"aggregate churn ${churnSum.toDouble / totalSum} too high for a 7-byte edit")
  }

  test("fuzz: deltaStats matches a pure-Scala multiset replica over random edits") {
    val spark = graft.expr.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(212)
    def edit(s: String): String = rnd.nextInt(3) match {
      case 0 => // insert
        val p = rnd.nextInt(s.length); s.substring(0, p) + randomAscii(rnd, 1 + rnd.nextInt(30)) + s.substring(p)
      case 1 => // delete
        val p = rnd.nextInt(s.length / 2); val l = rnd.nextInt(40); s.substring(0, p) + s.substring(math.min(s.length, p + l))
      case _ => // replace
        val p = rnd.nextInt(s.length / 2); val l = 1 + rnd.nextInt(20)
        s.substring(0, p) + randomAscii(rnd, l) + s.substring(math.min(s.length, p + l))
    }
    val v1rows = (0L until 30L).map(i => (i, randomAscii(rnd, 300 + rnd.nextInt(1200))))
    val v2rows = v1rows.map { case (i, t) => (i, edit(t)) }
    val got = Cdc.deltaStats(v1rows.toDF("doc_id", "text"), v2rows.toDF("doc_id", "text"),
      col("text"), 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // replica: multiset reuse/churn over the chunk substring multisets
    def chunkList(s: String): Seq[String] = chunks(s, 6)
    v1rows.zip(v2rows).foreach { case ((id, t1), (_, t2)) =>
      val c1 = chunkList(t1).groupBy(identity).view.mapValues(_.size).toMap
      val c2 = chunkList(t2).groupBy(identity).view.mapValues(_.size).toMap
      val total = t2.length.toLong
      val reuse = c2.map { case (c, n2) => math.min(n2, c1.getOrElse(c, 0)).toLong * c.length }.sum
      val churn = c2.map { case (c, n2) => math.max(0, n2 - c1.getOrElse(c, 0)).toLong * c.length }.sum
      val nChunks = c2.values.sum.toLong
      assert(got(id) == ((total, reuse, churn, nChunks)),
        s"doc $id: ${got(id)} != ($total, $reuse, $churn, $nChunks)")
    }
  }

  test("plan pin: gear_cuts evaluates once per doc, inside the Generate") {
    val spark = graft.expr.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0L until 50L).map(i => (i, randomAscii(new scala.util.Random(i), 400)))
      .toDF("doc_id", "text")
    val out = Cdc.chunks(df, col("text"), 6, "doc_id")
    out.collect() // finalize AQE on this QueryExecution
    val lines = out.queryExecution.executedPlan.toString.split("\n")
      .filter(_.contains("gear_cuts"))
    assert(lines.nonEmpty)
    // the kernel must live in the Generate's input (once per doc), never
    // in a downstream per-chunk projection (the CollapseProject rule)
    lines.foreach(l => assert(l.contains("Generate"),
      s"gear_cuts escaped the Generate into a per-chunk projection: $l"))
  }

  test("degenerate inputs: no interior cut on tiny strings; bounds well-formed") {
    assert(cuts("a", 6).isEmpty)
    assert(cuts("ab", 6).forall(c => c >= 1 && c < 2))
    val s = randomAscii(new scala.util.Random(5), 300)
    val cs = cuts(s, 6)
    assert(cs == cs.sorted && cs.distinct == cs)
    assert(cs.forall(c => c >= 1 && c < s.length))
    assert(chunks(s, 6).mkString == s) // chunks partition the string
  }
}
