package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental connected components (q110): folding an increment into
  * persisted labels + band/shingle state equals the direct components
  * over the full corpus, for every split point — including increments
  * that BRIDGE two previously separate components. */
class IncrementalComponentsSpec extends AnyFunSuite {
  lazy val spark = graft.expr.SparkTestSession.spark
  import spark.implicits._

  // synthetic corpus with controlled overlap: families of near-identical
  // docs (jaccard ~1), variants (~0.5+), and unrelated docs
  private def corpus: DataFrame = {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val fam2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val rows = Seq(
      (0L, base), (1L, base), (2L, base + " uniform"),
      (3L, fam2), (4L, fam2 + " victor"), (5L, fam2),
      // 6 bridges the two families only weakly (no edge expected)
      (6L, "alpha bravo kilo lima whiskey xray yankee zulu unique words"),
      (7L, "completely different text with no shared trigrams at all here"),
      (8L, base), // late arrival joining family 1
      (9L, fam2 + " victor") // late arrival joining family 2
    )
    rows.toDF("doc_id", "text")
  }

  private def directComponents(docs: DataFrame): Map[Long, Long] = {
    val banded = Dedup.banded(docs, "doc_id")
    val sh = Dedup.shingleState(docs)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val pairs = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def incremental(docs: DataFrame, splitId: Long): Map[Long, Long] = {
    val old = docs.filter(col("doc_id") <= splitId)
    val inc = docs.filter(col("doc_id") > splitId)
    val oldLabels = {
      val m = directComponents(old)
      if (m.isEmpty) Seq.empty[(Long, Long)].toDF("doc_id", "component")
      else m.toSeq.toDF("doc_id", "component")
    }
    Dedup.incrementalComponents(oldLabels, Dedup.banded(old, "doc_id"),
        Dedup.shingleState(old), inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental == direct at every split point") {
    val docs = corpus
    val direct = directComponents(docs)
    for (splitId <- Seq(0L, 2L, 4L, 6L, 8L)) {
      val got = incremental(docs, splitId)
      assert(got == direct, s"split at $splitId: $got != $direct")
    }
  }

  test("an increment that bridges two old components merges them") {
    // two families, then a late doc overlapping BOTH >= 0.5 via a
    // half-and-half text
    val a = "one two three four five six seven eight"
    val b = "red green blue cyan magenta yellow black white"
    val docs = Seq(
      (0L, a), (1L, a),
      (2L, b), (3L, b),
      (4L, a + " " + b) // jaccard vs a-docs and b-docs
    ).toDF("doc_id", "text")
    val direct = directComponents(docs)
    val got = incremental(docs, 3L)
    assert(got == direct)
    // the bridge really merged: if doc 4 has edges to both, all five share min 0
    if (direct.contains(4L) && direct(4L) == 0L && direct.contains(2L))
      assert(direct(2L) == 0L, "bridge failed to merge old components")
  }

  test("empty old corpus and empty increment degenerate cleanly") {
    val docs = corpus
    val direct = directComponents(docs)
    assert(incremental(docs, -1L) == direct)   // everything is the increment
    assert(incremental(docs, 99L) == direct)   // empty increment: labels carry
  }
}
