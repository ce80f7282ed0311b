package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer TRAINING as relational rounds (q114) — the
 * subword-vocabulary trainer (Sennrich et al., ACL'16) a data pipeline
 * runs before token counting / packing, expressed so that every round is
 * pure relational algebra over (word, pos, sym) rows and therefore
 * replayable in SQL:
 *
 *   - pair stats: one `lead` window over each word's symbol sequence,
 *     weighted by the word's corpus frequency (overlapping occurrences
 *     counted, the classic get_pair_stats);
 *   - best pair: argmax by (total DESC, s1 ASC, s2 ASC) — a 1-row
 *     driver-side aggregate, the same train→broadcast→apply shape as the
 *     k-means rounds (q62);
 *   - rewrite: classic BPE replaces left-to-right GREEDILY. Greedy is
 *     not sequential here: overlapping matches exist only for runs of a
 *     repeated symbol (a match at pos and pos+1 forces s1 = s2), and
 *     within each maximal run of CONSECUTIVE match positions greedy
 *     takes exactly the even offsets. So: islands of consecutive match
 *     positions (pos - row_number gaps-and-islands), keep even offsets,
 *     merge those starts, drop the consumed successor, re-densify pos.
 *
 * Trainer state is O(vocab x word length) rows — independent of corpus
 * size (the corpus collapses to the word-frequency table in one
 * aggregation, and 100 TB of text has a bounded distinct-word set by
 * Heaps' law; a cap on vocab rows would be the production knob). Each
 * round's state is localized (size-gated) so the 6-round loop never
 * re-executes upstream lineage.
 */
object Bpe {

  /** The q70-parity whitespace tokenization -> (word, n) frequency table. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(filter(split(trim(col("text")), "\\s+"), tk => tk =!= ""))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /**
   * Train `rounds` merges over `docs`. Returns the ordered merge table
   * (rank, s1, s2, total) and the final per-word tokenization as
   * (word, n, pos, sym) rows.
   */
  def train(docs: DataFrame, rounds: Int, maxLocalRows: Int = 1 << 20)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val loc = graft.sources.Storage.localizeOrCheckpoint(_: DataFrame, maxLocalRows)
    val freq = loc(wordFreq(docs))
    var syms = loc(freq
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("n"), col("pos"),
        col("word").substr(col("pos"), lit(1)).as("sym")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    for (r <- 1 to rounds) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(w))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("s1"), col("nxt").as("s2"))
        .agg(sum(col("n")).as("total"))
        .orderBy(col("total").desc, col("s1"), col("s2")).limit(1)
        .collect().headOption
        .getOrElse(throw new IllegalStateException(
          s"BPE round $r: no adjacent pairs left — corpus too small for $rounds merges"))
      val (b1, b2, total) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((r, b1, b2, total))
      val m = withNext.withColumn("im",
        col("nxt").isNotNull && col("sym") === b1 && col("nxt") === b2)
      // greedy == even offsets inside islands of consecutive match positions
      val sel = m.filter(col("im"))
        .withColumn("grp", col("pos") - row_number().over(w))
        .withColumn("off", row_number().over(
          Window.partitionBy(col("word"), col("grp")).orderBy(col("pos"))) - 1)
        .filter(pmod(col("off"), lit(2)) === 0)
        .select(col("word").as("sw"), col("pos").as("sp"))
      syms = loc(m
        .join(sel, col("word") === col("sw") && col("pos") === col("sp"), "left")
        .withColumn("start", col("sp").isNotNull)
        .drop("sw", "sp")
        .join(sel, col("word") === col("sw") && col("pos") === col("sp") + 1, "left")
        .filter(col("sp").isNull) // consumed successor of a selected start
        .select(col("word"), col("n"), col("pos"),
          when(col("start"), concat(col("sym"), col("nxt"))).otherwise(col("sym")).as("sym"))
        // re-densify in a SEPARATE select: assigning a window over the old
        // `pos` to the name `pos` in one step trips the Spark 4 lateral
        // column alias hazard (CLAUDE.md round-5)
        .withColumn("pos2", row_number().over(w))
        .select(col("word"), col("n"), col("pos2").as("pos"), col("sym")))
    }
    (merges.toSeq, syms)
  }
}
