package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-trained character-trigram language model with add-1 smoothing —
 * the KenLM-style perplexity quality filter a real curation pipeline runs
 * (train an LM on a trusted split, score candidate docs, gate on average
 * log-probability). Unlike q77/q79's seed-derived constant models, the
 * model here is TRAINED FROM A CORPUS SPLIT as a DataFrame aggregation,
 * exercising train -> publish -> score as one dataflow (the q62 k-means
 * pattern, on text).
 *
 * Numerics (the cross-engine contract): counts are exact integers (one
 * groupBy each); each scored trigram's term is `ln` of ONE double division
 * `(n3+1)/(n2+V)` — identical expression shape in the DuckDB replay — and
 * the per-doc score folds the terms in POSITION order (left fold seeded
 * 0.0), so the only cross-engine drift is sub-ULP `ln` disagreement; the
 * graded column is quantized to 1e-6 with the boundary margin pinned in
 * LangModelSpec (the q43/q45 quantized-compare rule).
 *
 * Scale shape: training is one map-side-partial groupBy per count table
 * (shuffle rows = distinct trigrams, bounded by charset^3 — NOT corpus
 * size, so the model is broadcast-able by construction); scoring is a
 * broadcast join per trigram occurrence plus one doc-keyed aggregation.
 * No driver state beyond the O(1) vocab-size scalar. At 10^12 docs the
 * only knob that matters is `minCount` pruning of the broadcast tables.
 */
object LangModel {

  /** Trigram array of `text` — the codegen'd [[graft.expr.TextOps.charShingles]]
    * kernel (r6): the previous `transform(sequence(1, len-2),
    * i -> substring(text, i, 3))` HOF form re-scanned the string per
    * substring call (Spark's char-offset substring is O(position)) and
    * paid per-element lambda evaluation — measured ~2s of the q90
    * training pass alone. The kernel emits the identical trigram strings
    * in one pass (UTF-16 indexing — the kernel family's documented
    * ASCII-corpus scope; empty array below 3 chars, exactly the old
    * when/otherwise guard). */
  private def triExplode(text: Column): Column =
    graft.functions.char_shingles(text, lit(3))

  /** Trained model: trigram counts `(tri, n3)`. Exact integer counts;
    * `minCount` drops rare trigrams (the 100-TB broadcast-size knob; 0 =
    * keep all, the oracle-replayed fixture setting). */
  def trigramModel(train: DataFrame, minCount: Long = 0L): DataFrame =
    train
      .select(explode(triExplode(col("text"))).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("n3"))
      .filter(col("n3") >= minCount)

  /** Context counts derived FROM the trigram table (sum over trigrams
    * sharing the 2-char prefix) — consistent with the smoothed
    * conditional by construction. */
  def contextCounts(model: DataFrame): DataFrame =
    model.groupBy(substring(col("tri"), 1, 2).as("ctx"))
      .agg(sum(col("n3")).as("n2"))

  /**
   * Score docs under the trained model: per doc, the position-ordered
   * left fold of `ln((n3+1)/(n2+V))` over its trigrams plus the count.
   * Returns `(doc_id, n_tri, lp)`; docs shorter than 3 chars are
   * excluded (no trigrams — not a fluency judgment at all, the
   * Dedup.banded rule). `model`/`ctx` arrive already-materialized (tiny
   * by construction) so Catalyst broadcasts both joins.
   */
  def scoreDocs(docs: DataFrame, model: DataFrame, ctx: DataFrame,
                vocabSize: Long): DataFrame = {
    val toks = docs
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        posexplode(triExplode(col("text"))).as(Seq("pos", "tri")))
    toks
      .join(broadcast(model), Seq("tri"), "left")
      .join(broadcast(ctx), substring(col("tri"), 1, 2) === col("ctx"), "left")
      .select(col("doc_id"), col("pos"),
        log((coalesce(col("n3"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("n2"), lit(0L)) + vocabSize).cast("double")).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("term")))),
            s => s("term")),
          lit(0.0), (acc, v) => acc + v).as("lp"))
  }
}
