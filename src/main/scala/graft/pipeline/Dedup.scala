package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/**
 * The ONE definition of the engine's MinHash-LSH banding scheme, shared by
 * the batch pair query (q25), the batch first-wins retention (q63), the
 * curation funnel's near-dup stage (q65), and the streaming form
 * ([[graft.streaming.NearDup]]) — a parameter change here changes all four
 * together, so batch and stream can never silently diverge.
 */
object Dedup {

  val ShingleN = 3
  val MinhashK = 64
  val MinhashSeed = 7L
  val RowsPerBand = 4

  /**
   * One row per (passthrough columns, `band`): the 16 LSH band keys of the
   * doc's 64-slot minhash signature over word 3-shingles of `text`.
   *
   * Docs with NO shingles (fewer than [[ShingleN]] tokens) are EXCLUDED:
   * `TextOps.minHash` gives an empty shingle set the all-`Long.MaxValue`
   * sentinel signature, so every short doc would band-collide with every
   * other short doc — not a similarity judgment at all. Excluding them
   * also matches the DuckDB replays (whose shingle CTE generates no rows
   * for them); short docs are simply not candidates for near-dup logic.
   */
  def banded(docs: DataFrame, passthrough: String*): DataFrame =
    docs
      .withColumn("__sh", gf.word_shingles(col("text"), lit(ShingleN)))
      .filter(size(col("__sh")) > 0)
      .select(passthrough.map(col) :+
        explode(gf.lsh_bands(
          gf.minhash(col("__sh"), lit(MinhashK), lit(MinhashSeed)),
          lit(RowsPerBand))).as("band"): _*)

  /**
   * First-wins retention over a [[banded]] frame: `(doc_id, kept)` where
   * kept = the doc is the smallest-id claimant of EVERY band it occupies
   * ("dedup against seen" — the greedy order-respecting rule a single
   * streaming pass can honor). Band-keyed groupBy + equi-join + doc-keyed
   * groupBy: no all-pairs stage, partial aggregation map-side throughout.
   */
  def firstWinsKept(banded: DataFrame): DataFrame = {
    val owner = banded.groupBy(col("band")).agg(min(col("doc_id")).as("owner"))
    banded.join(owner, Seq("band"))
      .groupBy(col("doc_id"))
      .agg(min(when(col("owner") === col("doc_id"), 1).otherwise(0)).as("k"))
      .select(col("doc_id"), (col("k") === 1).as("kept"))
  }
}
