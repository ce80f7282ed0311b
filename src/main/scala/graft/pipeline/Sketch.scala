package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/**
 * Count-min sketch (q82) — the sublinear frequency structure a 10^12-row
 * stream summarizes heavy hitters with when an exact groupBy over all
 * keys is too large to hold. `depth` independent hash rows of `width`
 * counters; a key's estimate is the MIN of its counters, which can only
 * OVER-estimate (collisions add, never subtract) — the classic one-sided
 * guarantee, asserted per-key in the q82 output.
 *
 * Determinism/replayability: slot hash = mix64(hash_text(key) XOR j) —
 * XOR (not +) so the composition never overflows under ANSI arithmetic,
 * and the DuckDB oracle replays it with the same HUGEINT machinery as
 * the minhash bands. `width` must be a power of two so the signed
 * `pmod` equals the unsigned low bits the oracle computes.
 *
 * Scale shape: the counter build is ONE groupBy over (j, bucket) —
 * depth*width cells regardless of key cardinality (map-side partials
 * collapse to ≤ depth*width rows per task); estimates are an equi-join
 * of the (distinct-key x depth) probe frame against the tiny counter
 * table, broadcastable by construction.
 */
object Sketch {

  private def bucket(key: Column, j: Column, width: Int): Column =
    pmod(gf.mix64(gf.hash_text(key).bitwiseXOR(j.cast("long"))), lit(width.toLong))

  /** The (j, bucket, cnt) counter table of `df`'s `key` column. */
  def countMin(df: DataFrame, key: Column, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0, s"width must be a power of 2, got $width")
    df.select(key.as("k"))
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .select(col("j"), bucket(col("k"), col("j"), width).as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys` (a frame with column `k`): min counter
    * across the depth rows. Missing cells count 0 (keys never inserted). */
  def cmsEstimates(counters: DataFrame, keys: DataFrame,
                   depth: Int = 4, width: Int = 1024): DataFrame =
    keys.select(col("k"))
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", bucket(col("k"), col("j"), width))
      .join(counters, Seq("j", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
