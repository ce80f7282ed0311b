package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/**
 * Deterministic corpus sampling (q84): the k rows with the SMALLEST
 * content hash — an RNG-free uniform sample (the mixer makes hash order
 * independent of any data order), so the sample is identical across
 * runs, engines, partitionings and (crucially) across GROWING datasets:
 * bottom-k of a union is the bottom-k of the parts' bottom-ks, which
 * makes it mergeable and incremental — the property reservoir sampling
 * loses the moment order or parallelism changes.
 *
 * Scale shape: full ordering + limit plans TakeOrderedAndProject —
 * per-partition top-k heaps, driver merges k*partitions candidates; no
 * global sort, no shuffle of the losers.
 */
object Sample {

  /** The k rows with smallest `hash_text(key)` (ties by `tiebreak`).
    * Output carries the sample hash as `h` — consumers re-verify
    * membership (h < the kth hash) without recomputing the corpus. */
  def bottomK(df: DataFrame, key: Column, tiebreak: Column, k: Int): DataFrame =
    df.withColumn("h", gf.hash_text(key))
      .orderBy(col("h"), tiebreak)
      .limit(k)
}
