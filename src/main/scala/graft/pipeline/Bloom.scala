package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/**
 * Bloom-filter semi-join reduction (q100) — the runtime-filter primitive
 * a 100-TB join pipeline uses to keep the BIG side's rows out of the
 * shuffle: summarize the small side's join keys into a fixed-size bitset
 * (bits/64 longs, independent of key count), broadcast it, and drop
 * probe rows map-side before any exchange. Rows that fail the filter are
 * GUARANTEED non-matching (a Bloom filter has no false negatives — the
 * property q100 asserts per graded row); rows that pass go on to the
 * exact join, whose input volume shrinks by the filter's selectivity.
 *
 * Reference analog: none — the reference joins everything it reads
 * (plot_courses.py processes one course per run); this is pure
 * engine-target scale machinery, same family as the CMS/HLL sketches
 * ([[Sketch]]).
 *
 * Determinism/replayability: bit index j of key = mix64(hash_text(key)
 * XOR j) mod bits — the [[Sketch.countMin]] slot scheme (XOR keeps ANSI
 * arithmetic overflow-free; power-of-two bits makes signed pmod equal
 * the unsigned low bits the DuckDB oracle computes in HUGEINT). Bit
 * (word = idx >>> 6, pos = idx & 63) is set iff some build key produced
 * exactly idx, so the oracle replays membership as "each probe idx IN
 * the distinct build-idx set" — structurally different SQL, identical
 * semantics.
 *
 * Scale shape: the build is one groupBy over ≤ bits/64 words (map-side
 * partials collapse to the word table per task — a distributive
 * bit_or aggregate, mergeable in any reduce tree like the HLL
 * registers); the probe adds k broadcast hash joins against that table
 * and NO exchange — the probe side's partitioning is untouched, which
 * is the whole point of a runtime filter.
 */
object Bloom {

  private def bitIdx(h: Column, j: Column, bits: Int): Column =
    pmod(gf.mix64(h.bitwiseXOR(j.cast("long"))), lit(bits.toLong))

  /** The (word, wbits) bitset table of `key` over `keys`: ≤ bits/64 rows
    * regardless of build cardinality. `bits` must be a power of two
    * (≥ 64) so pmod matches the oracle's unsigned mod. */
  def buildWords(keys: DataFrame, key: Column, bits: Int, k: Int): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of 2 >= 64, got $bits")
    keys.select(gf.hash_text(key).as("h"))
      .withColumn("j", explode(array((0 until k).map(lit): _*)))
      .select(bitIdx(col("h"), col("j"), bits).as("idx"))
      .select(shiftrightunsigned(col("idx"), 6).as("word"),
        expr("shiftleft(1L, cast(idx % 64 as int))").as("wv"))
      .groupBy(col("word")).agg(expr("bit_or(wv)").as("wbits"))
  }

  /** Bloom UNION: bitwise OR of word tables — the same distributive
    * mergeability as [[Sketch.hllMerge]] (partial filters built per
    * input split combine in any tree shape). */
  def merge(wordTables: DataFrame*): DataFrame =
    wordTables.reduce(_ unionByName _)
      .groupBy(col("word")).agg(expr("bit_or(wbits)").as("wbits"))

  /** Adds boolean column `out`: might `key` be in the filter `words` was
    * built from? True for EVERY build key (no false negatives); false
    * positives at the classic (1-e^{-kn/bits})^k rate. Probe-side plan:
    * k broadcast left joins, zero exchanges, zero sorts. */
  def mightContain(df: DataFrame, key: Column, words: DataFrame,
                   bits: Int, k: Int, out: String): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of 2 >= 64, got $bits")
    // r5 ADVICE: withColumn REPLACES same-named columns — a caller frame
    // already carrying a helper name would be silently corrupted
    val reserved = Seq("__bh") ++
      (0 until k).flatMap(j => Seq(s"__bi$j", s"__bw$j", s"__bb$j")) :+ out
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"mightContain helper/output columns already present in input: $clash")
    var cur = df.withColumn("__bh", gf.hash_text(key))
    var pass: Column = lit(true)
    for (j <- 0 until k) {
      cur = cur.withColumn(s"__bi$j", bitIdx(col("__bh"), lit(j), bits))
      val w = words.select(col("word").as(s"__bw$j"), col("wbits").as(s"__bb$j"))
      cur = cur.join(broadcast(w),
        shiftrightunsigned(col(s"__bi$j"), 6) === col(s"__bw$j"), "left")
      pass = pass &&
        (expr(s"shiftrightunsigned(coalesce(__bb$j, 0L), cast(__bi$j % 64 as int)) & 1L") === 1L)
    }
    val helper = Seq("__bh") ++ (0 until k).flatMap(j => Seq(s"__bi$j", s"__bw$j", s"__bb$j"))
    cur.withColumn(out, pass).drop(helper: _*)
  }
}
