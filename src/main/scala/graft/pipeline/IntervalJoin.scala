package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed point-in-interval join.
 *
 * Spark has no native range-join optimization: a bare
 * `left.join(right, ts >= s && ts < e)` plans as BroadcastNestedLoopJoin
 * (or a cartesian product) — O(|L|·|R|) comparisons, the shape that dies
 * first at scale. This operator recovers an EQUI-join plan: both sides key
 * on fixed-width time buckets — each interval row explodes to every bucket
 * it overlaps, each point row maps to the single bucket containing it —
 * the join is a stock shuffle/broadcast hash join on the bucket key, and
 * the exact containment predicate refines. A (point, interval) pair can
 * only meet in the point's own bucket, so matches are exact with NO dedup
 * pass.
 *
 * Scale properties: shuffle (if any) is on the bucket key, which is
 * time-uniform for crawl-style streams; `bucketMicros` trades interval
 * replication (long intervals explode to more buckets) against probe
 * selectivity (wide buckets refine away more candidates) — set it near
 * the median interval length. Skewed hot buckets fall under the same AQE
 * skew-join handling as any equi-join, which is the point: once the join
 * is an equi-join, every tool Spark has for joins applies.
 */
object IntervalJoin {

  /**
   * All (left row, right interval) matches where left.`tsCol` ∈
   * [right.`sCol`, right.`eCol`). Column names must not collide across
   * the two sides; intervals with e <= s are dropped (empty).
   * Output = left columns ++ right columns.
   */
  def pointInInterval(left: DataFrame, tsCol: String, right: DataFrame,
                      sCol: String, eCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    // parquet event times arrive as TIMESTAMP_NTZ; unix_micros requires
    // TIMESTAMP — the cast is applied uniformly to all three columns, so
    // bucket arithmetic and the refine predicate see one time basis
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val lb = left.withColumn("__bucket",
      floor(us(col(tsCol)) / lit(bucketMicros)))
    val rb = right
      .filter(col(eCol) > col(sCol))
      .withColumn("__bucket", explode(sequence(
        floor(us(col(sCol)) / lit(bucketMicros)),
        // e is exclusive: the last covered bucket holds e - 1us
        floor((us(col(eCol)) - 1) / lit(bucketMicros)))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(tsCol) >= col(sCol) && col(tsCol) < col(eCol))
      .drop("__bucket")
  }
}
