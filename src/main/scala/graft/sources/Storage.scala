package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed storage for co-located joins (SURVEY.md §4 "partitioning &
 * shuffle"): two tables bucketed (and sorted) by the same key into the
 * same bucket count join with ZERO exchange — at 100 TB the difference
 * between a map-side merge and re-shuffling the whole fact table every
 * query. The production form is an Iceberg table with a bucket partition
 * transform; the sandbox uses Spark's parquet bucketing (same planner
 * contract: `HashClusteredDistribution` satisfied by the scan itself).
 */
object Storage {

  /** Write `df` as a bucketed, per-bucket-sorted table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
