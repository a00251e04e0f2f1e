package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle big fact tables once at write
  * time so repeated joins/aggregations on the bucket key run with NO
  * exchange — at 100 TB the difference between re-shuffling the fact
  * table per query and never shuffling it at all.
  *
  * (The reference's analog is `redimension` + SciDB's chunk-aligned
  * storage: co-locating data by key at write time so operators run
  * instance-locally, `r_pkg/vignettes/ranges.Rmd:8-11`.)
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets —
    * also unlocks sort-merge joins without the sort).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count: Catalyst sees compatible output partitioning on both sides
    * and plans the join with no Exchange.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
