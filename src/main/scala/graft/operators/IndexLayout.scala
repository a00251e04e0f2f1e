package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed parquet layout for STANDING ingest indexes (r15
  * verdict directive 1): every index a per-batch probe reads
  * (chunk-hash q163, 64-bit media hash q161, MinHash signatures
  * q150/q77, substring windows q139/q142, norm-hash q175) is written
  * `partitionBy(bucket)` with `bucket = pmod(xxhash64(key), B)`, and
  * the probe prunes its scan to the buckets — and, when the batch's
  * key set is small enough to ship as a literal, the keys — actually
  * present in the batch.
  *
  * Why this matters: the probes advertise O(batch + collisions), but
  * over a flat layout every micro-batch scans the WHOLE index — at a
  * 100 TB corpus the standing index dwarfs any batch, so the scan,
  * not the batch, becomes the per-batch cost. Partition pruning makes
  * the scan ∝ the batch's bucket set: a b-key batch reads ≤ b/B of
  * the index regardless of history size, and with the key-literal
  * pushdown parquet row-group stats/dictionaries skip non-matching
  * pages inside the touched buckets too. Appends stay O(batch): new
  * part files land inside their key's bucket directory, history is
  * never read or rewritten, and there is no index structure to
  * rebuild (the bucket of a key never changes).
  *
  * Sizing: `NumBuckets` = 64 here (directory count stays civil on the
  * test tiers); a production deployment sizes B so one bucket of the
  * expected index fits a scan task (B ≈ index_bytes / 128 MB) — the
  * probe-side contract (prune to the batch's buckets) is independent
  * of B.
  *
  * Back-compat: a scan of a parquet tree WITHOUT a `bucket` partition
  * column (an index written before this layout) falls back to the
  * full scan — probes keep working against legacy indexes, they just
  * do not prune.
  */
object IndexLayout {

  /** Buckets per index — see the sizing note above. */
  val NumBuckets = 64

  /** Max distinct batch keys shipped as a literal IN-list into the
    * scan (beyond bucket pruning). Bounded so the filter expression
    * and its parquet pushdown stay cheap; larger batches fall back to
    * bucket-only pruning, which is already history-size-independent.
    */
  val MaxKeyPushdown = 4096

  def bucketOf(key: Column): Column =
    pmod(xxhash64(key), lit(NumBuckets)).cast("int")

  /** Write `df` hash-bucketed on `keyCol` (mode = overwrite|append).
    * The bucket is derived, never stored logically: readers get it as
    * a partition column and [[prunedScan]] drops it. The write
    * repartitions on the bucket first — without it every write task
    * opens a file in every bucket directory (tasks × B small files
    * per write/append); with it each bucket lands in one task → ~1
    * file per touched bucket per write. Index builds are offline
    * cost, so the extra exchange is the right trade; a production
    * deployment with TB-sized buckets raises the output parallelism
    * (repartition(N, bucket)) instead.
    */
  def writeBucketed(df: DataFrame, keyCol: String, path: String,
                    mode: String): Unit =
    df.withColumn("bucket", bucketOf(col(keyCol)))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket").parquet(path)

  /** Read the index at `path` pruned to `batchKeys` (a one-column
    * frame of the batch's — possibly repeated — key values):
    *
    *  1. ONE batch-sized job collects the distinct (key, bucket)
    *     pairs up to [[MaxKeyPushdown]]+1;
    *  2. within the cap → filter the scan by `bucket IN (...)` AND
    *     `key IN (...)` (partition pruning + row-group pushdown);
    *  3. over the cap → a second job collects just the distinct
    *     buckets (≤ [[NumBuckets]] values by construction) and the
    *     scan prunes on buckets alone.
    *
    * Correct for every probe here because each one only ever consumes
    * index rows whose key EQUALS some batch key (equi-joins and
    * key-grouped aggregates joined back to the batch): rows outside
    * the batch's key set cannot influence the result. Returns the
    * frame WITHOUT the bucket column.
    */
  def prunedScan(spark: SparkSession, path: String, keyCol: String,
                 batchKeys: DataFrame): DataFrame = {
    val idx = spark.read.parquet(path)
    if (!idx.columns.contains("bucket")) idx // legacy flat layout
    else {
      val kb = batchKeys
        .select(col(batchKeys.columns.head).as("k"),
          bucketOf(col(batchKeys.columns.head)).as("b"))
        .distinct().limit(MaxKeyPushdown + 1).collect()
      val pruned =
        if (kb.length <= MaxKeyPushdown) {
          val buckets = kb.map(_.getInt(1)).distinct.toSeq
          val keys = kb.map(_.get(0)).toSeq
          idx.filter(col("bucket").isin(buckets: _*) &&
            col(keyCol).isin(keys: _*))
        } else {
          val buckets = batchKeys
            .select(bucketOf(col(batchKeys.columns.head)).as("b"))
            .distinct().collect().map(_.getInt(0)).toSeq
          idx.filter(col("bucket").isin(buckets: _*))
        }
      pruned.drop("bucket")
    }
  }
}
