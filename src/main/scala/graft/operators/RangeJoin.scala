package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/overlap joins (reference pattern P7 — variants × genes on
  * interval overlap, `r_pkg/vignettes/ranges.Rmd:25-49`).
  *
  * Two execution strategies:
  *  - `broadcastOverlap`: theta-join against a broadcast side —
  *    Catalyst plans BroadcastNestedLoopJoin; right when one side fits
  *    in memory (the reference's 23k-gene table).
  *  - `binnedOverlap`: the scale path when both sides are large. Each
  *    interval explodes into the fixed-width bins it touches; the join
  *    becomes an equi-join on bin id (shuffle-partitionable, AQE/skew
  *    friendly) with the exact overlap predicate re-checked and
  *    duplicates removed. O(n·m) work becomes O(n·k + matches) where k
  *    = avg bins per interval — the standard genomic-interval-join
  *    rewrite, expressed entirely in built-in operators so Catalyst
  *    keeps optimizing around it.
  */
object RangeJoin {

  /** Overlap predicate: [aLo, aHi] ∩ [bLo, bHi] ≠ ∅ (closed intervals). */
  def overlaps(aLo: Column, aHi: Column, bLo: Column, bHi: Column): Column =
    aLo <= bHi && bLo <= aHi

  /** Broadcast theta-join strategy (small right side). */
  def broadcastOverlap(left: DataFrame, right: DataFrame,
                       lLo: String, lHi: String, rLo: String, rHi: String): DataFrame =
    left.join(broadcast(right),
      overlaps(col(lLo), col(lHi), col(rLo), col(rHi)))

  private def withBins(df: DataFrame, lo: String, hi: String,
                       binWidth: Long): DataFrame =
    df.withColumn("_bin", explode(sequence(
      floor(col(lo) / binWidth).cast("long"),
      floor(col(hi) / binWidth).cast("long"))))

  /** Binned equi-join strategy (both sides large). Intervals spanning
    * many bins are capped implicitly by binWidth choice; pairs touching
    * several shared bins are deduplicated.
    */
  def binnedOverlap(left: DataFrame, right: DataFrame,
                    lLo: String, lHi: String, rLo: String, rHi: String,
                    binWidth: Long = 100L): DataFrame = {
    require(binWidth > 0)
    val lb = withBins(left, lLo, lHi, binWidth)
    val rb = withBins(right, rLo, rHi, binWidth).withColumnRenamed("_bin", "_rbin")
    lb.join(rb, lb("_bin") === rb("_rbin") &&
        overlaps(col(lLo), col(lHi), col(rLo), col(rHi)))
      // an overlapping pair appears once per shared bin: keep the first
      .filter(col("_bin") === greatest(
        floor(col(lLo) / binWidth).cast("long"),
        floor(col(rLo) / binWidth).cast("long")))
      .drop("_bin", "_rbin")
  }
}
