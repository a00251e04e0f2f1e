package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) interleaving so that rows
  * close in a MULTI-dimensional key space land close in the file
  * order. At 100 TB this is what makes min/max (row-group / file
  * footer) pruning work on more than one predicate column at once: a
  * single-column sort gives perfect pruning on that column and none
  * on the others, while a Z-sort bounds every clustered dimension's
  * spread within each partition, so a `WHERE user BETWEEN … AND ts
  * BETWEEN …` scan skips most of the files on BOTH predicates.
  *
  * Everything here is deterministic integer arithmetic over stock
  * Catalyst expressions (shifts/masks fold into whole-stage codegen;
  * no kernel needed), so the z-values themselves are oracle-checkable
  * bit-for-bit, and the layout step is ordinary
  * `repartitionByRange(zvalue) + sortWithinPartitions` — Spark's own
  * machinery for the write shape.
  */
object Layout {

  /** Bits per dimension (16 → up to 4 dims in one signed long). */
  val Bits = 16

  /** Normalize a numeric column to the [0, 65535] bucket grid given
    * its global min/max — the rank proxy the interleave consumes.
    * Closed form (no sampling), so an oracle recomputes it exactly:
    * `floor((x - min) * 65536 / (max - min + 1))` in integer math.
    */
  def gridBucket(x: Column, minV: Long, maxV: Long): Column = {
    require(maxV >= minV, s"empty domain [$minV, $maxV]")
    val span = maxV - minV + 1
    // Spark's `/` on longs is double division; the cast truncates,
    // which equals integer division while the numerator stays exactly
    // representable — guaranteed by the span bound (span·2^16 < 2^53)
    require(span < (1L << 37),
      s"gridBucket domain span $span overflows exact double division")
    (((x - lit(minV)) * lit(1L << Bits)) / lit(span)).cast("long")
  }

  /** Morton/Z interleave of up to 3 pre-normalized [0, 2^16) integer
    * columns: bit j of dimension d lands at position j·n + d. Pure
    * shift/mask/or expression tree — codegen'd, exact, engine-portable.
    * Capped at 3 dimensions so the top bit (15·n + n−1) stays below
    * the sign bit and signed-long ordering remains Z-monotone.
    */
  def zvalue(dims: Column*): Column = {
    require(dims.nonEmpty && dims.size <= 3,
      s"zvalue interleaves 1-3 dimensions, got ${dims.size}")
    val n = dims.size
    val terms = for {
      (d, di) <- dims.zipWithIndex
      j <- 0 until Bits
    } yield shiftleft(shiftrightunsigned(d.cast("long"), j).bitwiseAND(lit(1L)),
      j * n + di)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` by the Z-order of the given pre-normalized dimension
    * columns: one range exchange on the z-value plus an in-partition
    * sort — exactly the plan a sorted parquet write wants. The z-value
    * column is dropped; the LAYOUT is the product.
    */
  def zorder(df: DataFrame, dims: Seq[Column],
             numPartitions: Int): DataFrame = {
    val z = zvalue(dims: _*)
    df.withColumn("_graft_z", z)
      .repartitionByRange(numPartitions, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
  }

  /** Per-partition bounding boxes of two dimension columns — the
    * pruning-effectiveness diagnostic: the sum of per-partition spans
    * is what a min/max-pruned scan pays per predicate dimension
    * (LayoutSpec asserts z-order shrinks it vs a one-column sort).
    */
  def partitionBounds(df: DataFrame, dimA: String, dimB: String): DataFrame =
    df.select(spark_partition_id().as("pid"), col(dimA), col(dimB))
      .groupBy(col("pid"))
      .agg(min(dimA).as("a_min"), max(dimA).as("a_max"),
        min(dimB).as("b_min"), max(dimB).as("b_max"),
        count(lit(1)).as("n_rows"))
}
