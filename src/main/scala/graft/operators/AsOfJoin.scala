package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * (same key) with time ≤ the left row's time — the canonical
  * market-data/event-attribution operator Spark lacks natively.
  *
  * Implementation is the scalable union-window formulation, not a range
  * join: tag both sides, union them, and take `last(right value,
  * ignoreNulls) OVER (PARTITION BY key ORDER BY time, tag)` — ONE
  * shuffle on (key), linear in rows, no quadratic candidate space. At
  * 100 TB this is the difference between a sort within partitions and
  * an interval-join blowup.
  */
object AsOfJoin {

  /** Join `left` to the latest earlier `right` row per key.
    *
    * @param valueCols right-side columns to carry (returned as
    *                  `asof_<name>`, null when no earlier right row)
    */
  def join(left: DataFrame, right: DataFrame, key: String, time: String,
           valueCols: Seq[String], tieBreaker: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val keep = Set(key, time) ++ tieBreaker
    // tag: right rows sort before left rows at equal time, so a right
    // row at exactly t is visible to a left row at t
    val l = left.withColumn("_tag", lit(1))
      .select((leftCols.map(col) :+ col("_tag")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")): _*)
    val r = right.withColumn("_tag", lit(0))
      .select((leftCols.map(c =>
        (if (keep(c)) col(c) else lit(null).cast(left.schema(c).dataType))
          .as(c)) :+ col("_tag")) ++
        valueCols.map(c => col(c).as(s"_v_$c")): _*)
    val orderCols = Seq(col(time).asc, col("_tag").asc) ++
      tieBreaker.map(col(_).asc)
    val w = Window.partitionBy(col(key))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .select(Seq(col("*")) ++ valueCols.map(c =>
        last(col(s"_v_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    filled.filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
