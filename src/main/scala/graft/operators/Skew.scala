package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregation and joins.
  *
  * At 100 TB a handful of hot keys (the empty document, a boilerplate
  * shingle, a null-ish user id) can pin one reducer while 999 executors
  * idle. Classic remedies, expressed declaratively so Catalyst still
  * optimizes around them:
  *
  *  - salted two-phase aggregation: key → (key, salt) partial agg →
  *    final agg over the `numSalts`-times-smaller partials;
  *  - salted broadcast-side explosion for joins (small side replicated
  *    per salt, big side salted randomly).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`)
  * covers sort-merge joins automatically; these helpers cover the
  * aggregation case and deterministic-salt needs that AQE does not.
  */
object Skew {

  /** Two-phase salted sum/count aggregation: equivalent to
    * `df.groupBy(key).agg(sum(valueCol), count)` but with the first
    * shuffle keyed on (key, salt) so a hot key spreads over `numSalts`
    * reducers.
    *
    * The salt is derived ONLY from row content (`xxhash64` over
    * `saltCols`, defaulting to every column), never from
    * `monotonically_increasing_id()` or RNG: position-dependent salts
    * change on partial stage retry after a shuffle-fetch failure, and
    * recomputed map tasks would route rows to different reducers than
    * the ones that already fetched — the SPARK-23207 class of silent
    * duplicate/lost rows. Content-derived salts replay identically.
    * Caveat: fully identical rows share a salt; if the hot key's rows
    * are byte-identical, pass a caller-supplied unique id column in
    * `saltCols` to spread them.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     numSalts: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    require(numSalts > 0)
    val basis = (if (saltCols.nonEmpty) saltCols else df.columns.toSeq).map(col)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(basis: _*), lit(numSalts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
           sum(col("_pcnt")).as("n"))
  }

  /** Salted join of a skewed fact against a small dimension: the
    * dimension is exploded `numSalts`× and broadcast; the fact side gets
    * a content-derived salt (replay-safe, see [[saltedSumCount]]), so a
    * hot fact key's rows spread over `numSalts` distinct join partitions
    * as long as their non-key content varies.
    */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
                          numSalts: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    val salts = fact.sparkSession.range(numSalts).select(col("id").cast("int").as("_salt"))
    val dimExploded = dim.crossJoin(salts)
    val basis = (if (saltCols.nonEmpty) saltCols else fact.columns.toSeq).map(col)
    val factSalted = fact.withColumn("_salt",
      pmod(xxhash64(basis: _*), lit(numSalts)).cast("int"))
    factSalted.join(broadcast(dimExploded), Seq(key, "_salt")).drop("_salt")
  }
}
