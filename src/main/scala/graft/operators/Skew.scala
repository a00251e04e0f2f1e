package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** xxhash64 rejects MapType (and anything containing one) at analysis
    * time; map entries have no canonical order so Spark refuses to hash
    * them. Variant/UDT columns are excluded too for the same reason.
    */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType                => false
    case s: StructType             => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType              => hashable(a.elementType)
    case _: VariantType            => false
    case _: UserDefinedType[_]     => false
    case _                         => true
  }

  /** Salt basis columns: caller-supplied `saltCols` (validated — an
    * unhashable column is an immediate, explicit error rather than a
    * deep AnalysisException), else every hashable column of `df`.
    */
  private def saltBasis(df: DataFrame, saltCols: Seq[String]): Seq[Column] = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    if (saltCols.nonEmpty) {
      val bad = saltCols.filter(c => !types.contains(c) || !hashable(types(c)))
      require(bad.isEmpty,
        s"saltCols ${bad.mkString(", ")} are missing or not hashable (map/variant " +
          "types cannot feed xxhash64); pick different salt columns")
      saltCols.map(col)
    } else {
      val basis = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
      require(basis.nonEmpty,
        "no hashable columns to derive a salt from; pass saltCols explicitly")
      basis
    }
  }

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
    val basis = saltBasis(df, saltCols)
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
    val basis = saltBasis(fact, saltCols)
    val factSalted = fact.withColumn("_salt",
      pmod(xxhash64(basis: _*), lit(numSalts)).cast("int"))
    factSalted.join(broadcast(dimExploded), Seq(key, "_salt")).drop("_salt")
  }

  /** Diagnostic: distinct salts actually hit per key under the same
    * basis the salted operators would use. A hot key whose rows are
    * byte-identical collapses to `n_salts = 1` — degenerate spreading
    * that silently reintroduces the skew; run this (e.g. on a sample)
    * to detect it and pick better `saltCols`.
    */
  def saltSpread(df: DataFrame, key: String,
                 numSalts: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    val basis = saltBasis(df, saltCols)
    df.withColumn("_salt", pmod(xxhash64(basis: _*), lit(numSalts)))
      .groupBy(col(key))
      .agg(countDistinct(col("_salt")).as("n_salts"), count(lit(1)).as("n_rows"))
  }
}
