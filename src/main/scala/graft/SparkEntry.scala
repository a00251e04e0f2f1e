package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qmod}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories. Every query takes
  * (spark, sfDir) and returns a deterministic DataFrame; `oracleSql`
  * holds the equivalent DuckDB SQL over the same parquet tables.
  */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (qmod.Relational.queries, qmod.Relational.oracleSql),
      (qmod.PipeQueries.queries, qmod.PipeQueries.oracleSql),
      (qmod.DataPipeline.queries, qmod.DataPipeline.oracleSql),
      (qmod.Patterns.queries, qmod.Patterns.oracleSql),
      (qmod.Corpus.queries, qmod.Corpus.oracleSql),
      (qmod.Probabilistic.queries, qmod.Probabilistic.oracleSql),
      (qmod.Search.queries, qmod.Search.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qmod.Relational.queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
