package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining reference dataflow patterns as oracle-checked queries:
  *
  * P8 (distributed ML, `py_pkg/examples/4-machine-learning.py:167-313`):
  * the partial-fit → combine topology natively — per-partition partial
  * aggregation of regression sufficient statistics, combined by
  * Catalyst's partial+final aggregate into one tiny model-input row.
  * Solving/broadcast/predict is the driver-side tail (see MLPatternSpec).
  *
  * P10 (reproducible parallel RNG, `r_pkg/vignettes/poLCA.Rmd:34-43`):
  * seed-derived uniform variates — md5-hash-based so the sample is
  * identical on any engine, any partitioning, any cluster size: the
  * property the reference gets from per-row L'Ecuyer seed streams.
  */
object Patterns {

  /** u in [0,1) from the first 8 hex digits of a 32-hex hash string:
    * Σ digit_i / 16^i — binary-exact arithmetic, so portable bit-for-bit.
    * The hash is computed once into a column named by `hashCol`.
    */
  private def u01FromHash(hashCol: String, strpos: (String, String) => String): String = {
    val digits = (1 to 8).map { i =>
      s"(${strpos(s"substr($hashCol, $i, 1)", "'0123456789abcdef'")} - 1) / ${math.pow(16, i).toLong}.0"
    }
    digits.mkString("(", " + ", ")")
  }

  private def u01Spark(hashCol: String): String =
    u01FromHash(hashCol, (c, alpha) => s"position($c IN $alpha)")

  private def u01Duck(hashCol: String): String =
    u01FromHash(hashCol, (c, alpha) => s"strpos($alpha, $c)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P8: regression sufficient statistics value ~ k (map-side partials
    // per partition, one combined row out — the "combine models" step).
    "q60_ml_suffstats" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("x", get_json_object($"props", "$.k").cast("double"))
        .agg(
          count(lit(1)).as("n"),
          round(sum($"x"), 4).as("sum_x"),
          round(sum($"value"), 4).as("sum_y"),
          round(sum($"x" * $"value"), 4).as("sum_xy"),
          round(sum($"x" * $"x"), 4).as("sum_xx"))
    },

    // P10: seed-reproducible 30% sample — same rows regardless of
    // engine, partitioning, or cluster size.
    "q61_seeded_sample" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("h", md5($"event_id".cast("string").cast("binary")))
        .withColumn("u", expr(u01Spark("h")))
        .filter($"u" < 0.3)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .orderBy($"event_type")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q60_ml_suffstats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(sum(x), 4) AS sum_x,
        |  round(sum(value), 4) AS sum_y,
        |  round(sum(x * value), 4) AS sum_xy,
        |  round(sum(x * x), 4) AS sum_xx
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS DOUBLE) AS x, value
        |      FROM events)""".stripMargin,

    "q61_seeded_sample" ->
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  round(sum(value), 4) AS sum_value
         |FROM (SELECT event_type, value, ${u01Duck("h")} AS u
         |      FROM (SELECT event_type, value,
         |              md5(CAST(event_id AS VARCHAR)) AS h FROM events))
         |WHERE u < 0.3 GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
