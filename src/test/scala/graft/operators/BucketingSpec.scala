package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed co-located joins must not shuffle: the write-once,
  * join-forever layout for 100 TB fact tables.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "lineitem").select($"l_orderkey", $"l_quantity")
          .withColumnRenamed("l_orderkey", "k"),
        "b_lineitem", "k")
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "orders").select($"o_orderkey", $"o_totalprice")
          .withColumnRenamed("o_orderkey", "k"),
        "b_orders", "k")
      val joined = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", "k")
        .groupBy($"k").agg(sum($"l_quantity").as("q"), sum($"o_totalprice").as("p"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // and the result is right
      val n = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", "k").count()
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          $"l_orderkey" === $"o_orderkey").count()
      assert(n == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
