package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on skewed data") {
    // heavily skewed: 90% of rows share one key
    val df = spark.range(0, 20000)
      .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
        ($"id" % 7).cast("double").as("v"))
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy($"k").collect().toSeq
    val salted = Skew.saltedSumCount(df, "k", "v")
      .withColumnRenamed("sum_v", "sum_v")
      .orderBy($"k").collect().toSeq
    assert(salted.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      == direct.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))))
  }

  test("salts derive from row content only (replay-safe, no position-dependent exprs)") {
    // monotonically_increasing_id/rand-based salts change on partial stage
    // retry and silently duplicate/lose rows (SPARK-23207 class)
    val df = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).cast("double").as("v"))
    val aggPlan = Skew.saltedSumCount(df, "k", "v").queryExecution.analyzed.toString
    val joinPlan = Skew.saltedBroadcastJoin(
      df, spark.range(0, 5).select($"id".as("k"), lit("x").as("name")), "k")
      .queryExecution.analyzed.toString
    for (plan <- Seq(aggPlan, joinPlan)) {
      assert(!plan.contains("monotonically_increasing_id"), plan)
      assert(!plan.contains("rand("), plan)
    }
  }

  test("default salt basis skips unhashable columns; explicit bad saltCols error clearly") {
    val df = spark.range(0, 100)
      .select($"id".as("k"), ($"id" % 3).cast("double").as("v"),
        map(lit("a"), $"id").as("m"))
    // default basis must drop the map column instead of blowing up in xxhash64
    val out = Skew.saltedSumCount(df, "k", "v").orderBy($"k").collect()
    assert(out.length == 100)
    // explicitly salting on the map column is an immediate, explicit error
    val err = intercept[IllegalArgumentException] {
      Skew.saltedSumCount(df, "k", "v", saltCols = Seq("m"))
    }
    assert(err.getMessage.contains("not hashable"))
  }

  test("saltSpread flags byte-identical hot keys as degenerate (n_salts = 1)") {
    val dup = spark.range(0, 1000).select(lit(7L).as("k"), lit(1.0).as("v"))
    val varied = spark.range(0, 1000).select(lit(8L).as("k"), ($"id" % 50).cast("double").as("v"))
    val spread = Skew.saltSpread(dup.union(varied), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spread(7L) == 1L)   // identical rows all hash to one salt
    assert(spread(8L) > 1L)    // content variety spreads
  }

  test("salted broadcast join equals plain join") {
    val fact = Tables.load(spark, sf, "customer")
      .select($"c_custkey", $"c_nationkey".as("k"))
    val dim = Tables.load(spark, sf, "nation")
      .select($"n_nationkey".as("k"), $"n_name")
    val direct = fact.join(dim, "k").groupBy($"n_name").count()
      .orderBy($"n_name").collect().toSeq
    val salted = Skew.saltedBroadcastJoin(fact, dim, "k")
      .groupBy($"n_name").count().orderBy($"n_name").collect().toSeq
    assert(salted == direct)
  }
}
