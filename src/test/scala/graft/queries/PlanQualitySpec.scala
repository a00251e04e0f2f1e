package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** Plan-quality regression tests: the physical plans the queries rely on
  * at 100 TB must not silently degrade — filters/projections reach the
  * parquet scan, small dimensions broadcast, the vector hot path stays
  * inside whole-stage codegen, and the pipe operator introduces no
  * shuffle.
  */
class PlanQualitySpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntryAccess.query(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q02 pushes filter and projection into the parquet scan") {
    val plan = formatted("q02_filter_project")
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(l_quantity,45.0)"), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    // projection pruned: only the 5 referenced columns are read
    assert(!plan.contains("l_shipdate"), plan)
  }

  test("q03 joins every dimension with a broadcast, never sort-merge") {
    val plan = formatted("q03_join_agg")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q07 range join broadcasts the band table") {
    val plan = formatted("q07_range_join")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("graft_dot participates in whole-stage codegen") {
    val df = Similarity.bruteForceTopK(
      Tables.load(spark, sf, "embeddings"), queryVecId = 0L, k = 5)
    df.collect() // AQE only materializes codegen stages at execution
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside WholeStageCodegen stage n: the
    // Project computing graft_dot must carry it
    assert("""\*\(\d+\) Project \[[^\]]*graft_dot""".r.findFirstIn(plan).isDefined, plan)
  }

  test("the pipe operator is a narrow transformation (no Exchange)") {
    import spark.implicits._
    val piped = graft.operators.Stream.tsv(
      Tables.load(spark, sf, "lineitem").select($"l_orderkey"), "cat")
    val plan = piped.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("Exchange"), plan)
  }
}

/** Test-side accessor that keeps PlanQualitySpec free of the SparkEntry
  * name (avoids the graft.queries package/method shadowing).
  */
private object SparkEntryAccess {
  def query(name: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
