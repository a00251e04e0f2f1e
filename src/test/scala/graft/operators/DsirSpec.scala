package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: the selection signal must actually point
  * toward the target distribution, the model must stay bucket-bounded,
  * and the plan must broadcast the model — the properties that make it
  * a training-data-selection primitive rather than a scoring toy.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like documents score above target-unlike ones") {
    // target: cooking-ish text; raw corpus: two cooking docs and two
    // astronomy docs, repeated words so bucket counts separate clearly
    val target = Seq.tabulate(20)(i =>
      (i.toLong, "stir the sauce then bake the bread then stir again"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "stir the sauce then bake it"),
      (2L, "bake the bread then stir the sauce"),
      (3L, "orbit of the outer planets around a dwarf star"),
      (4L, "telescope survey of a distant galaxy cluster"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // per-gram mean would also work; sums suffice at equal-ish lengths
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)), w.toString)
  }

  test("short documents drop out; weights are partitioning-invariant") {
    val target = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val raw = Seq((1L, "a b"), (2L, "word"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Dsir.importanceWeights(raw, target).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L)) // <2 tokens → no features
    val r8 = Dsir.importanceWeights(raw.repartition(8), target.repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r8 == out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("the bucket model is bounded and rides a broadcast join") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val df = Dsir.importanceWeights(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), buckets = 256)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the raw gram stream joins the (≤ buckets)-row model via
    // BroadcastHashJoin — never a shuffle of the gram stream on the
    // bucket key, never a nested loop
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bucket count must be a power of two") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(d, d, buckets = 1000)
    }
  }
}
