package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bigram-LM scoring vs hand-computed add-one-smoothed probabilities,
  * plus the structural contracts: short-doc drop, pruning-to-floor,
  * and broadcast-only model joins (the plan that scales).
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("scores match the hand-computed add-one model") {
    // corpus: d1 = "a b a b", d2 = "a a"
    // unigrams: a=4, b=2  -> V=2
    // bigrams:  "a b"=2, "b a"=1, "a a"=1
    // minCount=2 keeps only "a b" (c12=2); others floor to c12=0
    val docs = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(docs, "doc_id", "text", minCount = 2L)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // q("a b") = floor(1e6 * 3 / (4 + 2)) = 500000   (c1(a)=4)
    // q("b a") = floor(1e6 * 1 / (2 + 2)) = 250000   (c1(b)=2, pruned)
    // q("a a") = floor(1e6 * 1 / (4 + 2)) = 166666
    // d1: bigrams [a b, b a, a b] -> sum = 1250000, mean = 416666
    // d2: bigrams [a a]           -> sum = 166666,  mean = 166666
    assert(got == Seq((1L, 3L, 1250000L, 416666L), (2L, 1L, 166666L, 166666L)))
  }

  test("single-token and empty docs drop out; tokens include split empties") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = NgramLm.scoreDocs(docs, "doc_id", "text").select($"doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("pruning everything floors every bigram to the smoothing floor") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // minCount=10 prunes all bigrams; V=3, c1(a)=c1(b)=1
    // q = floor(1e6 * 1 / (1 + 3)) = 250000 for both
    val got = NgramLm.scoreDocs(docs, "doc_id", "text", minCount = 10L)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((1L, 2L, 500000L, 250000L)))
  }

  test("model and unigram joins are broadcasts — no shuffle of the score stream") {
    val docs = (1L to 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val plan = NgramLm.scoreDocs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), s"model join fell back to SMJ:\n$plan")
  }
}
