package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 400).map { i =>
    (i.toLong, s"src${i % 4}", Seq.fill(i % 30 + 1)("w").mkString(" "))
  }.toDF("doc_id", "source", "text")

  test("seededMixture keeps the same rows under any partitioning") {
    val rates = Map("src0" -> 0.05, "src1" -> 0.8)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.seededMixture(df, "source", "doc_id", rates, defaultRate = 0.3)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    val a = ids(docs.repartition(1))
    val b = ids(docs.repartition(13, $"text"))
    assert(a == b && a.nonEmpty)
    // rates bite per stratum: src0 keeps far fewer than src1
    val kept = Sampling.seededMixture(docs, "source", "doc_id", rates, 0.3)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(kept.getOrElse("src0", 0L) < kept("src1"))
  }

  test("packByTokenBudget bins are contiguous and respect the budget bound") {
    val t = docs.select($"source", $"doc_id",
      size(split($"text", " ")).cast("long").as("n_tokens"))
    val packed = Sampling.packByTokenBudget(t, "n_tokens", budget = 100L,
      partitionCol = "source", orderCol = "doc_id")
    val sums = packed.groupBy($"source", $"bin")
      .agg(sum($"n_tokens").as("s"), max($"n_tokens").as("m"))
      .collect()
    // a bin holds < budget tokens before its last doc was added, so its
    // total is < budget + that doc's size
    assert(sums.forall(r => r.getLong(2) < 100L + r.getLong(3)))
    // order within a group is what packs: doc_id order -> nondecreasing bins
    val perDoc = packed.filter($"source" === "src0")
      .orderBy($"doc_id").select($"bin").as[Long].collect()
    assert(perDoc.sameElements(perDoc.sorted))
  }

  test("packByTokenBudget skips bin ids when one doc overflows the budget") {
    // a 250-token doc with budget 100 advances the boundary past bins
    // 0-2 at once: the next doc lands in bin 2, bins are NOT contiguous
    val t = Seq(("s", 1L, 250L), ("s", 2L, 10L), ("s", 3L, 10L))
      .toDF("source", "doc_id", "n_tokens")
    val bins = Sampling.packByTokenBudget(t, "n_tokens", budget = 100L,
        partitionCol = "source", orderCol = "doc_id")
      .orderBy($"doc_id").select($"bin").as[Long].collect().toSeq
    assert(bins == Seq(0L, 2L, 2L), bins.toString)
  }

  test("packByTokenBudget refuses to overwrite an existing bin column") {
    val t = Seq(("s", 1L, 10L, "mine")).toDF("source", "doc_id", "n_tokens", "bin")
    intercept[IllegalArgumentException] {
      Sampling.packByTokenBudget(t, "n_tokens", 100L, "source", "doc_id")
    }
    // a caller-chosen output name routes around the collision
    val out = Sampling.packByTokenBudget(t, "n_tokens", 100L, "source", "doc_id",
      binCol = "pack_bin")
    assert(out.columns.contains("pack_bin") &&
      out.select($"bin").head.getString(0) == "mine")
  }
}
