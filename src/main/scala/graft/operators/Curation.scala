package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard training-corpus curation pipeline as one call: quality
  * gate → cluster-level near-dup removal → eval-set decontamination →
  * deterministic split assignment. Each stage is one of the library's
  * gated operators; the composition itself is gated end-to-end by
  * q76_curate_e2e (one oracle over the whole chain).
  *
  * Scale shape: the quality gate and split assignment are narrow; the
  * dedup stage is the LSH pair miner + pointer-jumping components
  * (both documented in their own operators); decontamination is one
  * semi join against the benchmark gram set (broadcast while small,
  * see [[TextAnalysis.contaminationStats]] for the guarded variant).
  * Nothing in the chain is quadratic in the corpus.
  *
  * Cache contract: the LSH stage caches its shingle-set table — release
  * with `graft.Tables.releaseOperatorCaches` after the terminal action.
  *
  * @return the curated corpus: the input columns plus `n_tokens` and
  *         `split`, containing only quality-passing, cluster-deduped,
  *         uncontaminated documents.
  */
object Curation {
  def curate(docs: DataFrame, bench: DataFrame,
             minTokens: Int = 20,
             dedupThreshold: Double = 0.5,
             contaminationNgram: Int = 3,
             splits: Seq[(String, Double)] =
               Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .filter(col("n_tokens") >= minTokens)
      .select(col("doc_id"), col("n_tokens"))
    val qdocs = docs.join(quality, Seq("doc_id"))
    val pairs = TextDedup.minhashLshPairs(qdocs, dedupThreshold)
    val drop = Components.dupClusters(pairs)
      .filter(col("doc_id") =!= col("component")).select(col("doc_id"))
    val deduped = qdocs.join(drop, Seq("doc_id"), "left_anti")
    val benchGrams = TextDedup.wordShingles(bench, contaminationNgram)
      .select(col("sh")).distinct()
    val contaminated = TextDedup.wordShingles(deduped, contaminationNgram)
      .join(broadcast(benchGrams), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.assignSplit(clean, "doc_id", splits)
  }
}
