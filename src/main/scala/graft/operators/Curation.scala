package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard training-corpus curation pipeline as one call:
  * token-count gate → cluster-level near-dup removal → eval-set
  * decontamination → deterministic split assignment. Each stage is one
  * of the library's gated operators; the composition itself is gated
  * end-to-end by q76_curate_e2e (one oracle over the whole chain).
  *
  * The length gate is deliberately a bare token-count filter (one
  * narrow projection) — richer signals (stopword ratio, repetition)
  * live in [[TextAnalysis.qualityScore]]/[[TextAnalysis.repetitionStats]]
  * and callers compose them in front when they want them; the pipeline
  * must not silently impose an English-specific stopword gate on a
  * multilingual corpus (the q36 lesson).
  *
  * Scale shape: the token gate and split assignment are narrow; the
  * dedup stage is the LSH pair miner + pointer-jumping components
  * (both documented in their own operators); decontamination is one
  * semi join against the benchmark gram set, broadcast only while the
  * benchmark's word count stays under `maxBroadcastGrams` (the same
  * guarded bound as [[TextAnalysis.contaminationStats]] — an eval
  * suite with tens of millions of grams must shuffle, not OOM the
  * driver). Nothing in the chain is quadratic in the corpus.
  *
  * Cache contract: the LSH stage caches its shingle-set table — release
  * with `graft.Tables.releaseOperatorCaches` after the terminal action.
  * Like the stats operator, the broadcast guard costs one narrow
  * word-count aggregation over `bench` at CONSTRUCTION time.
  *
  * @return the curated corpus: the input columns plus `n_tokens` and
  *         `split`, containing only gate-passing, cluster-deduped,
  *         uncontaminated documents.
  */
object Curation {
  def curate(docs: DataFrame, bench: DataFrame,
             minTokens: Int = 20,
             dedupThreshold: Double = 0.5,
             contaminationNgram: Int = 3,
             splits: Seq[(String, Double)] =
               Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
             maxBroadcastGrams: Long = 2000000L): DataFrame = {
    val qdocs = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
    val pairs = TextDedup.minhashLshPairs(qdocs, dedupThreshold)
    val drop = Components.dupClusters(pairs)
      .filter(col("doc_id") =!= col("component")).select(col("doc_id"))
    val deduped = qdocs.join(drop, Seq("doc_id"), "left_anti")
    val benchGrams = TextDedup.wordShingles(bench, contaminationNgram)
      .select(col("sh")).distinct()
    val wordBound = Option(
      bench.agg(sum(size(split(col("text"), " ")))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val benchSide =
      if (wordBound <= maxBroadcastGrams) broadcast(benchGrams) else benchGrams
    val contaminated = TextDedup.wordShingles(deduped, contaminationNgram)
      .join(benchSide, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.assignSplit(clean, "doc_id", splits)
  }

  /** UNIFIED multimodal ingest admission — the q150 (text) and q161
    * (media) per-batch verdicts composed into ONE chain over docs
    * carrying both a text and a media `blob` column: the delta batch
    * near-dup-probes the standing MinHash signature index, text
    * survivors' media signatures probe the standing 64-bit hash index
    * (capped banded join, index-side hot cap), media survivors are
    * decontaminated against the benchmark windows, and every delta
    * doc gets one verdict with a REASON —
    * `dup_text > dup_media > contaminated > kept`.
    *
    * `mediaSig` is the signature extractor column (e.g.
    * `graft_ahash(blob)` for images, `graft_aenv`/`graft_vhash` for
    * audio/video); docs whose signature is null (no media, or
    * undecodable) simply skip the media stage. Both standing indexes
    * are read-only state outside the batch — only the batch is ever
    * shingled/hashed, so the chain is O(batch + collisions) and each
    * doc's verdict is a pure function of (doc, standing state): any
    * batching of the snapshot yields the union of the batch verdicts
    * (the StreamingOpsSpec parity pin for the per-batch flavor).
    */
  def multimodalIngestVerdict(delta: DataFrame,
                              mediaSig: org.apache.spark.sql.Column,
                              sigIndexPath: String, hashIndexPath: String,
                              bench: DataFrame,
                              threshold: Double = 0.8, windowChars: Int = 40,
                              maxHamming: Int = 3,
                              maxBandFreq: Option[Long] = None): DataFrame = {
    // cache(): the verdict references the delta through FOUR lineages
    // (text probe, text-survivor anti-join, decontam, final join) and
    // the delta's own lineage is expensive — a media-signature kernel
    // pass over two snapshots plus the full-outer diff — so without a
    // barrier each stage would recompute it (measured: the uncached
    // q166 chain cost ~10x its cached cost). Same contract as
    // minhashLshPairs: callers release via
    // graft.Tables.releaseOperatorCaches after the terminal action.
    val d = delta.cache()
    // each stage's doc_id set is also cached: the sets are tiny, but
    // their LINEAGES are the expensive probes (LSH band join, banded
    // hash join, window decontam) and each set is referenced by both
    // the next stage's anti-join and the final verdict join — without
    // the barrier every probe re-runs 2-4x
    val textDups = TextDedup
      .nearDupsAgainstIndex(d.select(col("doc_id"), col("text")),
        sigIndexPath, threshold)
      .select(col("doc_id")).distinct().cache()
    val tSurv = d.join(textDups, Seq("doc_id"), "left_anti")
    val mediaSigs = tSurv.select(col("doc_id"), mediaSig.as("simhash"))
      .filter(col("simhash").isNotNull)
    val mediaDups = TextDedup
      .nearDupsAgainstHashIndex(mediaSigs, hashIndexPath, maxHamming,
        maxBandFreq)
      .select(col("doc_id")).distinct().cache()
    val mSurv = tSurv.join(mediaDups, Seq("doc_id"), "left_anti")
    val contaminated = TextDedup
      .substringMatches(mSurv.select(col("doc_id"), col("text")), bench,
        windowChars)
      .select(col("doc_id")).distinct()
    d
      .join(textDups.withColumn("is_tdup", lit(true)), Seq("doc_id"), "left")
      .join(mediaDups.withColumn("is_mdup", lit(true)), Seq("doc_id"), "left")
      .join(contaminated.withColumn("is_cont", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_tdup"), lit("dup_text"))
          .when(col("is_mdup"), lit("dup_media"))
          .when(col("is_cont"), lit("contaminated"))
          .otherwise(lit("kept")).as("status"),
        length(col("text")).cast("long").as("n_chars"))
  }
}
