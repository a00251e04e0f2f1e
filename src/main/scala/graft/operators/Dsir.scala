package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for training-data selection
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw-corpus document by how target-like its
  * hashed n-gram features are, then keep the most target-like slice.
  * The stage every "give me more data that looks like this eval/domain
  * set" pipeline runs between crawling and tokenization.
  *
  * The scale lever is the HASHING TRICK: word bigrams are hashed into a
  * fixed number of `buckets` (a power of two, default 2^16), so both
  * feature-count tables are `buckets` rows REGARDLESS of corpus size —
  * a 100 TB raw corpus and a 1 GB target produce the same bounded,
  * broadcastable model. The whole operator is then: one narrow
  * codegen'd gram pass per side (`graft_grams`), two bucket-keyed
  * partial+final counts (bounded output), one broadcast join of the
  * raw gram stream against the bucket model, one integer groupBy(doc).
  * Nothing shuffles more than (doc count) rows.
  *
  * Weight currency is the same log-free integer family as
  * [[NgramLm]]/BM25: per gram occurrence
  * `q = (1e6 · (ct+1)) div (cr+1)` from the EXACT bucket counts (the
  * add-one-smoothed target/raw likelihood ratio, floor-quantized with
  * pure integer division — no float in the loop at all), and the
  * per-document importance is the order-free integer sum of q. Real
  * DSIR sums log-ratios; the quantized ratio sum is the same signal in
  * a currency two engines reproduce bit-for-bit (log/exp would differ
  * per libm), and thresholding/ranking on it selects the same
  * documents. Bucket = md5-slice of the gram reduced mod `buckets` —
  * the engine-portable hash family of [[Bloom]]/[[Sampling]], which is
  * what lets the oracle rebuild the identical feature tables,
  * collisions included (the q95/q96 gating idea).
  *
  * Overflow bound: `1e6 · (ct+1)` must stay below 2^63 ⇒ per-bucket
  * target counts up to ~9·10^12 — beyond any real eval/domain set by
  * orders of magnitude.
  */
object Dsir {

  /** Bucket id in [0, buckets) for a gram column — md5 hex slice,
    * exactly reproducible in the oracle via [[Bloom.positionDuck]]'s
    * spelling.
    */
  def gramBucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram.cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Per-document DSIR importance over the raw corpus: `n_grams`, the
    * integer `importance` sum, and the truncating per-gram mean.
    * Documents with fewer than two tokens drop out (no features), like
    * [[NgramLm.scoreDocs]].
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        id: String = "doc_id", text: String = "text",
                        buckets: Int = 65536): DataFrame = {
    require(buckets >= 64 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 64, got $buckets")
    // ONE gram+hash pass over the raw corpus: pre-aggregate to
    // (doc, bucket, cnt) — map-side combinable, ≤ min(grams, docs ×
    // buckets) rows — and derive BOTH the raw count table and the
    // per-doc weights from it. The previous shape evaluated the
    // bigram Generate + md5 bucket hash twice (once for the model,
    // once for the weights) and joined the model against every gram
    // occurrence instead of every (doc, bucket) group. Weights are
    // unchanged integers: importance = Σ_grams q = Σ_buckets cnt·q,
    // n_grams = Σ cnt, mean = the same truncating div.
    // Cache contract: released by callers via
    // graft.Tables.releaseOperatorCaches, like every operator cache.
    graft.functions.TextExpressions.register(raw.sparkSession)
    // fused bigram+md5-prefix kernel (graft_gram_hashes = the
    // conv(substring(md5(g),1,8),16,10) arithmetic of [[gramBucket]]
    // without the gram-string and hex-string intermediates)
    def bucketed(df: DataFrame, idc: String) = df
      .select(col(idc), explode(call_function("graft_gram_hashes",
        col(text), lit(2), lit(8))).as("hv"))
      .select(col(idc), (col("hv") % buckets).as("bucket"))
    val perDoc = graft.Tables.trackOperatorCache(
      bucketed(raw, id)
        .groupBy(col(id), col("bucket")).agg(count(lit(1)).as("cnt"))
        .cache())
    // the raw-side count table: every bucket a raw gram can hit is
    // present by construction, so the model join below is inner
    val rb = perDoc.groupBy("bucket").agg(sum(col("cnt")).as("cr"))
    val tb = bucketed(target.withColumn("_dsir_id", lit(0L)), "_dsir_id")
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val model = rb.join(tb, Seq("bucket"), "left")
      .select(col("bucket"), col("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    perDoc
      .join(broadcast(model), Seq("bucket"))
      .withColumn("q", expr("(1000000 * (ct + 1)) div (cr + 1)"))
      .groupBy(col(id))
      .agg(sum(col("cnt")).as("n_grams"),
        sum(col("cnt") * col("q")).as("importance"),
        expr("sum(cnt * q) div sum(cnt)").as("imp_mean"))
  }
}
