package graft.operators

import graft.SparkSpec

/** The operator-cache contract (TextDedup scaladoc): caching operators
  * leave nothing in the SQL cache once the caller runs its terminal
  * action and releases, and the non-caching operators never touch the
  * cache at all.
  */
class CacheHygieneSpec extends SparkSpec {

  private def cacheIsEmpty: Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  // queries whose operators cache() an intermediate per the contract
  private val cachingQueries =
    Seq("q21_minhash_lsh", "q22_ngram_jaccard", "q28_dedup_apply",
      "q36_pipeline_e2e", "q75_dup_clusters", "q48_containment",
      "q57_cluster_dedup_apply", "q59_cross_source_dup", "q76_curate_e2e",
      "q77_incremental_dedup")

  for (name <- cachingQueries)
    test(s"$name leaves an empty SQL cache after release") {
      assert(graft.SparkEntry.queries(name)(spark, sf).count() >= 0)
      graft.Tables.releaseOperatorCaches(spark)
      assert(cacheIsEmpty)
    }

  test("simhash and vector near-dup mining never populate the SQL cache") {
    for (name <- Seq("q34_simhash_pairs", "q31_vec_near_dup"))  {
      assert(graft.SparkEntry.queries(name)(spark, sf).count() >= 0)
      assert(cacheIsEmpty, s"$name cached without a contract")
    }
  }
}
