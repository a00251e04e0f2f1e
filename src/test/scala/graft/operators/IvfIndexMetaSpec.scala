package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The indexed-vector-count meta stamp (r18 verdict directive 6):
  * `writeIndex` stamps the tree's row count into its meta, appends
  * maintain it with one O(batch) count (never a recount of the standing
  * tree), and `indexedVectorCount` reads it with no Spark job — with a
  * footer-only recount as the pre-stamp fallback. q179's hot-cell cap
  * (history/4) derives from this stamp instead of counting the corpus
  * per probe.
  */
class IvfIndexMetaSpec extends SparkSpec {
  import spark.implicits._

  private def emb(from: Long, until: Long) =
    spark.range(from, until).select($"id".as("vec_id"),
      array($"id".cast("double"), lit(1.0)).as("embedding"))

  private val cents = Seq((0, Seq(0.0, 1.0)), (1, Seq(100.0, 1.0)))

  test("build stamps the count, append maintains it, fallback recounts") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_meta_").toString
    val path = s"$dir/idx"
    IvfIndex.writeIndex(emb(0, 40), cents, path)
    assert(IvfIndex.indexedVectorCount(spark, path) == 40L)
    IvfIndex.appendToIndex(emb(40, 55), path)
    assert(IvfIndex.indexedVectorCount(spark, path) == 55L)
    // pre-stamp tree: delete the meta — the reader must recount
    val meta = new java.io.File(path, "_graft_index_meta.json")
    assert(meta.exists())
    assert(meta.delete())
    assert(IvfIndex.indexedVectorCount(spark, path) == 55L)
    // an append to a pre-stamp tree restamps it durably
    IvfIndex.appendToIndex(emb(55, 60), path)
    assert(meta.exists())
    assert(IvfIndex.indexedVectorCount(spark, path) == 60L)
  }

  test("retrain and compact carry the stamp into the new version") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_meta_v_").toString
    val path = s"$dir/idx"
    IvfIndex.writeVersionedIndex(emb(0, 30), cents, path)
    assert(IvfIndex.indexedVectorCount(spark, path) == 30L)
    IvfIndex.retrainIndexVersionWith(spark, path, cents)
    assert(IvfIndex.indexedVectorCount(spark, path) == 30L)
    IvfIndex.compactIndexVersion(spark, path)
    assert(IvfIndex.indexedVectorCount(spark, path) == 30L)
  }
}
