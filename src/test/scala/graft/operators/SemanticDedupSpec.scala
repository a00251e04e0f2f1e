package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the seed-initialised clustering curation operators:
  * SemDeDup-shaped dedup ([[Similarity.semanticDedup]]) and
  * prototypicality ranking ([[Similarity.prototypicality]]). The
  * oracle-gated configs (q112/q113) use iters = 0 so DuckDB can replay
  * the geometry; these rows cover the Lloyd-refined side and the
  * decision semantics on a planted two-blob fixture.
  */
class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  // two well-separated blobs (cross-blob cosine ~0.2, within-blob
  // member-to-anchor ~0.99) plus one near-copy per blob (cosine to its
  // original ~1 - 1e-8, far above any non-copy pair's ~0.988)
  private val fixtureRows = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // blob A anchor (seed)
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // blob B anchor (seed)
    (2L, Array(0.9f, 0.1f, 0.1f, 0.0f)), // A member
    (3L, Array(0.1f, 0.9f, 0.0f, 0.1f)), // B member
    (4L, Array(0.9f, 0.1f, 0.1001f, 0.0f)), // near-copy of 2
    (5L, Array(0.1f, 0.9f, 0.0f, 0.1001f)) // near-copy of 3
  )

  private def blobs() = fixtureRows.toDF("vec_id", "embedding")

  test("semanticDedup drops planted near-copies with their witness and keeps the rest") {
    val out = Similarity.semanticDedup(blobs(), seedIds = Seq(0L, 1L),
        threshold = 0.999, iters = 0)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    // anchors and first members survive; the near-copies fold onto them
    assert(out(0L)._2 && out(1L)._2 && out(2L)._2 && out(3L)._2)
    assert(!out(4L)._2 && out(4L)._3.contains(2L))
    assert(!out(5L)._2 && out(5L)._3.contains(3L))
    // blob membership drove the comparison sets
    assert(out(2L)._1 == out(4L)._1 && out(3L)._1 == out(5L)._1)
    assert(out(2L)._1 != out(3L)._1)
  }

  test("lloyd refinement moves seed centroids to the blob means") {
    val vecs = blobs().select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val init = Seq(
      0 -> Seq(1.0, 0.0, 0.0, 0.0),
      1 -> Seq(0.0, 1.0, 0.0, 0.0))
    val refined = IvfIndex.lloyd(vecs, init, iters = 2)
    // expected means over the FLOAT-cast member values (blob A = rows
    // 0,2,4; blob B = rows 1,3,5); the blobs are separated, so round 1
    // converges and round 2 is a fixed point
    def meanOf(ids: Set[Long]): Seq[Double] = {
      val vs = fixtureRows.filter(r => ids(r._1)).map(_._2.map(_.toDouble))
      (0 until 4).map(d => vs.map(_(d)).sum / vs.size)
    }
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    assert(close(refined(0)._2, meanOf(Set(0L, 2L, 4L))),
      s"centroid 0 = ${refined(0)._2}")
    assert(close(refined(1)._2, meanOf(Set(1L, 3L, 5L))),
      s"centroid 1 = ${refined(1)._2}")
  }

  test("semanticDedup with refined centroids still resolves the planted copies") {
    val out = Similarity.semanticDedup(blobs(), seedIds = Seq(0L, 1L),
        threshold = 0.999, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.count(!_._2) == 2 && !out(4L) && !out(5L))
  }

  test("prototypicality ranks the centroid-nearest vector first and bounds ranks") {
    val out = Similarity.prototypicality(blobs(), seedIds = Seq(0L, 1L),
        iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getInt(3), r.getLong(4)))
    // every cluster: ranks are 1..n with no gaps, cluster_n consistent
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.size).toSeq)
      assert(rows.forall(_._5 == rows.size))
    }
    // rank 1 carries the cluster's max cosine (compare on the rounded
    // column — rounding is monotone, so the unrounded argmax can never
    // have a smaller rounded value than any other member)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.find(_._4 == 1).get._3 >= rows.map(_._3).max - 1e-12)
    }
  }

  test("semanticDedup maxClusterN keeps every member of the planted giant cluster") {
    // the degenerate geometry the cap guards against: 40 near-clones
    // all land on blob A's centroid (one cell = ~the corpus, the
    // quadratic shape), blob B keeps 2 members with a planted
    // near-copy pair. With the cap the giant cell is excluded from
    // pair mining — all its members kept, no witness — while the
    // small cell still dedups.
    val giant = (10L until 50L).map(i =>
      (i, Array(1.0f, 0.0f, (i % 7) * 1e-4f, 0.0f)))
    val small = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f, 0.1f)),
      (5L, Array(0.1f, 0.9f, 0.0f, 0.1001f))) // near-copy of 3
    val emb = (small ++ giant).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, seedIds = Seq(0L, 1L),
        threshold = 0.999, iters = 0, maxClusterN = Some(10L))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    // every row still present with its assignment
    assert(out.keySet == (small ++ giant).map(_._1).toSet)
    // the giant cluster (blob A: 0 + the 40 clones) is capped out:
    // all kept despite being mutual near-copies
    val aCluster = out(0L)._1
    val aMembers = out.filter(_._2._1 == aCluster)
    assert(aMembers.size == 41)
    assert(aMembers.values.forall(v => v._2 && v._3.isEmpty))
    // the small cluster still dedups: 5 folds onto 3
    assert(out(1L)._2 && out(3L)._2)
    assert(!out(5L)._2 && out(5L)._3.contains(3L))
    // uncapped, the same fixture mines the giant cell's pairs
    val un = Similarity.semanticDedup(emb, seedIds = Seq(0L, 1L),
        threshold = 0.999, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(un.count(!_._2) > 1)
  }

  test("semanticDedupAgainstIndex maxListN skips the planted hot list and flags its batch") {
    // the ingest-probe flavor of the giant-cluster guard (r17 verdict
    // #1): 40 near-clones make list 0 of the standing index hot; the
    // batch holds a near-copy landing in the hot list (a REAL dup the
    // cap knowingly forgoes) and one landing in the cold list. Capped:
    // the hot list contributes no pairs — its batch vector is fresh
    // with hot = true and the hot DIRECTORY never reaches the payload
    // scan; the cold list dedups exactly as uncapped.
    val history = ((10L until 50L).map(i =>
      (i, Array(1.0f, 0.0f, (i % 7) * 1e-4f, 0.0f))) ++ Seq(
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f, 0.1f))))
      .toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0))
    val idx = tempDir("graft_semdedup_hotlist")
    IvfIndex.writeIndex(history, cents, idx)
    val batch = Seq(
      (100L, Array(1.0f, 0.0f, 1e-4f, 0.0f)),   // near-copy of 17 (hot list)
      (101L, Array(0.1f, 0.9f, 0.0f, 0.1001f))) // near-copy of 3 (cold list)
      .toDF("vec_id", "embedding")
    val capped = IvfIndex.semanticDedupAgainstIndex(batch, idx,
      threshold = 0.999, maxListN = Some(10L))
    assert(capped.columns.toSeq ==
      Seq("vec_id", "list_id", "n_dups", "dup_of", "hot"))
    val got = capped.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4)))).toMap
    assert(got(100L) == ((0L, None, true)), got.toString) // hot: fresh + flagged
    assert(got(101L)._1 > 0L && got(101L)._2.contains(3L) && !got(101L)._3)
    // the hot directory is excluded by PARTITION pruning, not a
    // post-scan filter: the payload scan's partition filters carry a
    // NOT-IN on list_id
    val plan = capped.queryExecution.executedPlan.toString
    // (a single hot list prints as `NOT (list_id#N = 0)`, several as
    // `NOT list_id#N IN (...)` — match either)
    assert("""PartitionFilters: \[[^\]]*NOT \(?list_id#\d+""".r
      .findFirstIn(plan).isDefined, plan)
    // uncapped: same call, no hot column, the hot-list dup IS found
    val un = IvfIndex.semanticDedupAgainstIndex(batch, idx, threshold = 0.999)
    assert(un.columns.toSeq == Seq("vec_id", "list_id", "n_dups", "dup_of"))
    val unGot = un.collect().map(r => r.getLong(0) ->
      Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(unGot(100L).nonEmpty && unGot(101L).contains(3L))
    graft.Tables.releaseTrackedCaches(spark)
  }

  test("versioned IVF lifecycle: retrain builds v1 while v0 stays probeable, then the flip lands") {
    // the standing semantic index's drift response (r17 verdict #4):
    // v0 at geometry A (both blobs on centroid 0 — a deliberately bad
    // single-sided geometry), retrain around geometry B (the two blob
    // anchors), flip; the probe resolves the pointer, so the SAME call
    // sees the rebalanced lists, and the old version dir remains
    // readable for in-flight probes.
    val idx = tempDir("graft_ivf_lifecycle")
    val history = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.1f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f, 0.1f))).toDF("vec_id", "embedding")
    val geomA = Seq(0 -> Seq(0.5, 0.5, 0.0, 0.0)) // one cell swallows all
    val geomB = Seq(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0))
    IvfIndex.writeVersionedIndex(history, geomA, idx)
    assert(IndexLayout.currentVersion(spark, idx) == 0)
    val batch = Seq((10L, Array(0.9f, 0.1f, 0.1001f, 0.0f)))
      .toDF("vec_id", "embedding")
    def probe() = IvfIndex.semanticDedupAgainstIndex(batch, idx,
      threshold = 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    val onA = probe()
    assert(onA == Seq((10L, 0L, Some(2L)))) // everything in cell 0
    val v1 = IvfIndex.retrainIndexVersionWith(spark, idx, geomB)
    assert(v1 == 1 && IndexLayout.currentVersion(spark, idx) == 1)
    // the probe now resolves v1: blob A's cell no longer holds blob B
    val onB = probe()
    assert(onB == Seq((10L, 0L, Some(2L))))
    // and the rebalance is observable in the lists: v1 splits the
    // corpus 2/2 where v0 held all 4 in one list
    val v0Sizes = spark.read.parquet(s"$idx/v0/lists")
      .groupBy("list_id").count().collect().map(_.getLong(1)).toSeq
    val v1Sizes = spark.read.parquet(s"$idx/v1/lists")
      .groupBy("list_id").count().collect().map(_.getLong(1)).sorted.toSeq
    assert(v0Sizes == Seq(4L) && v1Sizes == Seq(2L, 2L))
    // retrain-with-TRAINED-centroids path: one more version, corpus
    // carried forward intact
    val v2 = IvfIndex.retrainIndexVersion(spark, idx, nLists = 2, iters = 1)
    assert(v2 == 2 && IndexLayout.currentVersion(spark, idx) == 2)
    assert(spark.read.parquet(s"$idx/v2/lists").count() == 4L)
    // retention: old versions drop once past the read horizon; the
    // live version is protected
    intercept[IllegalArgumentException](
      IndexLayout.pruneVersionsBelow(spark, idx, 3))
    assert(IndexLayout.pruneVersionsBelow(spark, idx, 2) == Seq(0, 1))
    assert(!new java.io.File(idx, "v0").exists())
    assert(!new java.io.File(idx, "v1").exists())
    assert(probe().nonEmpty) // the live version still serves
    graft.Tables.releaseTrackedCaches(spark)
  }

  test("versioned IVF compaction: fragmented appends collapse to one file per list, probe unchanged") {
    // the no-retrain half of the lifecycle: micro-batch appends land
    // ~one part file per touched list each, so a long-running ingest
    // turns the probe file-open-bound; compaction rewrites the rows
    // clustered by their EXISTING list_id into the next version (no
    // argmin recompute — the geometry is untouched) and flips.
    val idx = tempDir("graft_ivf_compact")
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0))
    IvfIndex.writeVersionedIndex(
      Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
          (1L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      cents, idx)
    // three appends, each touching both lists → each list dir fragments
    for (b <- 1 to 3)
      IvfIndex.appendToIndex(
        Seq((10L * b, Array(0.9f, 0.1f, b * 1e-4f, 0.0f)),
            (10L * b + 1, Array(0.1f, 0.9f, 0.0f, b * 1e-4f)))
          .toDF("vec_id", "embedding"), idx)
    def partFiles(dir: String) = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles(s"$idx/v0/lists/list_id=0") >= 4)
    val batch = Seq((100L, Array(0.9f, 0.1f, 1e-4f, 0.0f)))
      .toDF("vec_id", "embedding")
    def probe() = IvfIndex.semanticDedupAgainstIndex(batch, idx,
        threshold = 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.get(3))))
      .toSeq
    val before = probe()
    assert(IvfIndex.compactIndexVersion(spark, idx) == 1)
    assert(IndexLayout.currentVersion(spark, idx) == 1)
    // defragmented: one file per list, all 8 rows carried, centroids
    // copied bit-identically, probe result unchanged through the flip
    assert(partFiles(s"$idx/v1/lists/list_id=0") == 1)
    assert(partFiles(s"$idx/v1/lists/list_id=1") == 1)
    assert(spark.read.parquet(s"$idx/v1/lists").count() == 8L)
    assert(spark.read.parquet(s"$idx/v1/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
      == cents.map { case (c, v) => (c, v) })
    assert(probe() == before)
    graft.Tables.releaseTrackedCaches(spark)
  }

  test("sampled retrain: Lloyd trains on the deterministic sample, re-assignment covers everything") {
    // the 100 TB knob: each Lloyd iteration is a full pass over the
    // training set, so retrain trains on a hash-sampled fraction —
    // replayable, no RNG — while the new version still re-assigns and
    // carries EVERY stored vector
    val idx = tempDir("graft_ivf_retrain_sample")
    val corpus = (0L until 40L).map(i =>
      if (i % 2 == 0) (i, Array(1.0f, (i % 5) * 0.01f, 0.0f, 0.0f))
      else (i, Array(0.0f, 1.0f, (i % 5) * 0.01f, 0.0f)))
      .toDF("vec_id", "embedding")
    IvfIndex.writeVersionedIndex(corpus,
      Seq(0 -> Seq(0.5, 0.5, 0.0, 0.0)), idx)
    val v1 = IvfIndex.retrainIndexVersion(spark, idx, nLists = 2,
      iters = 2, sampleFraction = 0.5)
    assert(v1 == 1 && IndexLayout.currentVersion(spark, idx) == 1)
    // every vector carried, and the trained geometry actually split
    // the one-cell v0 into two populated lists
    assert(spark.read.parquet(s"$idx/v1/lists").count() == 40L)
    assert(spark.read.parquet(s"$idx/v1/lists")
      .select("list_id").distinct().count() == 2L)
    // replayable: the same sampled retrain from the same version
    // produces identical assignments (no RNG anywhere)
    val again = tempDir("graft_ivf_retrain_sample2")
    IvfIndex.writeVersionedIndex(corpus,
      Seq(0 -> Seq(0.5, 0.5, 0.0, 0.0)), again)
    IvfIndex.retrainIndexVersion(spark, again, nLists = 2,
      iters = 2, sampleFraction = 0.5)
    val a = spark.read.parquet(s"$idx/v1/lists")
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = spark.read.parquet(s"$again/v1/lists")
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      IvfIndex.retrainIndexVersion(spark, idx, sampleFraction = 0.0))
  }

  test("listSkewStats/needsRetrain: the measurement half of the retrain decision") {
    val idx = tempDir("graft_ivf_skew")
    // two EQUAL 20/20 blobs, but a degenerate initial geometry whose
    // centroid 0 captures everything (centroid 1 points away from both)
    val corpus = (0L until 40L).map(i =>
      if (i % 2 == 0) (i, Array(1.0f, (i % 5) * 0.01f, 0.0f, 0.0f))
      else (i, Array(0.0f, 1.0f, (i % 5) * 0.01f, 0.0f)))
      .toDF("vec_id", "embedding")
    IvfIndex.writeVersionedIndex(corpus,
      Seq(0 -> Seq(0.5, 0.5, 0.0, 0.0), 1 -> Seq(-1.0, -1.0, 0.0, 0.0)), idx)
    val stats = IvfIndex.listSkewStats(spark, idx).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stats(0)._1 == 40L && stats(0)._2 == 1.0)
    assert(IvfIndex.needsRetrain(spark, idx, maxTopShare = 0.25))
    // re-center on the blob anchors: 20/20, the SAME decision call flips
    IvfIndex.retrainIndexVersionWith(spark, idx,
      Seq(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0)))
    val after = IvfIndex.listSkewStats(spark, idx).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == Map(0 -> 20L, 1 -> 20L))
    assert(!IvfIndex.needsRetrain(spark, idx, maxTopShare = 0.6))
  }

  test("prototypicality maxClusterN excludes the planted giant cluster") {
    // a degenerate corpus: 40 near-clones collapse onto blob A's
    // centroid while blob B keeps 2 members — with a cap below 40
    // only blob B's rows survive, still ranked 1..n (the
    // degenerate-centroid guard for clone-heavy corpora)
    val giant = (10L until 50L).map(i =>
      (i, Array(1.0f, 0.0f, (i % 7) * 1e-4f, 0.0f)))
    val small = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f, 0.1f)))
    val emb = (small ++ giant).toDF("vec_id", "embedding")
    val capped = Similarity.prototypicality(emb, seedIds = Seq(0L, 1L),
        iters = 0, maxClusterN = Some(10L))
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(4)))
    // only blob B (vec 1 and 3) survives the cap
    assert(capped.map(_._1).toSet == Set(1L, 3L), capped.toSeq.toString)
    assert(capped.map(_._2).sorted.toSeq == Seq(1, 2))
    assert(capped.forall(_._3 == 2L))
  }
}
