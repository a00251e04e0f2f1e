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
