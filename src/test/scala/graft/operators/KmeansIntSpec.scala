package graft.operators

import graft.SparkSpec

/** Integer-exact Lloyd rounds (q148): planted geometry, tie-break,
  * empty-cluster fallback, and the rounds = 0 Voronoi degenerate.
  */
class KmeansIntSpec extends SparkSpec {
  import spark.implicits._

  // three tight planted groups; seeds (ids 0, 1, 2) one per group
  private def planted = Seq(
    (0L, Seq(100f, 0f, 0f, 0f)), (3L, Seq(98f, 2f, 0f, 0f)),
    (4L, Seq(97f, 0f, 3f, 0f)),
    (1L, Seq(0f, 100f, 0f, 0f)), (5L, Seq(0f, 96f, 0f, 4f)),
    (2L, Seq(0f, 0f, 100f, 0f)), (6L, Seq(2f, 0f, 99f, 0f))
  ).toDF("vec_id", "embedding")

  test("planted groups converge to their own clusters with small d2") {
    val byId = Similarity.kmeansIntRounds(planted, k = 3, rounds = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(0L)._1 == 0L && byId(3L)._1 == 0L && byId(4L)._1 == 0L)
    assert(byId(1L)._1 == 1L && byId(5L)._1 == 1L)
    assert(byId(2L)._1 == 2L && byId(6L)._1 == 2L)
    // within-group distances are far below cross-group (~2*127^2)
    assert(byId.values.forall(_._2 < 2000L))
  }

  test("rounds = 0 is the pure Voronoi assignment on the seeds") {
    val v0 = Similarity.kmeansIntRounds(planted, k = 3, rounds = 0)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // seeds map to themselves at d2 = 0 under their own geometry
    assert(v0(0L) == 0L && v0(1L) == 1L && v0(2L) == 2L)
  }

  test("identical seeds: ties to the smaller cid; an emptied cluster keeps its centroid and can win points back") {
    val df = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(10f, 0f)),
      (2L, Seq(9f, 1f)), (3L, Seq(10f, 1f))
    ).toDF("vec_id", "embedding")
    // quantized: ids 0/1 -> (127, 0); 2 -> (127, 14); 3 -> (127, 13).
    // Round 1: both centroids are (127, 0), every point ties -> cid 0;
    // cluster 1 empties and keeps (127, 0) while cluster 0 moves to
    // (127, floor(27/4)) = (127, 6). Round 2: the twin seeds are now
    // CLOSER to the kept centroid (d2 0 vs 36) and flow back to cid 1
    // — the fallback is live geometry, not dead state — and the
    // recompute splits the centroids to (127, 13) / (127, 0) before
    // the final assignment.
    val out = Similarity.kmeansIntRounds(df, k = 2, rounds = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L) == ((1L, 0L)) && out(1L) == ((1L, 0L)))
    assert(out(2L) == ((0L, 1L)) && out(3L) == ((0L, 0L)))
  }
}
