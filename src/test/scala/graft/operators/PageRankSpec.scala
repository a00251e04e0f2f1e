package graft.operators

import graft.SparkSpec

/** Fixed-point integer PageRank properties (q118). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed two-node graph") {
    // single edge 1-2: deg 1 each, contribution = full score
    // pr1 = 150000 + 850000*1000000 div 1e6 = 1000000 (fixpoint)
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val got = Components.pageRank(pairs, iters = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1000000L), (2L, 1L, 1000000L)))
  }

  test("star graph ranks the hub above the leaves") {
    val pairs = (2L to 6L).map(i => (1L, i)).toDF("doc_a", "doc_b")
    val got = Components.pageRank(pairs, iters = 5)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert((2L to 6L).forall(l => got(1L) > got(l)))
    // leaves are symmetric — identical scores
    assert((2L to 6L).map(got).distinct.size === 1)
  }

  test("matches a driver-side reference on a random graph") {
    val rnd = new scala.util.Random(5)
    // canonical undirected pairs (a < b, distinct) — the q21 pair shape
    val edges = (1 to 40).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val pairs = edges.toDF("doc_a", "doc_b")
    def ref(iters: Int): Map[Long, Long] = {
      val und = edges ++ edges.map(_.swap)
      val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val deg = adj.view.mapValues(_.size.toLong).toMap
      var pr = adj.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val in = adj.keys.map { v =>
          // .toSeq before mapping: keys is a Set, and mapping scores
          // over a Set would collapse EQUAL contributions
          v -> adj.filter(_._2.contains(v)).keys.toSeq.map(u => pr(u) / deg(u)).sum
        }.toMap
        pr = in.map { case (v, s) => v -> (150000L + (850000L * s) / 1000000L) }
      }
      pr
    }
    val got = Components.pageRank(pairs, iters = 4)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(got === ref(4))
  }
}
