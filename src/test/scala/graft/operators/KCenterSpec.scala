package graft.operators

import graft.SparkSpec

/** Greedy k-center selection properties (q117): agreement with a
  * driver-side brute-force reference, seed handling, and the
  * farthest-point invariant.
  */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def mkEmb(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  private def brute(vecs: Seq[(Long, Seq[Float])], k: Int, start: Long) = {
    val m = vecs.toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double = {
      val aa = a.map(x => x.toDouble * x).sum
      val bb = b.map(x => x.toDouble * x).sum
      val ab = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      aa - 2.0 * ab + bb
    }
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]((1, start, 0.0))
    for (r <- 2 to k) {
      val sel = picks.map(_._2).toSet
      val best = m.keys.filterNot(sel).toSeq.map { id =>
        val dmin = sel.map(s => d2(m(id), m(s))).min
        (id, BigDecimal(dmin).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.minBy { case (id, d) => (-d, id) }
      picks += ((r, best._1, best._2))
    }
    picks.toSeq
  }

  test("matches brute-force greedy selection on random vectors") {
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val got = Similarity.kCenterSelect(mkEmb(vecs), k = 6, startId = 0L)
      .orderBy($"round").as[(Int, Long, Double)].collect().toSeq
    assert(got === brute(vecs, 6, 0L))
  }

  test("round 1 is the seed with distance 0; rounds are distinct points") {
    val vecs = (0L until 10L).map(i => (i, Seq.fill(4)(i.toFloat)))
    val got = Similarity.kCenterSelect(mkEmb(vecs), k = 4, startId = 3L)
      .orderBy($"round").as[(Int, Long, Double)].collect().toSeq
    assert(got.head === ((1, 3L, 0.0)))
    assert(got.map(_._2).distinct.size === 4)
  }

  test("on a line, farthest-point-first picks the extremes first") {
    // points at x = 0, 1, 2, ..., 9 on a line, seed at 0:
    // round 2 must pick 9 (farthest), round 3 the midpoint region
    val vecs = (0L until 10L).map(i => (i, Seq(i.toFloat, 0f)))
    val got = Similarity.kCenterSelect(mkEmb(vecs), k = 3, startId = 0L)
      .orderBy($"round").as[(Int, Long, Double)].collect().toSeq
    assert(got(1)._2 === 9L)
    assert(got(1)._3 === 81.0)
    // min-dist to {0, 9} is maximized at x=4 or x=5 (d2=16 vs 16);
    // tie-break picks the smaller id
    assert(got(2)._2 === 4L)
    assert(got(2)._3 === 16.0)
  }
}
