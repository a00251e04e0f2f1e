package graft.operators

import graft.SparkSpec

/** Product-quantization properties (q121): self-encoding of codebook
  * vectors, zero ADC for the query itself, and agreement with a
  * driver-side brute-force reference.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def mkEmb(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  test("codebook vectors encode to their own id with ADC matching their cells") {
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(16)(rnd.nextFloat())))
    val got = Similarity.pqEncodeAdc(mkEmb(vecs), m = 4, kCode = 8, queryVecId = 0L)
      .orderBy($"vec_id").collect()
    // seed vector kk's subvectors are the (ms, kk) centroids: distance
    // 0 to itself, so every code of vector kk is kk
    for (kk <- 0 until 8) {
      val row = got(kk)
      for (ms <- 0 until 4)
        assert(row.getInt(1 + ms) === kk, s"seed $kk subspace $ms")
    }
    // the query IS seed 0: its cells are exact zeros => ADC 0
    assert(got(0).getLong(5) === 0L)
  }

  test("matches a driver-side brute-force reference") {
    val rnd = new scala.util.Random(21)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val (m, k) = (2, 8)
    val sub = 4
    val seeds = vecs.take(k).map(_._2.map(_.toDouble))
    def subdist(v: Seq[Float], ms: Int, kk: Int): Double = {
      var aa = 0.0; var ab = 0.0; var bb = 0.0
      for (i <- 0 until sub) {
        val a = v(ms * sub + i).toDouble
        val c = seeds(kk)(ms * sub + i)
        aa += a * a; ab += a * c; bb += c * c
      }
      aa - 2.0 * ab + bb
    }
    val expected = vecs.map { case (id, v) =>
      val codes = (0 until m).map { ms =>
        (0 until k).minBy(kk => (subdist(v, ms, kk), kk))
      }
      val adc = codes.zipWithIndex.map { case (c, ms) =>
        math.floor(1e6 * subdist(vecs.head._2, ms, c)).toLong
      }.sum
      (id, codes, adc)
    }
    val got = Similarity.pqEncodeAdc(mkEmb(vecs), m = m, kCode = k, queryVecId = 0L)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), (0 until m).map(ms => r.getInt(1 + ms)), r.getLong(1 + m)))
      .toSeq
    assert(got === expected)
  }

  test("graft_pq_encode returns null on null/degenerate arguments, never throws") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.register(spark)
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val cents = typedLit(Array.tabulate(8)(_.toDouble))
    val cases = df.select(
      call_function("graft_pq_encode", col("embedding"),
        lit(null).cast("array<double>"), lit(2), lit(2)).as("null_cents"),
      call_function("graft_pq_encode", col("embedding"), cents,
        lit(null).cast("int"), lit(2)).as("null_m"),
      call_function("graft_pq_encode", col("embedding"), cents,
        lit(0), lit(2)).as("zero_m"),
      call_function("graft_pq_encode", col("embedding"), cents,
        lit(2), lit(0)).as("zero_k"),
      call_function("graft_pq_encode", col("embedding"), cents,
        lit(3), lit(2)).as("indivisible"),
      call_function("graft_pq_encode", col("embedding"), cents,
        lit(2), lit(2)).as("valid")
    ).collect()(0)
    for (i <- 0 until 5) assert(cases.isNullAt(i), s"case $i should be null")
    assert(!cases.isNullAt(5))
  }
}
