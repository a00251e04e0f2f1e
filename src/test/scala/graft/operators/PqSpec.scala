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

  test("graft_rotate preserves norms/dots to 1 ulp and inverts exactly in reverse") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorExpressions.register(spark)
    val emb = graft.Tables.load(spark, sf, "embeddings").limit(50)
    val pairs = Similarity.givensPairs(64, 16)
    val flat = pairs.flatMap(p => Seq(p._1, p._2))
    val rot = emb.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v0"),
      call_function("graft_rotate", $"embedding",
        typedLit(flat), lit(0.6), lit(0.8)).as("v1"))
    // norm preservation: each 3-4-5 rotation scales ||v||² by
    // (0.6² + 0.8²) ≈ 1 to within one ulp per step
    val drift = rot.select(
        abs(call_function("graft_dot", $"v1", $"v1") /
          call_function("graft_dot", $"v0", $"v0") - 1.0).as("d"))
      .agg(max($"d")).collect()(0).getDouble(0)
    assert(drift < 1e-12, s"norm drift $drift")
    // inverse chain (reversed pairs, s negated) restores the input
    val invFlat = pairs.reverse.flatMap(p => Seq(p._1, p._2))
    val restored = rot.select($"vec_id", $"v0",
      call_function("graft_rotate", $"v1",
        typedLit(invFlat), lit(0.6), lit(-0.8)).as("v2"))
    val maxErr = restored
      .select(aggregate(zip_with($"v0", $"v2", (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("e"))
      .agg(max($"e")).collect()(0).getDouble(0)
    assert(maxErr < 1e-9, s"inverse restore error $maxErr")
    // degenerate pairs and out-of-range indices are null, never throw
    val bad = emb.select(call_function("graft_rotate", $"embedding",
      typedLit(Seq(3, 3)), lit(0.6), lit(0.8)).as("r")).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("rotated PQ keeps the payload shape and is deterministic") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val a = Similarity.rotatedPqAdc(emb, rounds = 8, m = 8, kCode = 16)
      .orderBy(org.apache.spark.sql.functions.col("vec_id")).collect().toSeq
    val b = Similarity.rotatedPqAdc(emb, rounds = 8, m = 8, kCode = 16)
      .orderBy(org.apache.spark.sql.functions.col("vec_id")).collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.head.schema.fieldNames.toSeq ==
      Seq("vec_id") ++ (0 until 8).map(i => s"c$i") :+ "adc")
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
