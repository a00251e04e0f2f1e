package graft.operators

import graft.SparkSpec

/** Exact distributed percentile_disc via iterative value-domain
  * refinement (q64's scale path): agreement with a driver-side sorted
  * reference across uniform, duplicate-heavy, spike, and tiny-group
  * distributions — including forced multi-round refinement (small
  * finishRows) and stall-freeze paths.
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.25, 0.5, 0.75, 1.0)

  /** percentile_disc reference: smallest value with cume_dist >= p —
    * computed BY THE DEFINITION (scan ranks, compare k/n >= p), not by
    * ceil(p·n), so it catches the float-overshoot class (0.07·100 →
    * ceil 8 where DuckDB's rank is 7).
    */
  private def reference(vals: Seq[Double], p: Double): Double = {
    val sorted = vals.sorted
    val n = sorted.length
    val k = (1 to n).find(k => k.toDouble / n >= p).getOrElse(n)
    sorted(k - 1)
  }

  test("rank rule matches percentile_disc when p·n overshoots an integer in floats") {
    // DuckDB-verified: percentile_disc(0.07) over 1..100 returns 7,
    // while ceil(0.07 * 100) = ceil(7.000000000000001) = 8
    assert(Percentiles.discRank(0.07, 100L) == 7L)
    assert(Percentiles.discRank(0.29, 100L) == 29L)
    assert(Percentiles.discRank(0.25, 100L) == 25L)
    assert(Percentiles.discRank(1.0, 100L) == 100L)
    assert(Percentiles.discRank(0.0, 100L) == 1L)
    val got = Percentiles.exactDisc(
        (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v"),
        "g", "v", Seq(0.07))
      .collect()(0).getDouble(2)
    assert(got == 7.0, s"p=0.07 over 1..100 returned $got, expected 7")
  }

  private def check(data: Seq[(String, Double)], buckets: Int = 64,
                    finishRows: Long = 16): Unit = {
    val df = data.toDF("g", "v").repartition(7)
    val got = Percentiles.exactDisc(df, "g", "v", ps,
        buckets = buckets, finishRows = finishRows)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val byG = data.groupBy(_._1)
    for ((g, rows) <- byG; p <- ps) {
      val want = reference(rows.map(_._2), p)
      assert(got((g, p)) === want, s"group $g p=$p")
    }
    assert(got.size == byG.size * ps.length)
  }

  test("uniform continuous values across skewed group sizes") {
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(3000)(i =>
      (if (i % 10 < 7) "A" else if (i % 10 < 9) "B" else "C",
        rnd.nextDouble() * 1000 - 500))
    check(data)
  }

  test("duplicate-heavy integer grid (ties resolved like percentile_disc)") {
    val rnd = new scala.util.Random(11)
    val data = Seq.tabulate(2000)(_ =>
      ("G", (rnd.nextInt(50) + 1).toDouble))
    check(data)
  }

  test("spike distribution: 90% of rows share one value (stall-freeze path)") {
    val rnd = new scala.util.Random(13)
    val data = Seq.tabulate(2000)(i =>
      ("S", if (i % 10 < 9) 42.0 else rnd.nextDouble() * 100))
    check(data)
  }

  test("all-equal group, single-row group, and negative values") {
    val data = Seq.fill(100)(("EQ", -3.5)) ++ Seq(("ONE", 17.0)) ++
      Seq.tabulate(50)(i => ("NEG", -i.toDouble))
    check(data)
  }

  test("nulls are ignored like percentile_disc") {
    val df = (Seq.tabulate(100)(i => ("G", Some(i.toDouble))) ++
        Seq.fill(40)(("G", Option.empty[Double])))
      .toDF("g", "v").repartition(5)
    val got = Percentiles.exactDisc(df, "g", "v", Seq(0.5), buckets = 32,
        finishRows = 8)
      .collect().map(r => r.getDouble(2))
    // 100 non-null values 0..99: rank ceil(.5*100)=50 -> value 49
    assert(got.toSeq == Seq(49.0))
  }

  test("multi-spec shares scans and equals per-column runs") {
    val rnd = new scala.util.Random(23)
    val data = Seq.tabulate(1500)(i =>
      (if (i % 3 == 0) "X" else "Y", rnd.nextDouble() * 100,
        (rnd.nextInt(30) + 1).toDouble))
    val df = data.toDF("g", "a", "b").repartition(6)
    val multi = Percentiles.exactDiscMulti(df, "g",
        Seq("a" -> Seq(0.5, 0.9), "b" -> Seq(0.25)),
        buckets = 32, finishRows = 16)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    for ((g, rows) <- data.groupBy(_._1)) {
      assert(multi((g, "a", 0.5)) === reference(rows.map(_._2), 0.5))
      assert(multi((g, "a", 0.9)) === reference(rows.map(_._2), 0.9))
      assert(multi((g, "b", 0.25)) === reference(rows.map(_._3), 0.25))
    }
    assert(multi.size == 6)
  }

  test("forced deep refinement: tight cluster inside a wide range") {
    // values clustered within 1e-9 of 1e6 plus far outliers: several
    // zoom rounds before the interval resolves the cluster
    val rnd = new scala.util.Random(17)
    val data = Seq.tabulate(500)(i =>
      ("D", 1e6 + rnd.nextInt(5) * 1e-9)) ++
      Seq(("D", -1e6), ("D", 1e12))
    check(data, buckets = 16, finishRows = 4)
  }
}
