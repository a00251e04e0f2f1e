package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The ±1 JL projection must be deterministic, concentrate pairwise
  * squared distances per the JL guarantee, and feed the existing ANN
  * stack as a drop-in reduced-dimension table.
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private def projected(outDim: Int): Map[Long, Array[Double]] =
    Similarity.randomProject(emb, outDim)
      .groupBy($"vec_id")
      .agg(map_from_entries(collect_list(struct($"out_dim", $"p"))).as("m"))
      .collect()
      .map(r => r.getLong(0) -> {
        val m = r.getMap[Int, Double](1)
        Array.tabulate(outDim)(m(_))
      }).toMap

  test("projection is deterministic across invocations") {
    val a = Similarity.randomProject(emb, 8).orderBy($"vec_id", $"out_dim")
      .collect().toSeq
    val b = Similarity.randomProject(emb, 8).orderBy($"vec_id", $"out_dim")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("squared distances concentrate around the original (JL guarantee)") {
    val orig = emb.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = projected(16)
    // E[(p_a[j] - p_b[j])^2] = ||a-b||^2 for ±1 rows, so the mean over
    // 16 coordinates should straddle the original squared distance
    val ids = orig.keys.toSeq.sorted.take(40)
    val ratios = for {
      i <- ids.indices; jj <- (i + 1) until ids.length
      a = ids(i); b = ids(jj)
      d2 = orig(a).zip(orig(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if d2 > 1e-9
      pd2 = proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum / 16.0
    } yield pd2 / d2
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.length / 2)
    assert(median > 0.6 && median < 1.6, s"median JL ratio $median")
    val within = ratios.count(r => r > 0.3 && r < 3.0).toDouble / ratios.length
    assert(within >= 0.9, s"only ${within * 100}%% of pairs within 3x")
  }

  test("projection as candidate generation: project, cut to 100, re-rank exactly") {
    // the production JL pattern: the cheap half-byte projected table
    // generates candidates, the exact ranker touches only those — so
    // what matters is candidate-set recall, not projected rank order
    // (on this corpus exact cosines are tightly packed: projected
    // top-20 alone keeps only ~0.2 of the exact top-20, which is why
    // the re-rank stage exists)
    val exact = Similarity.bruteForceTopK(emb, 0L, k = 20)
      .collect().map(_.getLong(0)).toSet
    val projEmb = Similarity.randomProject(emb, 32)
      .groupBy($"vec_id")
      .agg(array_sort(collect_list(struct($"out_dim", $"p"))).as("pairs"))
      .select($"vec_id",
        expr("transform(pairs, x -> cast(x.p as float))").as("embedding"))
    val candidates = Similarity.bruteForceTopK(projEmb, 0L, k = 100)
      .collect().map(_.getLong(0)).toSet
    val recall = (candidates & exact).size / 20.0
    assert(recall >= 0.5, s"candidate recall@20 within top-100 = $recall")
  }
}
