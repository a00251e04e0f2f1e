package graft

import org.apache.spark.sql.SparkSession

/** Large-k evidence for the incremental farthest-point-first selection
  * (r11 verdict directive 6): `kCenterSelect` is one narrow corpus pass
  * per round with a localCheckpoint truncating the lineage, so
  * PER-ROUND time must stay flat as r grows — total time linear in k,
  * never quadratic. This probe measures it instead of arguing it: run
  * the operator at increasing k on the same table and print the mean
  * per-round seconds for each tier; flat per-round cost shows as equal
  * per-round figures (and marginal cost (t(2k)-t(k))/k ≈ t(k)/k).
  * `runMain graft.KCenterProbe [sfDir] [k1,k2,...]`.
  */
object KCenterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "testdata_sf1"
    val ks = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
             else Seq(64, 128, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kcenter-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    // untimed warmup so tier 1 is not billed for codegen compilation
    graft.operators.Similarity.kCenterSelect(emb, 4).count()
    val results = ks.map { k =>
      val t0 = System.nanoTime()
      val rounds = graft.operators.Similarity.kCenterSelect(emb, k).count()
      val dt = (System.nanoTime() - t0) / 1e9
      require(rounds == k, s"expected $k rounds, got $rounds")
      println(f"[kcenter] n=$n k=$k%4d total=$dt%7.1f s per-round=${dt / k}%.3f s")
      k -> dt
    }
    results.sliding(2).foreach {
      case Seq((k1, t1), (k2, t2)) =>
        println(f"[kcenter] marginal per-round rounds ${k1 + 1}-$k2: " +
          f"${(t2 - t1) / (k2 - k1)}%.3f s (vs ${t1 / k1}%.3f s for 1-$k1)")
      case _ =>
    }
    spark.stop()
  }
}
