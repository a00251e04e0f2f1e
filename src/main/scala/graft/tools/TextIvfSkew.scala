package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.IvfIndex

/** Companion measurement to ANN_RECALL.md's text-IVF tier: recall at
  * equal `nProbe` is NOT cost-comparable when list sizes skew, because
  * the probe's true cost is the ROWS in the probed lists, not the list
  * count. This prints both geometries' list-size distribution and the
  * mean probed-row fraction at each nProbe for the same queries the
  * curves use — the denominator that makes the seed-vs-trained recall
  * columns honest. `runMain graft.tools.TextIvfSkew [sfDir]`.
  */
object TextIvfSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-text-ivf-skew")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
    val tvecs = graft.operators.TextVectors.featureHashVectors(docs, 256)
      .select(col("doc_id").as("vec_id"),
        transform(col("fvec"), x => x.cast("double")).as("embedding"))
      .cache()
    val n = tvecs.count()
    val nLists = 16
    val nQueries = 16
    val qids = (0 until nQueries).map(i => 32L + i * ((n - 32) / nQueries))

    val seedCents = tvecs.filter(col("vec_id") < nLists)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toSeq) }.toSeq
    val trainCents = IvfIndex.train(tvecs, nLists, iters = 2)

    for ((name, cents) <- Seq("seed" -> seedCents, "trained" -> trainCents)) {
      val sizes = IvfIndex.assign(tvecs, cents)
        .groupBy(col("list_id")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sorted = sizes.values.toSeq.sorted.reverse
      println(s"[skew] $name list sizes (desc): ${sorted.mkString(",")}")
      println(f"[skew] $name top-1 share=${sorted.head.toDouble / n}%.3f " +
        f"top-4 share=${sorted.take(4).sum.toDouble / n}%.3f")
      val qvs = qids.map { q =>
        q -> tvecs.filter(col("vec_id") === q)
          .select(transform(col("embedding"), x => x.cast("double")))
          .head.getSeq[Double](0).toSeq
      }
      for (nProbe <- Seq(1, 2, 4, 8)) {
        val frac = qvs.map { case (_, qv) =>
          val probed = cents.map { case (cid, c) =>
            (cid, c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
          }.sortBy(_._2).take(nProbe).map(_._1)
          probed.map(l => sizes.getOrElse(l, 0L)).sum.toDouble / n
        }.sum / qvs.size
        println(f"[skew] $name nProbe=$nProbe mean probed-row fraction=$frac%.3f")
      }
    }
    spark.stop()
  }
}
