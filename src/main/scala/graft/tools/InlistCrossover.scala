package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IndexLayout, TextDedup}

/** Measures the key-pushdown SHAPE question for [[IndexLayout
  * .prunedScan]] (r16 verdict directive 6): above bucket pruning,
  * should the batch's distinct keys reach the index scan as
  *
  *  (a) a literal `key IN (...)` filter — parquet gets the IN list as
  *      a pushed filter (row-group stats + dictionary pages skip
  *      non-matching pages), but the filter EXPRESSION grows with the
  *      key count and is evaluated per surviving row; or
  *  (b) a broadcast LEFT-SEMI join against the distinct-key frame —
  *      constant-size plan, hash-probe per row, but NO parquet
  *      pushdown (every row of the touched buckets is read and
  *      hashed).
  *
  * The probe here is the real gram-index novelty probe shape (scan →
  * filter/join → count) over a standing index built from the 10×
  * history tier, with batch key counts swept across the
  * [[IndexLayout.MaxKeyPushdown]] boundary. `runMain
  * graft.tools.InlistCrossover [out.md] [histDir]` (defaults
  * tools/inlist_crossover.md, testdata_sf1 — the probe-smoke 10×
  * corpus). min of 3 timed reps after a cold pass, like ProbeSmoke.
  */
object InlistCrossover {
  def main(args: Array[String]): Unit = {
    val outFile = if (args.nonEmpty) args(0) else "tools/inlist_crossover.md"
    val histDir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SMOKE_10X_DIR"))
      .getOrElse("testdata_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-inlist-crossover")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(IndexLayout.PruneMinBytesKey, "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hist = Tables.load(spark, histDir, "documents")
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft_inlist_x_").toString
    // the gram index is the largest-key-universe standing index
    // (distinct word 3-grams), the honest worst case for a literal list
    graft.operators.TextAnalysis.writeGramIndex(hist, dir)
    val idx = spark.read.parquet(dir)
    val nIdx = idx.count()

    // batch keys: real index keys (so the probe does real row work)
    // sampled deterministically, at counts sweeping the pushdown cap
    val keyPool = idx.select(col("sh")).distinct()
      .orderBy(xxhash64(col("sh"))).limit(65536)
      .collect().map(_.getString(0))

    def timeIt(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once(); Seq.fill(3)(once()).min
    }

    val sb = new StringBuilder
    sb.append(s"# Key-pushdown shape: literal IN-list vs broadcast ")
    sb.append(s"semi-join ($histDir gram index, $nIdx rows)\n\n")
    sb.append("Both shapes sit on top of bucket pruning (the scan is ")
    sb.append("already restricted to the batch's buckets); measured: the ")
    sb.append("additional key-restriction stage, probe = scan+count. ")
    sb.append("min of 3 reps after a cold pass.\n\n")
    sb.append("| distinct keys | IN-list s | broadcast semi s | bucket-only s |\n")
    sb.append("|---|---|---|---|\n")

    for (nKeys <- Seq(256, 1024, 4096, 16384)) {
      val keys = keyPool.take(nKeys)
      val keyDf = spark.createDataFrame(
        spark.sparkContext.parallelize(keys.map(org.apache.spark.sql.Row(_)).toSeq, 4),
        new org.apache.spark.sql.types.StructType()
          .add("sh", org.apache.spark.sql.types.StringType))
      val buckets = keyDf.select(IndexLayout.bucketOf(col("sh")).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      def byBucket() = idx.filter(col("bucket").isin(buckets: _*))
      val tIn = timeIt(() =>
        byBucket().filter(col("sh").isin(keys.map(_.asInstanceOf[Any]): _*)))
      val tSemi = timeIt(() =>
        byBucket().join(broadcast(keyDf), Seq("sh"), "left_semi"))
      val tBucket = timeIt(() => byBucket())
      sb.append(f"| $nKeys | $tIn%.3f | $tSemi%.3f | $tBucket%.3f |\n")
      println(f"[inlist-x] nKeys=$nKeys in=$tIn%.3f semi=$tSemi%.3f " +
        f"bucketOnly=$tBucket%.3f")
    }
    Files.writeString(Paths.get(outFile), sb.toString, StandardCharsets.UTF_8)
    println(s"[inlist-x] wrote $outFile")
    spark.stop()
  }
}
