package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for named queries into per-query files —
  * the before/after plan evidence for optimization rounds.
  *
  * `runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> <q1,q2,...>`
  * writes `<outDir>/<query>_<suffix>.txt` for each listed query (name
  * prefixes allowed, like SPARK_GRAFT_ONLY). Session config matches
  * Bench (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on)
  * so the dumped plan is the one the bench executes (modulo AQE's
  * runtime re-optimization, which explain shows as isFinalPlan=false).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: DumpPlans <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val prefixes = names.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dump-plans")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if prefixes.exists(name.startsWith)) {
      spark.sparkContext.setJobDescription(s"plan: $name")
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plans] wrote $outDir/${name}_$suffix.txt")
      graft.Tables.releaseOperatorCaches(spark)
    }
    spark.stop()
  }
}
