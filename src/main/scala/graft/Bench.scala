package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON metrics line.
  *
  * Every query runs TWICE: an untimed warm pass (janino/whole-stage
  * codegen compilation is a one-time JVM cost — measured 6-10 s on the
  * heaviest plans, pure compiler time that a long-lived cluster pays
  * once, not per query) and then the timed pass, so reported numbers
  * are steady-state. Data caches are cleared between the passes so the
  * warm pass never pre-materializes input for the timed one; the
  * cold-pass total is still emitted as "cold_sec" for transparency.
  * Queries run in sorted name order for stable output.
  */
/** Per-query scheduler counters for SPARK_GRAFT_PROFILE mode. */
private[graft] class ProfCounters {
  import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
  val jobs = new AtomicInteger
  val stages = new AtomicInteger
  val tasks = new AtomicInteger
  val taskMs = new AtomicLong
  val schedDelayMs = new AtomicLong
  def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
    taskMs.set(0); schedDelayMs.set(0) }
}

object Bench {
  // round stamp for the default artifact name, DERIVED so it can
  // never go stale: the driver commits BENCH_r{N}.json at each round
  // close, so the current round is max(N)+1 — a hardcoded constant
  // would let one forgotten bump silently overwrite the previous
  // round's committed artifact with the next round's first clean run.
  // The artifact directory is resolved EXPLICITLY (SPARK_GRAFT_REPO,
  // default the launch CWD) and a directory with no BENCH_r files
  // yields None — the writer then falls back to an unstamped name and
  // says so, instead of silently stamping a wrong round from a stray
  // working directory (r15 advice).
  private lazy val Round: Option[Int] = {
    val dir = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_REPO", "."))
    val re = "BENCH_r(\\d+)\\.json".r
    val seen = Option(dir.listFiles()).getOrElse(Array())
      .flatMap(f => f.getName match {
        case re(n) => Some(n.toInt)
        case _ => None
      })
    if (seen.isEmpty) None else Some(seen.max + 1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, default 100: the generated-class cache is keyed by
      // source text, and this suite has far more codegen units than 100
      // (110 queries x several whole-stage/aggregate units each), so at
      // the default every timed pass evicts and Janino-recompiles
      // what the warm pass just compiled — profiled at ~0.2-0.3 s of
      // the per-query floor. A long-lived cluster sizes this cache to
      // its workload; 10k entries of bytecode is a few hundred MB at
      // worst and turns repeat plans into cache hits.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    // ad-hoc config experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.setLogLevel("WARN")
    // warmup: one small aggregate through the whole stack
    Tables.load(spark, sfDir, "lineitem").selectExpr("sum(l_orderkey)").collect()
    val profile = sys.env.contains("SPARK_GRAFT_PROFILE")
    // profile mode: a listener splits each query's wall time into
    // scheduled work (sum of task run time / 32-way parallelism) vs
    // driver-side floor (planning, AQE re-optimization, job/stage
    // submission gaps) — the split that decides whether floor work
    // should target the plans or the session
    val prof = if (profile) {
      val c = new ProfCounters
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            c.jobs.incrementAndGet()
          override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            c.stages.incrementAndGet()
            c.tasks.addAndGet(s.stageInfo.numTasks)
            Option(s.stageInfo.taskMetrics).foreach { m =>
              c.taskMs.addAndGet(m.executorRunTime)
              c.schedDelayMs.addAndGet(
                m.executorDeserializeTime + m.resultSerializationTime)
            }
          }
        })
      Some(c)
    } else None
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def once(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      // Materialize the FULL result, not df.count(): under a logical-plan
      // count Catalyst legally prunes final sorts (EliminateSorts) and
      // unreferenced projections/aggregate expressions (ColumnPruning),
      // so a count-terminated bench under-measures projection-shaped
      // queries. Executing the query's OWN physical plan via
      // queryExecution.toRdd computes every column of every row (the
      // final UnsafeRow projection writes them all) with no pruning —
      // and, unlike a noop-sink write, adds no V2 write wrapper (the
      // wrapper measured a flat ~+0.6 s/query on 1-row outputs).
      try {
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val rdd = df.queryExecution.toRdd // forces analysis + physical plan
        val t2 = System.nanoTime()
        rdd.count()
        if (profile) {
          val t3 = System.nanoTime()
          Thread.sleep(80) // let the async listener bus drain
          val p = prof.get
          System.err.println(f"[profile] $name build=${(t1 - t0) / 1e9}%.3f " +
            f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
            s"jobs=${p.jobs.get} stages=${p.stages.get} tasks=${p.tasks.get} " +
            f"taskSec=${p.taskMs.get / 1e3}%.3f schedSec=${p.schedDelayMs.get / 1e3}%.3f")
          p.reset()
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // per-query caches must not leak across runs; draining the
      // tracked registry first also keeps its (strong) refs bounded
      // over a 180-query x 4-run process
      graft.Tables.releaseOperatorCaches(spark)
      // settle cross-query JVM debt (codegen classes, broadcast/shuffle
      // cleanup) so late queries in the sorted order aren't billed for
      // earlier queries' garbage — measured ~3x inflation on the last
      // few queries of a 74-query run without this
      System.gc()
      dt
    }
    // optional comma-separated name-prefix filter for iterating on a
    // single query's number without paying the whole suite
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    // timed passes per query after the cold pass: the headline number
    // is the per-query MEDIAN so one scheduler hiccup on a shared VM
    // cannot masquerade as a plan regression; min/max are emitted so a
    // reader can tell contention (wide spread) from a real slowdown
    // (shifted min). SPARK_GRAFT_REPS overrides (1 = the old behavior).
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3).max(1)
    // a query that THROWS still gets a (meaningless, usually fast) time
    // recorded; without surfacing the failure the crash reads as a
    // speedup in the totals (the sf1 smoke's q144 overflow hid this
    // way). The JSON line carries the failed set so no reader has to
    // scrape stderr.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
        val cold = once(name, fn)
        val timed = Seq.fill(reps)(once(name, fn)).sorted
        (name, timed(timed.size / 2), timed.head, timed.last, cold)
      }
    // Locale.ROOT: the f-interpolator formats with the JVM default
    // locale, and a comma-decimal locale (de_DE, ...) would turn the
    // bench line into invalid JSON ("0,123456").
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, med, _, _, _) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    // Per-query min/max spread goes to a sidecar file, NOT the stdout
    // line: the driver captures a bounded tail of the run's output, and
    // an inline spread block pushed the one-line JSON past that bound so
    // the round report recorded the line as unparseable (r7, r8). The
    // compact line (median per query at 0.1 ms resolution) fits; the
    // spread stays available for contention-vs-regression forensics.
    val spread = results.map { case (k, med, mn, mx, cold) =>
      "\"" + k + s"""":{"median":${fmt(med)},"min":${fmt(mn)},"max":${fmt(mx)},"cold":${fmt(cold)}}"""
    }.mkString("{", ",", "}")
    try {
      val p = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SPREAD_OUT", "BENCH_SPREAD.json"))
      java.nio.file.Files.write(p, s"""{"reps":$reps,"sf":"$sfDir","spread":$spread}""".getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] spread write failed: ${e.getMessage}") }
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._5).sum
    val failedJson = if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(",\"failed\":[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cold_sec":${fmt(coldTotal)},"reps":$reps,"queries":$qs$failedJson,"sf":"$sfDir"}"""
    // the line ALSO lands in files (r10 verdict directive 5, r18
    // verdict directive 2): the driver tails a BOUNDED window of stdout
    // (2000 chars in the r18 artifacts — the 179-query line is ~5 KB,
    // so it can NEVER be recovered from the tail no matter where it is
    // printed), so a file is the machine-readable artifact and stdout
    // is just the human echo. Two files:
    //  - the round-stamped bench_out_r{N}.json (audit history), and
    //  - the FIXED-PATH bench_out.json in the repo root, rewritten on
    //    every full-suite run — the stable name a comparator can read
    //    without knowing the round number.
    // Artifact hygiene (r14 verdict directive 2): the round-stamped
    // default name only ever receives CLEAN FULL-SUITE runs — a
    // filtered (SPARK_GRAFT_ONLY) or partially-failed run lands in
    // bench_out_partial.json instead, so investigation debris can
    // never masquerade as the round's headline artifact. The fixed
    // path accepts any FULL-SUITE run (a run with failures still
    // carries its "failed" list inside the line, so a reader can tell)
    // but never a filtered one.
    def writeLine(p: java.nio.file.Path): Unit =
      try java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] bench_out write to $p failed: ${e.getMessage}") }
    val repoDir = sys.env.getOrElse("SPARK_GRAFT_REPO", ".")
    val clean = failed.isEmpty && only.isEmpty
    val default =
      if (!clean) "bench_out_partial.json"
      else Round match {
        case Some(r) => s"bench_out_r$r.json"
        case None =>
          System.err.println("[bench] no BENCH_r*.json found in " +
            s"'$repoDir' — cannot " +
            "derive the round; writing bench_out_unstamped.json (set " +
            "SPARK_GRAFT_REPO to the repo root or SPARK_GRAFT_BENCH_OUT " +
            "explicitly)")
          "bench_out_unstamped.json"
      }
    writeLine(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", default)))
    if (only.isEmpty)
      writeLine(java.nio.file.Paths.get(repoDir, "bench_out.json"))
    // stop the session BEFORE the stdout echo so the one-line JSON is
    // the process's final stdout line (nothing from Spark shutdown can
    // land after it) — the best the stdout channel can do given the
    // bounded tail.
    spark.stop()
    println(line)
  }
}
