package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSpec

/** The reference's tested invariant (`tests/test.sh:20-40`,
  * `examples/client.cpp:47-71`): cancelling a query mid-stall kills the
  * child processes and leaves the system clean. Here: a child that
  * never answers, a Spark job-group cancel, and an assertion that the
  * stalled child is gone shortly after.
  */
class CancellationSpec extends SparkSpec {
  import spark.implicits._

  // ps+anchored-grep, not pgrep -f: the latter matches its own shell
  private def stalledChildren: Int = {
    val p = new ProcessBuilder("bash", "-c",
      "ps -eo args= | grep -c '^sleep 987654' || true").start()
    val n = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim.toInt
    p.waitFor(); n
  }

  test("downstream limit stops the lazy protocol early and reaps the child") {
    val awkEcho =
      """awk -W interactive 'BEGIN{n=-1}
        |{ if (n<0) { n=$0+0; if (n==0) { print 0; fflush(); exit }; print n }
        |  else     { print $0; if (--n==0) { fflush(); n=-1 } } }'"""
        .stripMargin.replace("\n", " ")
    // 200k rows in 2-row chunks = 100k exchanges if fully drained; a
    // limit(1) over the lazy iterator must finish in a few exchanges
    val df = spark.range(0, 200000).coalesce(1).select($"id")
    val t0 = System.nanoTime()
    val first = Stream.tsv(df, awkEcho, chunkSize = 2).limit(1).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(first.length == 1)
    assert(dt < 30.0, s"limit(1) took $dt s — output is being buffered eagerly")
    // the abandoned child is torn down by the task-completion listener
    val p = new ProcessBuilder("bash", "-c",
      "ps -eo args= | grep -c '^awk -W interactive' || true").start()
    val leftover = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim.toInt
    p.waitFor()
    assert(leftover == 0, s"$leftover awk children survived early exit")
  }

  test("cancelling a query kills a stalled child within the poll interval") {
    val df = spark.range(0, 10).coalesce(1).toDF("id")
    val started = new CountDownLatch(1)
    val finished = new CountDownLatch(1)
    @volatile var failure: Throwable = null
    val runner = new Thread(() => {
      try {
        started.countDown()
        Stream.tsv(df, "sleep 987654").count()
      } catch { case t: Throwable => failure = t }
      finally finished.countDown()
    })
    runner.start()
    started.await()
    // wait until the job is submitted and the child is actually running
    var tries = 0
    while ((stalledChildren == 0 ||
      spark.sparkContext.statusTracker.getActiveJobIds().isEmpty) && tries < 100) {
      Thread.sleep(100); tries += 1
    }
    assert(stalledChildren > 0, "stalled child never appeared")

    spark.sparkContext.cancelAllJobs()
    assert(finished.await(30, TimeUnit.SECONDS), "cancelled job did not finish")
    assert(failure != null, "count() should have failed after cancellation")

    // watchdog polls every 100 ms; give it a moment then check cleanup
    var waited = 0
    while (stalledChildren > 0 && waited < 50) { Thread.sleep(100); waited += 1 }
    assert(stalledChildren == 0, "stalled child survived cancellation")
  }
}
