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
