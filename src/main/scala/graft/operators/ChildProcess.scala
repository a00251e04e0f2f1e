package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.TaskContext

/** Lifecycle manager for one external child process per Spark task.
  *
  * Mirrors the reference's child runtime (reference `src/ChildProcess.cpp`):
  *  - `fork + execle("/bin/bash","-c",cmd)` → `ProcessBuilder("/bin/bash","-c",cmd)`
  *    (`src/ChildProcess.cpp:49-102`)
  *  - stderr is the child's log channel, stdout the data channel
  *    (`py_pkg/README.rst:101-131`) → stderr inherited into the executor log
  *  - 100 ms liveness/cancellation poll loop (`src/ChildProcess.cpp:130-225`)
  *    → a daemon watchdog thread that checks Spark task interruption every
  *    100 ms and destroys the child, unblocking any pipe read
  *  - termination escalation: close pipes, SIGTERM, bounded wait, SIGKILL
  *    (`src/ChildProcess.cpp:104-128`) → destroy(), timed waitFor,
  *    destroyForcibly()
  *  - 1 MB buffered reads, flushed writes (`src/ChildProcess.h:47,78-116`)
  */
final class ChildProcess(cmd: String, ctx: Option[TaskContext]) {
  private val proc = {
    val pb = new ProcessBuilder("/bin/bash", "-c", cmd)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }
  val stdin = new BufferedOutputStream(proc.getOutputStream, 1 << 20)
  val stdout = new BufferedInputStream(proc.getInputStream, 1 << 20)

  private val closed = new AtomicBoolean(false)

  // a JVM that dies mid-query must not orphan children (the reference's
  // host kills the whole process tree on query teardown)
  private val shutdownHook = new Thread(() => proc.destroyForcibly())
  try Runtime.getRuntime.addShutdownHook(shutdownHook)
  catch { case _: IllegalStateException => () } // already shutting down

  // The reference re-validates the query every 100 ms while blocked on
  // child I/O and kills the child on cancellation. JVM pipe reads are not
  // interruptible, so a watchdog destroys the process when the Spark task
  // is killed, which makes the blocked read fail fast.
  private val watchdog: Thread = ctx match {
    case Some(c) =>
      val t = new Thread(() => {
        try {
          var watching = true
          while (watching && !closed.get() && proc.isAlive) {
            if (c.isInterrupted()) { terminate(); watching = false }
            else Thread.sleep(100)
          }
        } catch { case _: InterruptedException => () }
      }, s"graft-child-watchdog-${proc.pid()}")
      t.setDaemon(true)
      t.start()
      t
    case None => null
  }

  ctx.foreach(_.addTaskCompletionListener[Unit](_ => terminate()))

  /** True while the child has not exited. */
  def alive: Boolean = proc.isAlive

  /** Throw if the child already exited (protocol violation / crash). */
  def throwIfDead(): Unit =
    if (!proc.isAlive) {
      val code = proc.exitValue()
      throw new IOException(
        s"stream child exited prematurely with code $code (cmd: $cmd)")
    }

  /** Like `throwIfDead`, but first allow a short grace period for the
    * exit status to be reaped — EOF on the pipe can be observable a
    * moment before `isAlive` flips.
    */
  def throwIfDeadAfter(graceMillis: Long): Unit = {
    proc.waitFor(graceMillis, TimeUnit.MILLISECONDS)
    throwIfDead()
  }

  /** Close pipes, SIGTERM, wait ≤500 ms, then SIGKILL. Idempotent. */
  def terminate(): Unit = {
    if (!closed.compareAndSet(false, true)) return
    try stdin.close() catch { case _: IOException => () }
    try stdout.close() catch { case _: IOException => () }
    proc.destroy()
    if (!proc.waitFor(500, TimeUnit.MILLISECONDS)) {
      proc.destroyForcibly()
      proc.waitFor(5, TimeUnit.SECONDS)
    }
    if (watchdog != null) watchdog.interrupt()
    try Runtime.getRuntime.removeShutdownHook(shutdownHook)
    catch { case _: IllegalStateException => () }
  }

  /** Orderly wait after the final protocol message. */
  def waitFor(millis: Long): Boolean = proc.waitFor(millis, TimeUnit.MILLISECONDS)
}
