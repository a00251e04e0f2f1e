package graft.operators.clients

/** Builds the shell command for a JVM child-process client.
  *
  * One `stream()` child is forked per partition, so on a 32-core
  * executor 32 JVMs start at once. An unconstrained `java` sizes itself
  * for the whole machine — 1/4-of-RAM max heap, a GC thread and a JIT
  * compiler thread per core — which multiplied by the partition count
  * oversubscribes the box (1000+ GC threads) and dominates the
  * operator's wall time. Children are tiny single-threaded stream
  * processors, so pin them down: one logical CPU, serial GC, a small
  * heap, C1-only JIT (fast start; echo-style children never earn C2
  * recompiles), and CDS where available.
  *
  * The same reasoning applies on a real cluster: per-child resource
  * bounds are what keeps `spark.task.cpus=1` honest when tasks fork
  * helpers.
  *
  * `-Xlog:disable` is load-bearing, not cosmetic: the child's stdout is
  * the reserved binary data channel (the reference sinks R stdout for
  * exactly this reason — `r_pkg/R/internal.R:44-47`), but HotSpot's
  * unified logging writes `[0.029s][warning][os,thread] ...` lines to
  * stdout by default. Under full-suite load (32 children forking at
  * once) those warnings fire and corrupt the protocol stream mid-frame.
  */
object JvmChild {
  def command(mainClass: String, maxHeapMb: Int = 256): String = {
    val cp = System.getProperty("java.class.path")
    "exec java --add-opens=java.base/java.nio=ALL-UNNAMED " +
      "-Dio.netty.tryReflectiveSetAccessible=true " +
      s"-XX:ActiveProcessorCount=1 -XX:+UseSerialGC -Xmx${maxHeapMb}m " +
      "-XX:TieredStopAtLevel=1 -Xshare:auto -Xlog:disable " +
      s"-cp '$cp' $mainClass"
  }
}
