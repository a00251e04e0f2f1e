package graft.client

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** Child-side client library for writing stream children on the JVM —
  * the Scala analog of the reference's Python `scidbstrm` package
  * (`py_pkg/scidbstrm/__init__.py:62-139`) over the TSV wire format.
  *
  * Contract (reference `README.md:31-79`): stdin carries data messages
  * (`"n\n"` header + n TSV lines); `0\n` from the parent means
  * end-of-data; the child must answer exactly one message per request
  * and one final message after EOF. stdout is the data channel — log to
  * stderr only (`py_pkg/README.rst:101-131`).
  *
  * {{{
  * // echo child:
  * object Echo { def main(a: Array[String]): Unit =
  *   StreamClient.map(rows => rows) }
  * // aggregating child (map + finalize, pattern P3):
  * object Sum { def main(a: Array[String]): Unit = {
  *   var s = 0L
  *   StreamClient.map(rows => { rows.foreach(r => s += r.head.toLong); Nil },
  *                    finalizeFun = () => Seq(Seq(s.toString))) } }
  * }}}
  */
object StreamClient {

  type TsvRow = Seq[String]

  final class Channel(in: InputStream, out: OutputStream) {
    private val bin = new BufferedInputStream(in, 1 << 20)
    private val bout = new BufferedOutputStream(out, 1 << 20)

    /** Read one message; None when the parent signals end-of-data. */
    def read(): Option[Seq[TsvRow]] = {
      val header = new StringBuilder
      var c = bin.read()
      if (c < 0) sys.error("parent closed pipe before message")
      while (c != '\n') { header.append(c.toChar); c = bin.read()
        if (c < 0) sys.error("parent closed pipe mid-header") }
      val n = header.toString.trim.toLong
      if (n == 0) return None
      val rows = Seq.newBuilder[TsvRow]
      var i = 0L
      // accumulate raw bytes per line and decode as UTF-8 (write() encodes
      // UTF-8; per-byte toChar would decode Latin-1 and corrupt non-ASCII);
      // split with limit -1 so trailing empty cells keep their column slot
      val line = new java.io.ByteArrayOutputStream(256)
      while (i < n) {
        val b = bin.read()
        if (b < 0) sys.error("parent closed pipe mid-message")
        if (b == '\n') {
          val s = new String(line.toByteArray, StandardCharsets.UTF_8)
          rows += s.split("\t", -1).toSeq
          line.reset(); i += 1
        } else line.write(b)
      }
      Some(rows.result())
    }

    /** Write one response message (empty Seq → `0\n`, "no data now"). */
    def write(rows: Seq[TsvRow]): Unit = {
      bout.write((rows.size.toString + "\n").getBytes(StandardCharsets.UTF_8))
      rows.foreach { r =>
        bout.write(r.mkString("\t").getBytes(StandardCharsets.UTF_8))
        bout.write('\n')
      }
      bout.flush()
    }
  }

  def channel(): Channel = new Channel(System.in, System.out)

  /** Per-message map loop with optional finalize — the analog of
    * `scidbstrm.map(map_fun, finalize_fun)` (`__init__.py:117-139`).
    */
  def map(mapFun: Seq[TsvRow] => Seq[TsvRow],
          finalizeFun: () => Seq[TsvRow] = () => Nil): Unit = {
    val ch = channel()
    var running = true
    while (running) ch.read() match {
      case Some(rows) => ch.write(mapFun(rows))
      case None       => ch.write(finalizeFun()); running = false
    }
  }

  /** Consume one message manually (side-input pattern, the analog of the
    * R client's `getChunk`, `r_pkg/R/exported.R:118-126`): returns the
    * rows and acks with an empty message.
    */
  def getChunk(ch: Channel): Seq[TsvRow] = {
    val rows = ch.read().getOrElse(sys.error("expected side-input message, got EOF"))
    ch.write(Nil)
    rows
  }

  /** Log to stderr (stdout is the data channel). */
  def debug(msg: String): Unit = System.err.println(s"[child] $msg")
}

/** Runnable echo child (TSV): prefix-echo every row. */
object TsvEchoChild {
  def main(args: Array[String]): Unit =
    StreamClient.map(rows => rows.map(r => "ok" +: r))
}

/** Runnable aggregating child (TSV): global sum of column 0,
  * emitted only in the final message (pattern P3).
  */
object TsvSumChild {
  def main(args: Array[String]): Unit = {
    var s = 0L
    StreamClient.map(
      rows => { rows.foreach(r => s += r.head.toLong); Nil },
      finalizeFun = () => Seq(Seq(s.toString)))
  }
}

/** Runnable side-input child (TSV): first message is a key→value
  * lookup; subsequent rows' first column is mapped through it.
  */
object TsvLookupChild {
  def main(args: Array[String]): Unit = {
    val ch = StreamClient.channel()
    val lookup = StreamClient.getChunk(ch).map(r => r.head -> r(1)).toMap
    var running = true
    while (running) ch.read() match {
      case Some(rows) => ch.write(rows.map(r => Seq(lookup.getOrElse(r.head, "?"))))
      case None       => ch.write(Nil); running = false
    }
  }
}
