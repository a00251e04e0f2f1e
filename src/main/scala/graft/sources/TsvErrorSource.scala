package graft.sources

import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's parallel delimited
  * load + parse semantics (`aio_input(path, num_attributes:n)` and
  * `parse(A, num_attributes:n)`, SURVEY.md §2.5): every line splits into
  * exactly `numAttributes` string columns `a0..a{n-1}` plus an `error`
  * column that captures the raw line when the field count differs —
  * malformed input is data, not an exception.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.TsvErrorSource")
  *   .option("numAttributes", "3").option("delimiter", "\t")
  *   .load("/path/to/files")
  * }}}
  *
  * Scale notes: files larger than `maxSplitBytes` (default 128 MB, the
  * same default as `spark.sql.files.maxPartitionBytes`) are split into
  * byte ranges like Spark's own FileScan, so a single huge TSV load
  * parallelizes across the cluster instead of pinning one task. Line
  * ownership is self-consistent across splits: a split owns exactly the
  * lines whose first byte lies in `[start, end)`; a reader with
  * `start > 0` discards through the first newline at-or-after
  * `start - 1` (so a line beginning exactly at `start` is kept), and
  * the line straddling `end` is read to completion by its owner.
  * Schema is declared via options, never inferred, so planning touches
  * no data; column pruning flows through the declared read schema.
  */
class TsvErrorSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvErrorSource.schemaFor(options.getInt("numAttributes", 1))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TsvErrorTable(schema, properties.asScala.toMap)
}

object TsvErrorSource {
  def schemaFor(n: Int): StructType =
    StructType((0 until n).map(i => StructField(s"a$i", StringType)) :+
      StructField("error", StringType))
}

private class TsvErrorTable(schema: StructType, props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"graft-tsv(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema, options.asScala.toMap ++ props)
}

private class TsvScanBuilder(schema: StructType, opts: Map[String, String])
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  private def paths: Seq[String] =
    opts.get("path").toSeq ++ opts.get("paths").toSeq.flatMap(_.split(","))

  private def maxSplitBytes: Long =
    opts.get("maxSplitBytes").map(_.toLong).getOrElse(128L * 1024 * 1024)

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val split = maxSplitBytes
    def partitionsOf(path: String, len: Long): Seq[TsvFilePartition] =
      if (len <= split) Seq(TsvFilePartition(path, 0L, Long.MaxValue))
      else (0L until len by split).map(off =>
        TsvFilePartition(path, off, math.min(split, len - off)))
    paths.flatMap { p =>
      val fs = new Path(p).getFileSystem(conf)
      val stat = fs.getFileStatus(new Path(p))
      if (stat.isDirectory)
        fs.listStatus(new Path(p)).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .flatMap(s => partitionsOf(s.getPath.toString, s.getLen))
      else partitionsOf(p, stat.getLen)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(schema.length - 1,
      opts.getOrElse("delimiter", "\t").charAt(0))
}

private case class TsvFilePartition(path: String, start: Long, length: Long)
  extends InputPartition

private object TsvReaderFactory {
  /** Split on the literal delimiter character (String.split treats its
    * argument as a regex, so '|' or '.' would split every boundary),
    * preserving trailing empty fields.
    */
  def splitLiteral(line: String, delim: Char): Array[String] = {
    val out = Array.newBuilder[String]
    var start = 0
    var i = line.indexOf(delim)
    while (i >= 0) {
      out += line.substring(start, i)
      start = i + 1
      i = line.indexOf(delim, start)
    }
    out += line.substring(start)
    out.result()
  }
}

/** Byte-position-aware line scanner over an input stream: needed
  * because split ownership is defined on byte offsets, which a
  * character-level BufferedReader cannot report. Scanning for '\n' at
  * the byte level is UTF-8-safe (no multi-byte sequence contains 0x0A);
  * a trailing '\r' is stripped, matching BufferedReader.readLine for
  * \n / \r\n terminated input. `bytesConsumed` counts every byte read
  * off the stream including terminators.
  */
private class LineScanner(in: java.io.InputStream) {
  private val buf = new Array[Byte](1 << 16)
  private var bufLen = 0
  private var bufPos = 0
  private var eof = false
  var bytesConsumed: Long = 0L

  private def fill(): Boolean = {
    if (eof) return false
    bufLen = in.read(buf)
    bufPos = 0
    if (bufLen <= 0) { eof = true; false } else true
  }

  /** Next line without its terminator, or null at end of stream. */
  def readLine(): String = {
    var out: java.io.ByteArrayOutputStream = null
    var lineStart = bufPos
    while (true) {
      if (bufPos >= bufLen) {
        if (bufPos > lineStart) {
          if (out == null) out = new java.io.ByteArrayOutputStream(256)
          out.write(buf, lineStart, bufPos - lineStart)
        }
        if (!fill()) {
          if (out == null) return null
          val bytes = out.toByteArray
          bytesConsumed += bytes.length
          return new String(bytes, StandardCharsets.UTF_8)
        }
        lineStart = 0
      }
      val b = buf(bufPos)
      bufPos += 1
      if (b == '\n') {
        val bytes: Array[Byte] =
          if (out == null) java.util.Arrays.copyOfRange(buf, lineStart, bufPos - 1)
          else {
            out.write(buf, lineStart, bufPos - 1 - lineStart)
            out.toByteArray
          }
        bytesConsumed += bytes.length + 1 // content + '\n'
        val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
                else bytes.length
        return new String(bytes, 0, n, StandardCharsets.UTF_8)
      }
    }
    null // unreachable
  }
}

private class TsvReaderFactory(nAttrs: Int, delim: Char)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TsvFilePartition]
    new PartitionReader[InternalRow] {
      private val fs = new Path(p.path)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      private val stream = fs.open(new Path(p.path))
      private val end: Long =
        if (p.length == Long.MaxValue) Long.MaxValue else p.start + p.length
      // absolute offset where this reader's first owned line starts: a
      // reader not at the file head discards through the first newline
      // at-or-after start-1, so a line beginning exactly at `start` is
      // kept while one straddling `start` is left to the previous split
      private val firstLineStart: Long = {
        if (p.start > 0) {
          stream.seek(p.start - 1)
          var off = p.start - 1
          var b = stream.read()
          while (b >= 0 && b != '\n') { off += 1; b = stream.read() }
          off + 1
        } else 0L
      }
      private val scanner = new LineScanner(stream)
      private var row: InternalRow = _

      override def next(): Boolean = {
        // offset of the next unread line = first owned line + consumed
        if (firstLineStart + scanner.bytesConsumed >= end) return false
        val line = scanner.readLine()
        if (line == null) return false
        val fields = TsvReaderFactory.splitLiteral(line, delim)
        val vals = new Array[Any](nAttrs + 1)
        if (fields.length == nAttrs) {
          var i = 0
          while (i < nAttrs) { vals(i) = UTF8String.fromString(fields(i)); i += 1 }
          vals(nAttrs) = null
        } else {
          // arity mismatch: keep whatever parsed, record the raw line
          var i = 0
          while (i < nAttrs) {
            vals(i) = if (i < fields.length) UTF8String.fromString(fields(i)) else null
            i += 1
          }
          vals(nAttrs) = UTF8String.fromString(line)
        }
        row = InternalRow.fromSeq(vals.toIndexedSeq)
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = stream.close()
    }
  }
}
