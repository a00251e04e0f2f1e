package graft.sources

import java.io.{BufferedReader, InputStreamReader}
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
  * Scale notes: one input partition per file (the reference's
  * instance-parallel load); schema is declared via options, never
  * inferred, so planning touches no data. Column pruning flows through
  * the declared read schema. For 100 TB you would add byte-range splits
  * like Spark's FileScan — the partition-reader seam here is where they
  * plug in.
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

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    paths.flatMap { p =>
      val fs = new Path(p).getFileSystem(conf)
      val stat = fs.getFileStatus(new Path(p))
      if (stat.isDirectory)
        fs.listStatus(new Path(p)).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(s => TsvFilePartition(s.getPath.toString))
      else Seq(TsvFilePartition(p))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(schema.length - 1,
      opts.getOrElse("delimiter", "\t").charAt(0))
}

private case class TsvFilePartition(path: String) extends InputPartition

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

private class TsvReaderFactory(nAttrs: Int, delim: Char)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[TsvFilePartition].path
    new PartitionReader[InternalRow] {
      private val fs = new Path(path)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      private val reader = new BufferedReader(
        new InputStreamReader(fs.open(new Path(path)), StandardCharsets.UTF_8), 1 << 20)
      private var row: InternalRow = _

      override def next(): Boolean = {
        val line = reader.readLine()
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
      override def close(): Unit = reader.close()
    }
  }
}
