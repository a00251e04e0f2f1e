package graft.operators

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The `stream()` operator: pipe each partition of a DataFrame through an
  * external program speaking the reference's half-duplex chunk protocol,
  * and materialize the responses as a new DataFrame.
  *
  * Spark-first re-expression of the reference plugin
  * (`src/LogicalStream.cpp`, `src/PhysicalStream.cpp`): a narrow
  * `mapPartitions` — one child process per task, data stays
  * partition-local, no shuffle is introduced (reference declares
  * "undefined" output distribution, `src/PhysicalStream.cpp:129-159`; we
  * surface `UnknownPartitioning` the same way by construction). The
  * output schema is declared by the caller, mirroring the mandatory
  * `types:`/`names:` keywords (`src/StreamSettings.h:62-324`), so no
  * Catalyst extension is needed — analysis sees an ordinary plan.
  *
  * Lineage columns follow §1.2 of the survey: TSV output is
  * `[instance_id, chunk_no, response]`; Arrow output is the declared
  * attributes plus `[instance_id, chunk_no, value_no]`. `instance_id` is
  * the Spark partition id.
  *
  * The optional side input replays the reference's ARRAY2: its rows are
  * broadcast and written to every child *before* the partition's own data
  * (`src/PhysicalStream.cpp:74-100` order), which is how clients receive
  * shipped functions/models (patterns P6, P8, P9).
  */
object Stream {

  /** Commands must be allowlisted when `spark.graft.stream.allowedCommands`
    * is set (comma-separated), mirroring the reference's
    * `stream_allowed` file gate (`src/LogicalStream.cpp:97-118`).
    */
  private def checkAllowed(spark: SparkSession, cmd: String): Unit = {
    val conf = spark.conf.getOption("spark.graft.stream.allowedCommands")
    conf.foreach { list =>
      val allowed = list.split(',').map(_.trim).toSet
      if (!allowed.contains(cmd))
        throw new IllegalArgumentException(
          s"stream command not allowlisted: $cmd (set spark.graft.stream.allowedCommands)")
    }
  }

  /** Infer the child's output schema by running it on a sample batch —
    * the analog of the R client's `schema(f, input)` helper
    * (`r_pkg/R/exported.R:37-52`): ship `sampleRows` rows through the
    * Arrow protocol and read the declared types off the response frame.
    */
  def inferSchema(df: DataFrame, cmd: String, sampleRows: Int = 32): StructType = {
    import org.apache.arrow.vector._
    val spark = df.sparkSession
    checkAllowed(spark, cmd)
    val sample = df.limit(sampleRows).collect().toIndexedSeq
    val child = new ChildProcess(cmd, None)
    val allocator = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    try {
      ArrowProtocol.writeBatch(child.stdin, allocator, df.schema, sample)
      val len = {
        val b = new Array[Byte](8)
        var off = 0
        while (off < 8) {
          val r = child.stdout.read(b, off, 8 - off)
          if (r < 0) { child.throwIfDeadAfter(2000); sys.error("no response") }
          off += r
        }
        java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      }
      if (len == 0) sys.error("child returned no data for schema inference")
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < payload.length) {
        val r = child.stdout.read(payload, off, payload.length - off)
        if (r < 0) sys.error("child stdout closed mid-frame")
        off += r
      }
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(payload), allocator)
      try {
        if (!reader.loadNextBatch()) sys.error("empty IPC frame")
        StructType(reader.getVectorSchemaRoot.getFieldVectors.asScala.toSeq.map {
          case v: BigIntVector    => StructField(v.getName, LongType)
          case v: IntVector       => StructField(v.getName, IntegerType)
          case v: Float8Vector    => StructField(v.getName, DoubleType)
          case v: VarCharVector   => StructField(v.getName, StringType)
          case v: VarBinaryVector => StructField(v.getName, BinaryType)
          case v => throw new IllegalArgumentException(
            s"unsupported child column type ${v.getClass.getSimpleName}")
        })
      } finally reader.close()
    } finally {
      child.terminate()
      allocator.close()
    }
  }

  /** SQL-workflow bridge: pipe a registered view/table by name. */
  def tsvSql(spark: SparkSession, view: String, cmd: String,
             chunkSize: Int = 10000): DataFrame =
    tsv(spark.table(view), cmd, chunkSize)

  val tsvOutputSchema: StructType = StructType(Seq(
    StructField("instance_id", LongType, nullable = false),
    StructField("chunk_no", LongType, nullable = false),
    StructField("response", StringType, nullable = false)))

  /** TSV-format stream: rows out as TSV, each response message becomes one
    * output row (`response` holds the whole body, header stripped).
    */
  def tsv(df: DataFrame, cmd: String, chunkSize: Int = 10000,
          side: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    checkAllowed(spark, cmd)
    val sideRows: Seq[Row] =
      side.map(_.collect().toIndexedSeq).getOrElse(IndexedSeq.empty)
    val sideBc = spark.sparkContext.broadcast(sideRows)
    val rdd = df.rdd.mapPartitions { iter =>
      val ctx = TaskContext.get()
      val pid = if (ctx == null) 0L else ctx.partitionId().toLong
      val child = new ChildProcess(cmd, Option(ctx))
      val out = ArrayBuffer.empty[Row]
      var chunkNo = 0L
      def exchange(lines: Iterator[String], n: Int, last: Boolean): Unit = {
        if (!last && n == 0) return // O16: never send empty mid-stream chunks
        // Write on a helper thread while this thread drains the response:
        // a child that starts answering before consuming the whole chunk
        // would otherwise fill its 64 KB stdout pipe and deadlock both
        // sides (SURVEY.md §7.4 risk 1 — JVM pipes have no poll loop).
        @volatile var werr: Throwable = null
        val writer = new Thread(() =>
          try {
            if (last) TsvProtocol.writeEof(child.stdin)
            else TsvProtocol.writeChunk(child.stdin, lines, n)
          } catch { case t: Throwable =>
            werr = t
            child.terminate() // unblock the reader; the exchange is dead
          })
        writer.setDaemon(true)
        writer.start()
        val resp =
          try TsvProtocol.readMessage(child.stdout, child, lastMessage = last)
          catch { case re: Throwable =>
            writer.join(60000)
            // a writer failure is the root cause; a broken pipe from a
            // dead child gets the clearer premature-exit message
            if (werr != null && !werr.isInstanceOf[java.io.IOException]) throw werr
            if (werr != null) { child.throwIfDead(); throw werr }
            throw re
          }
        writer.join(60000)
        if (writer.isAlive) {
          // writer still blocked on the child's stdin: starting the next
          // exchange would run two writers on one stream and interleave
          // bytes — kill the child and fail the task instead
          child.terminate()
          sys.error(s"stream writer stuck >60s feeding child stdin ($cmd); child terminated")
        }
        if (werr != null) {
          child.throwIfDead()
          throw werr
        }
        if (resp.nonEmpty) {
          out += Row(pid, chunkNo, resp)
          chunkNo += 1
        }
      }
      try {
        val sv = sideBc.value
        if (sv.nonEmpty)
          exchange(sv.iterator.map(TsvProtocol.formatRow), sv.size, last = false)
        iter.grouped(chunkSize).foreach { chunk =>
          exchange(chunk.iterator.map(TsvProtocol.formatRow), chunk.size, last = false)
        }
        exchange(Iterator.empty, 0, last = true)
      } finally child.terminate()
      out.iterator
    }
    spark.createDataFrame(rdd, tsvOutputSchema)
  }

  def arrowOutputSchema(declared: StructType): StructType =
    StructType(declared.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField("instance_id", LongType, nullable = false),
      StructField("chunk_no", LongType, nullable = false),
      StructField("value_no", LongType, nullable = false)))

  /** Arrow-format stream: columnar batches both directions, declared
    * output schema (the reference's mandatory `types:`/`names:`).
    */
  def arrow(df: DataFrame, cmd: String, declared: StructType,
            chunkSize: Int = 10000, side: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    checkAllowed(spark, cmd)
    declared.fields.foreach(f => ArrowProtocol.arrowField(f.name, f.dataType))
    val inSchema = df.schema
    val sideSchema = side.map(_.schema)
    val sideRows: Seq[Row] =
      side.map(_.collect().toIndexedSeq).getOrElse(IndexedSeq.empty)
    val sideBc = spark.sparkContext.broadcast(sideRows)
    val rdd = df.rdd.mapPartitions { iter =>
      val ctx = TaskContext.get()
      val pid = if (ctx == null) 0L else ctx.partitionId().toLong
      val child = new ChildProcess(cmd, Option(ctx))
      val allocator = new RootAllocator(Long.MaxValue)
      val out = ArrayBuffer.empty[Row]
      var chunkNo = 0L
      def readResp(last: Boolean): Unit =
        ArrowProtocol.readMessage(child.stdout, child, allocator, declared,
          lastMessage = last).foreach { rows =>
          var valueNo = 0L
          rows.foreach { r =>
            out += Row.fromSeq(r.toSeq ++ Seq(pid, chunkNo, valueNo))
            valueNo += 1
          }
          chunkNo += 1
        }
      try {
        // concurrent writer per exchange — see the TSV path for why
        def exchange(body: => Unit, last: Boolean): Unit = {
          @volatile var werr: Throwable = null
          val writer = new Thread(() =>
            try body catch { case t: Throwable =>
              werr = t
              child.terminate() // unblock the reader; the exchange is dead
            })
          writer.setDaemon(true)
          writer.start()
          try readResp(last)
          catch { case re: Throwable =>
            writer.join(60000)
            if (werr != null && !werr.isInstanceOf[java.io.IOException]) throw werr
            if (werr != null) { child.throwIfDead(); throw werr }
            throw re
          }
          writer.join(60000)
          if (writer.isAlive) {
            // same two-concurrent-writers hazard as the TSV path
            child.terminate()
            sys.error(s"stream writer stuck >60s feeding child stdin ($cmd); child terminated")
          }
          if (werr != null) { child.throwIfDead(); throw werr }
        }
        val sv = sideBc.value
        if (sv.nonEmpty)
          exchange(ArrowProtocol.writeBatch(child.stdin, allocator, sideSchema.get, sv),
            last = false)
        iter.grouped(chunkSize).foreach { chunk =>
          if (chunk.nonEmpty)
            exchange(ArrowProtocol.writeBatch(child.stdin, allocator, inSchema, chunk),
              last = false)
        }
        exchange(ArrowProtocol.writeEof(child.stdin), last = true)
      } finally {
        child.terminate()
        allocator.close()
      }
      out.iterator
    }
    spark.createDataFrame(rdd, arrowOutputSchema(declared))
  }
}
