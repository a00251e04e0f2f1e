package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Runs the reference's OWN protocol test scripts verbatim —
  * `tests/scripts/one_chunk.py` and `tests/scripts/any_chunks.py`,
  * unmodified, importing the reference's real `py_pkg/scidbstrm`
  * package — as children of `Stream.arrow`, reproducing the
  * `tests/test_low.py:59-137` type matrix (int64/double/string/binary
  * × one/multi chunk × default/named attribute) plus the
  * `test_arrow_1676` large-string-with-null regression
  * (`tests/test_low.py:140-161`). This is the byte-compat bar of
  * SURVEY §7.2 M3: the reference's test suite passing against this
  * engine, not a re-typed copy of its client loop.
  *
  * The scripts and package are read from the read-only reference tree
  * at runtime; nothing is copied into this repo. `scidbstrm` imports
  * `dill` at module scope for its function-shipping helpers
  * (`py_pkg/scidbstrm/__init__.py:24`), which one_chunk/any_chunks
  * never call — a minimal stub module on PYTHONPATH satisfies the
  * import without touching the exercised code paths. The suite skips
  * cleanly when the reference tree or python3+pyarrow+pandas are
  * absent.
  */
class ReferenceProtocolSpec extends SparkSpec {
  import spark.implicits._

  private val refRoot = "/root/reference"
  private val scripts = s"$refRoot/tests/scripts"
  private val pyPkg = s"$refRoot/py_pkg"

  private lazy val pythonArrowAvailable: Boolean =
    scala.util.Try(
      new ProcessBuilder("python3", "-c", "import pyarrow, pandas")
        .start().waitFor() == 0).getOrElse(false)

  private lazy val referenceAvailable: Boolean =
    new java.io.File(s"$scripts/one_chunk.py").isFile &&
      new java.io.File(s"$pyPkg/scidbstrm/__init__.py").isFile

  /** Temp dir with a stub `dill` module (unused by the scripts under
    * test, required at import time by the reference package).
    */
  private lazy val stubDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pystub")
    java.nio.file.Files.write(d.resolve("dill.py"),
      ("def dumps(*a, **k): raise NotImplementedError('stub')\n" +
        "def loads(*a, **k): raise NotImplementedError('stub')\n").getBytes("UTF-8"))
    d.toFile.deleteOnExit()
    d.toString
  }

  private def refCmd(script: String): String =
    s"PYTHONPATH=$stubDir:$pyPkg python3 -u $scripts/$script.py"

  private def assumeRef(): Unit = {
    assume(referenceAvailable, "reference tree not available")
    assume(pythonArrowAvailable, "python3 with pyarrow+pandas not available")
  }

  /** `build(<x:{ty}>[i=0:n-1:0:3], {ty}(i))` as a one-partition
    * DataFrame: value i of the given SciDB type, attribute named `x`
    * like the reference build (the response attribute name is set by
    * the DECLARED schema, mirroring the `names:` option).
    */
  private def buildInput(ty: String, n: Int): DataFrame = {
    val base = spark.range(0, n).coalesce(1)
    ty match {
      case "int64"  => base.select($"id".as("x"))
      case "double" => base.select($"id".cast("double").as("x"))
      case "string" => base.select($"id".cast("string").as("x"))
      case "binary" => base.select(encode($"id".cast("string"), "utf-8").as("x"))
    }
  }

  private def sparkType(ty: String): DataType = ty match {
    case "int64" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case "binary" => BinaryType
  }

  private def valueOf(row: Row, ty: String): String = ty match {
    case "binary" => new String(row.getAs[Array[Byte]](0), "UTF-8")
    case "string" => row.getString(0)
    case "double" => row.getDouble(0).toLong.toString
    case "int64" => row.getLong(0).toString
  }

  private val matrix = for {
    ty <- Seq("int64", "double", "string", "binary")
    name <- Seq(None, Some("foo"))
  } yield (ty, name)

  matrix.foreach { case (ty, name) =>
    val attr = name.getOrElse("a0")
    test(s"reference one_chunk.py: $ty, name=${name.getOrElse("<default>")}") {
      assumeRef()
      // test_low.py:59-99: 3 values in ONE chunk; the child reads the
      // single frame, echoes it, then writes the 0-frame EOF
      val declared = StructType(Seq(StructField(attr, sparkType(ty))))
      val out = Stream.arrow(
        buildInput(ty, 3).withColumnRenamed("x", attr),
        refCmd("one_chunk"), declared, chunkSize = 10).collect()
      assert(out.length == 3)
      val sorted = out.sortBy(_.getAs[Long]("value_no"))
      // (instance_id, chunk_no, value_no, attr=(not-null, val)) rows:
      // single instance, single chunk, values 0..2 all non-null
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(!r.isNullAt(0), s"row $i null")
        assert(valueOf(r, ty) == i.toString, s"row $i value")
        assert(r.getAs[Long]("chunk_no") == 0L)
        assert(r.getAs[Long]("value_no") == i.toLong)
      }
      assert(sorted.map(_.getAs[Long]("instance_id")).distinct.length == 1)
      assert(out.head.schema.fieldNames.toSeq ==
        Seq(attr, "instance_id", "chunk_no", "value_no"))
    }

    test(s"reference any_chunks.py: $ty, name=${name.getOrElse("<default>")}") {
      assumeRef()
      // test_low.py:102-137: 10 values in chunks of 3 (i=0:9:0:3); the
      // child loops read/write until the EOF frame
      val declared = StructType(Seq(StructField(attr, sparkType(ty))))
      val out = Stream.arrow(
        buildInput(ty, 10).withColumnRenamed("x", attr),
        refCmd("any_chunks"), declared, chunkSize = 3).collect()
      assert(out.length == 10)
      assert(out.map(valueOf(_, ty)).map(_.toInt).sorted.toSeq == (0 until 10))
      assert(out.forall(!_.isNullAt(0)))
      // 10 rows at chunk size 3 -> chunks 0..3, preserved per-frame
      assert(out.map(_.getAs[Long]("chunk_no")).distinct.sorted.toSeq ==
        Seq(0L, 1L, 2L, 3L))
    }
  }

  test("reference scidbstrm.map identity on 10k strings with null (ARROW-1676)") {
    assumeRef()
    // test_low.py:140-161: build(<val:string>[i=1:10000], iif(i<10000,
    // string(i), null)) through the reference package's own map loop —
    // the large-string + null-validity regression
    val cmd = s"PYTHONPATH=$stubDir:$pyPkg python3 -uc " +
      "\"import scidbstrm; scidbstrm.map(lambda df: df)\""
    val in = spark.range(1, 10001).coalesce(1)
      .select(when($"id" < 10000, $"id".cast("string")).as("val"))
    val declared = StructType(Seq(StructField("val", StringType)))
    val out = Stream.arrow(in, cmd, declared, chunkSize = 10000)
    val rows = out.collect()
    assert(rows.length == 10000 && rows.head.schema.size == 4) // df.shape == (10000, 4)
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filter(!_.isNullAt(0)).map(_.getString(0).toLong).sum ==
      (1L until 10000L).sum)
  }
}
