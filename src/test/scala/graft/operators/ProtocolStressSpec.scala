package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Reference-fidelity stress fixtures (FIXTURES.md §1):
  *  - the 800k-double / 8-chunk TSV echo stress array (`tests/test.sh:15-18`)
  *  - the 10k-strings-with-one-null single Arrow batch
  *    (ARROW-1676 regression, `tests/test_low.py:140-161`)
  */
class ProtocolStressSpec extends SparkSpec {
  import spark.implicits._

  test("800k doubles echo through TSV in 8 chunks of 100k") {
    val awkEcho =
      """awk -W interactive 'BEGIN{n=-1}
        |{ if (n<0) { n=$0+0; if (n==0) { print 0; fflush(); exit }; print n }
        |  else     { print $0; if (--n==0) { fflush(); n=-1 } } }'"""
        .stripMargin.replace("\n", " ")
    val df = spark.range(1, 800001).repartition(8)
      .select($"id".cast("double").as("val"))
    val out = Stream.tsv(df, awkEcho, chunkSize = 100000)
    val vals = out.select(explode(split($"response", "\n")).as("l"))
      .select($"l".cast("double").as("v"))
    assert(vals.count() == 800000L)
    assert(vals.agg(sum($"v")).head.getDouble(0) == 800000.0 * 800001.0 / 2)
    // 8 partitions x 1 chunk each (100k rows per chunk)
    assert(out.count() == 8)
  }

  test("10k strings with one null survive a single Arrow batch") {
    val cmd = graft.operators.clients.JvmChild.command("graft.operators.clients.ArrowEchoChild")
    val df = spark.range(1, 10001).coalesce(1)
      .select(when($"id" < 10000, $"id".cast("string")).as("val"))
    val declared = StructType(Seq(StructField("val", StringType)))
    val out = Stream.arrow(df, cmd, declared, chunkSize = 10000)
    assert(out.count() == 10000)
    assert(out.filter($"val".isNull).count() == 1)
    assert(out.groupBy($"chunk_no").count().count() == 1) // one batch
  }
}
