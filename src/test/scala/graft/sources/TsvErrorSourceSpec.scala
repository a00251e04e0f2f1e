package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TsvErrorSourceSpec extends SparkSpec {
  import spark.implicits._

  test("declared-arity TSV load with malformed-row capture") {
    val dir = Files.createTempDirectory("graft_tsv").toString
    Files.writeString(Paths.get(dir, "part1.tsv"),
      "1\talpha\tx\n2\tbeta\ty\nbadline\n3\tgamma\tz\ttoomany\n")
    Files.writeString(Paths.get(dir, "part2.tsv"),
      "4\tdelta\tw\n")
    val df = spark.read.format("graft.sources.TsvErrorSource")
      .option("numAttributes", "3")
      .load(dir)
    assert(df.columns.toSeq == Seq("a0", "a1", "a2", "error"))
    assert(df.count() == 5)
    val good = df.filter($"error".isNull)
    assert(good.count() == 3)
    assert(good.select($"a1").as[String].collect().toSet == Set("alpha", "beta", "delta"))
    val bad = df.filter($"error".isNotNull).select($"error").as[String].collect().toSet
    assert(bad == Set("badline", "3\tgamma\tz\ttoomany"))
    // two files -> two partitions (instance-parallel load)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("regex-special delimiter is treated literally") {
    // '|' is regex alternation: a regex-based split would explode every
    // line into per-character fields and flag every row as an error
    val dir = Files.createTempDirectory("graft_pipe").toString
    Files.writeString(Paths.get(dir, "f.psv"), "a|b|\nc|d|e\n")
    val df = spark.read.format("graft.sources.TsvErrorSource")
      .option("numAttributes", "3").option("delimiter", "|")
      .load(dir)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    // trailing empty field must keep its column slot (split limit -1)
    assert(rows.toSet == Set(("a", "b", "", null), ("c", "d", "e", null)))
  }

  test("custom delimiter") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(Paths.get(dir, "f.csv"), "a,b\nc,d\n")
    val df = spark.read.format("graft.sources.TsvErrorSource")
      .option("numAttributes", "2").option("delimiter", ",")
      .load(dir)
    assert(df.filter($"error".isNull).count() == 2)
    assert(df.select($"a0").as[String].collect().toSet == Set("a", "c"))
  }
}
