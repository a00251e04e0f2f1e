package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("fp", md5($"text".cast("binary")))

  private def oldSnap = (1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  // drop multiples of 5, rewrite multiples of 3, add 21..23
  private def newSnap = ((1L to 20L).filter(_ % 5 != 0)
    .map(i => (i, if (i % 3 == 0) s"doc $i edited" else s"doc $i")) ++
    (21L to 23L).map(i => (i, s"doc $i"))).toDF("doc_id", "text")

  test("diff classifies every key; the classes partition the key space") {
    val d = SnapshotDiff.diff(fp(oldSnap), fp(newSnap), "doc_id", "fp")
      .select($"doc_id", $"status").as[(Long, String)].collect().toMap
    assert(d.size == 23) // 20 old + 3 added
    (1L to 23L).foreach { i =>
      val expected =
        if (i > 20) "added"
        else if (i % 5 == 0) "removed"
        else if (i % 3 == 0) "changed"
        else "unchanged"
      assert(d(i) == expected, s"doc $i: got ${d(i)}, want $expected")
    }
  }

  test("delta carries exactly the added/changed keys with new-side rows") {
    val dl = SnapshotDiff.delta(fp(oldSnap), fp(newSnap), "doc_id", "fp")
      .select($"doc_id", $"text", $"status").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    val wantKeys = ((1L to 20L).filter(i => i % 5 != 0 && i % 3 == 0) ++
      (21L to 23L)).sorted
    assert(dl.map(_._1) == wantKeys)
    // delta rows are the NEW snapshot's content (the work set an
    // incremental pass consumes)
    assert(dl.forall { case (i, text, st) =>
      text == (if (i % 3 == 0 && i <= 20) s"doc $i edited" else s"doc $i") &&
        st == (if (i > 20) "added" else "changed")
    })
    // incremental invariant: old minus (removed + changed) plus delta
    // reconstitutes the new snapshot exactly
    val d = SnapshotDiff.diff(fp(oldSnap), fp(newSnap), "doc_id", "fp")
    val keep = d.filter($"status" === "unchanged").select($"doc_id")
    val rebuilt = oldSnap.join(keep, Seq("doc_id"))
      .unionByName(SnapshotDiff.delta(fp(oldSnap), fp(newSnap), "doc_id", "fp")
        .select($"doc_id", $"text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = newSnap.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rebuilt == want)
  }
}
