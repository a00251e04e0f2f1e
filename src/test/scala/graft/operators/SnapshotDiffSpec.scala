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

  test("delta probes the standing MinHash index: only delta docs dedup") {
    // 20-word docs so trigram shingles exist; each doc's words are
    // disjoint from every other doc's
    def words(i: Long) = (0 until 20).map(j => s"t${i}_$j").mkString(" ")
    val old = (1L to 10L).map(i => (i, words(i))).toDF("doc_id", "text")
    // doc 3 edited (one appended token), doc 4 removed, doc 7
    // re-added verbatim under an offset id
    val nw = ((1L to 10L).filter(_ != 4L)
      .map(i => (i, if (i == 3L) words(i) + " v2" else words(i))) :+
      (107L, words(7L))).toDF("doc_id", "text")
    val idx = tempDir("graft_snapdiff_idx")
    TextDedup.writeSignatureIndex(old, idx)
    val delta = SnapshotDiff.delta(fp(old), fp(nw), "doc_id", "fp")
      .select($"doc_id", $"text")
    val hits = TextDedup.nearDupsAgainstIndex(delta, idx, threshold = 0.8)
      .select($"doc_id", $"dup_of", $"jaccard")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // the edited doc matches its own prior version (18 of 19 trigrams
    // shared -> 18/19), the re-add matches its origin exactly; nothing
    // else reaches the index probe because nothing else is in the delta
    assert(hits.map(h => (h._1, h._2)) == Seq((3L, 3L), (107L, 7L)))
    assert(hits.find(_._1 == 107L).get._3 == 1.0)
    val edited = hits.find(_._1 == 3L).get._3
    assert(edited > 0.94 && edited < 0.96)
  }

  test("column-collision guards: status on newDf, reserved key names") {
    val old = Seq((1L, "a")).toDF("doc_id", "fp")
    val nw = Seq((1L, "b", "x")).toDF("doc_id", "fp", "status")
    // delta joins the diff's status onto newDf — a pre-existing status
    // column must fail loudly, not end ambiguous or silently doubled
    assert(intercept[IllegalArgumentException] {
      SnapshotDiff.delta(old, nw, "doc_id", "fp")
    }.getMessage.contains("status"))
    // a key named like a diff output column would duplicate names
    val bad = Seq(("k", "a")).toDF("status", "fp")
    assert(intercept[IllegalArgumentException] {
      SnapshotDiff.diff(bad, bad, "status", "fp")
    }.getMessage.contains("status"))
  }
}
