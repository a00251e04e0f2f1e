package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-4 corpus-curation operators: KMV sketch, PII redaction,
  * weighted sampling, repetition, contamination, boilerplate grams.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- KMV state algebra (pure JVM) ---

  test("KmvState keeps the k smallest distinct values, in order") {
    val s = Seq(0.9, 0.1, 0.5, 0.1, 0.3, 0.7, 0.2)
      .foldLeft(Sketches.KmvState(3, Array.emptyDoubleArray))(_ insert _)
    assert(s.values.toSeq == Seq(0.1, 0.2, 0.3))
  }

  test("KmvState merge is order-invariant and equals bulk insert") {
    val xs = (1 to 100).map(i => (i * 37 % 101) / 101.0)
    val (a, b) = xs.splitAt(40)
    def state(vs: Seq[Double]) =
      vs.foldLeft(Sketches.KmvState(8, Array.emptyDoubleArray))(_ insert _)
    val merged = state(a).merge(state(b))
    val mergedRev = state(b).merge(state(a))
    assert(merged.values.toSeq == state(xs).values.toSeq)
    assert(mergedRev.values.toSeq == merged.values.toSeq)
  }

  test("KmvState estimate is exact below saturation, textbook at k") {
    val small = Seq(0.4, 0.2).foldLeft(
      Sketches.KmvState(5, Array.emptyDoubleArray))(_ insert _)
    assert(small.estimate == 2.0)
    val sat = (1 to 10).map(_ / 10.0).foldLeft(
      Sketches.KmvState(5, Array.emptyDoubleArray))(_ insert _)
    assert(sat.estimate == 4 / 0.5) // (k-1)/kth-min = 4/0.5
  }

  // --- KMV as a Spark aggregation ---

  test("kmvDistinct is partitioning-invariant and near the true cardinality") {
    val n = 2000
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("g", "v")
      .withColumn("h", md5($"v".cast("string").cast("binary")))
      .withColumn("u", expr(Sampling.u01Spark("h")))
    def est(parts: Int): Double =
      df.repartition(parts).groupBy($"g")
        .agg(Sketches.kmvDistinct($"u", 64).as("e"))
        .select($"e").as[Double].head()
    val e1 = est(1)
    assert(e1 == est(7)) // merge path == single-partition path, bit-for-bit
    assert(math.abs(e1 - n) / n < 0.5, s"estimate $e1 too far from $n")
  }

  // --- PII redaction ---

  test("redactPii scrubs emails, phones and IPs with per-rule counts") {
    val df = Seq(
      ("reach me at bob@example.com or +1-555-123-4567", 1L),
      ("server 10.0.0.1 and alice.smith@corp.co.uk", 2L),
      ("no pii here", 3L)).toDF("text", "id")
    val out = TextAnalysis.redactPii(df, "text")
      .orderBy($"id")
      .select($"text_pii", $"text_n_email", $"text_n_phone", $"text_n_ipv4")
      .as[(String, Long, Long, Long)].collect()
    assert(out(0) == (("reach me at [EMAIL] or [PHONE]", 1L, 1L, 0L)))
    assert(out(1) == (("server [IPV4] and [EMAIL]", 1L, 0L, 1L)))
    assert(out(2) == (("no pii here", 0L, 0L, 0L)))
  }

  test("redactPattern counts and replaces every match") {
    val out = TextAnalysis.redactPattern(
        Seq("""{"k": 69, "j": 7}""").toDF("props"), "props", "[0-9]+", "#")
      .select($"props_redacted", $"props_n_redactions")
      .as[(String, Long)].head()
    assert(out == (("""{"k": #, "j": #}""", 2L)))
  }

  // --- weighted sampling ---

  test("weightedTopK is deterministic, bounded by k, and weight-sensitive") {
    // two strata; in "mix", heavy rows (w=50) vs light rows (w=1)
    val rows = (1 to 200).map { i =>
      val heavy = i % 2 == 0
      ("mix", i.toLong, if (heavy) 50L else 1L)
    } ++ (1 to 5).map(i => ("tiny", (1000 + i).toLong, 1L))
    val df = rows.toDF("source", "doc_id", "w")
    def pick(parts: Int) =
      Sampling.weightedTopK(df.repartition(parts), "source", "doc_id", "w", k = 10)
        .select($"source", $"doc_id").as[(String, Long)].collect().sorted.toSeq
    val a = pick(1)
    assert(a == pick(9)) // partitioning-invariant
    val mix = a.filter(_._1 == "mix").map(_._2)
    assert(mix.size == 10)
    assert(a.count(_._1 == "tiny") == 5) // stratum smaller than k keeps all
    // 50:1 weights should dominate the draw
    assert(mix.count(_ % 2 == 0) >= 8, s"heavy rows underdrawn: $mix")
  }

  test("weightedTopK excludes null and non-positive weights") {
    val df = Seq(("s", 1L, 5L), ("s", 2L, 0L), ("s", 3L, -1L))
      .toDF("source", "doc_id", "w")
      .union(Seq(("s", 4L)).toDF("source", "doc_id").withColumn("w", lit(null).cast("long")))
    val kept = Sampling.weightedTopK(df, "source", "doc_id", "w", k = 10)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  // --- repetition / contamination / boilerplate ---

  test("repetitionStats counts duplicate words per source") {
    val df = Seq(
      (1L, "a a a b", "s1"), (2L, "x y z", "s1"), (3L, "p p", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.repetitionStats(df)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // s1: doc1 n=4 d=2 dup=2; doc2 n=3 d=3 dup=0
    assert(out == Seq(("s1", 2L, 7L, 2L, 2L), ("s2", 1L, 2L, 1L, 1L)))
  }

  test("contaminationStats flags docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps", "bench"))
      .toDF("doc_id", "text", "source")
    val docs = Seq(
      (1L, "a tainted doc with the quick brown fox inside", "sA"),
      (2L, "completely clean words only here", "sA"),
      (3L, "quick brown fox again", "sB"),
      (4L, "so clean", "sB")) // < 3 words: can never be contaminated
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.contaminationStats(docs, bench, n = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("sA", 2L, 1L), ("sB", 2L, 1L)))
    // over the broadcast cap the semi join falls back to AQE's choice —
    // same answer, no unconditional driver-side materialization
    val shuffled = TextAnalysis
      .contaminationStats(docs, bench, n = 3, maxBroadcastGrams = 1L)
      .as[(String, Long, Long)].collect().toSeq
    assert(shuffled == out)
  }

  test("hotNgrams ranks grams by document frequency with stable ties") {
    val df = Seq(
      (1L, "common gram here and common gram here"),
      (2L, "common gram here elsewhere"),
      (3L, "common gram here too"),
      (4L, "unrelated words entirely")).toDF("doc_id", "text")
    val top = TextAnalysis.hotNgrams(df, n = 3, topK = 2)
      .as[(String, Long)].collect().toSeq
    assert(top.head == (("common gram here", 3L)))
    assert(top(1)._2 <= 3L)
  }

  // --- Gopher/C4-family rule-based quality gate ---

  test("gopherRules trips each rule independently with integer-exact math") {
    val df = Seq(
      // 10 words, mean len in range, 1 dup, stopwords {the, of}: passes
      (1L, "the cat sat of the mat with nine more word"),
      (2L, "too few words here"), // < 10 words
      // one 25-char junk word among 10
      (3L, "the of aa bb cc dd ee ff gg " + ("x" * 25)),
      // 10 words, no stopwords
      (4L, "cat dog fox hen owl pig ram sow yak elk"),
      // 7/10 words are "the": dup fraction 60% > 30%
      (5L, "the the the the the the the off aaa bbb")
    ).toDF("doc_id", "text").repartition(3)
    val out = TextAnalysis.gopherRules(df, minWords = 10).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)))
    assert(out(2L)._1 == false && out(2L)._6 == false)
    assert(out(3L) == ((true, true, true, true, false, false)))
    assert(out(4L)._4 == false && out(4L)._6 == false)
    assert(out(5L)._3 == false && out(5L)._6 == false)
  }

  test("gram-index novelty: append+probe ≡ rebuild ≡ inline restricted") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "c d e f"),          // history batch 1
      (3L, "a b c x"), (4L, "p q r"),            // history batch 2
      (5L, "a b c d"),                           // new: all grams old -> 0
      (6L, "p q r s"),                           // new: qrs, rs? -> pqr old, qrs new
      (7L, "m n o")                              // new: all new
    ).toDF("doc_id", "text")
    val inline = TextAnalysis.noveltyStats(docs)
      .filter(col("doc_id") >= 5L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val built = tempDir("graft_gram_idx_a")
    TextAnalysis.writeGramIndex(docs.filter(col("doc_id") <= 2L), built)
    TextAnalysis.appendGramIndex(
      docs.filter(col("doc_id") === 3L || col("doc_id") === 4L), built)
    val rebuilt = tempDir("graft_gram_idx_b")
    TextAnalysis.writeGramIndex(docs.filter(col("doc_id") <= 4L), rebuilt)
    def probe(p: String) = TextAnalysis.noveltyAgainstIndex(
        docs.filter(col("doc_id") >= 5L), p)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(probe(built) == inline)
    assert(probe(rebuilt) == inline)
    // appended index holds each gram once (the anti-join dedups)
    val grams = spark.read.parquet(built).select("sh").as[String].collect()
    assert(grams.length == grams.distinct.length)
    assert(inline.map(r => (r._1, r._3)) ==
      Seq((5L, 0L), (6L, 1L), (7L, 1L)))
  }

  test("noveltyStats credits each gram to its first doc in id order") {
    val df = Seq(
      (1L, "a b c d"),          // grams: abc, bcd — both novel
      (2L, "a b c e"),          // abc seen in 1, bce novel → 1/2
      (3L, "a b c d"),          // exact repeat of 1 → 0/2
      (4L, "x y"),              // < 3 words: no shingles, excluded
      (5L, "p q r s")           // pqr, qrs — all novel
    ).toDF("doc_id", "text").repartition(3)
    val out = TextAnalysis.noveltyStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> ((2L, 2L)), 2L -> ((2L, 1L)), 3L -> ((2L, 0L)),
      5L -> ((2L, 2L))))
  }
}
