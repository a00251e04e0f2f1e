package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer training: pair statistics, the merge loop against a
  * hand-computed fixture, greedy application, and degenerate inputs.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts weights by word frequency and counts every adjacent position") {
    val wf = Seq(("aaa", 2L), ("ab", 3L), ("b", 5L))
      .toDF("word", "freq")
      .select($"word", $"freq", expr("split(word, '')").as("syms"))
    val pc = Tokenizer.pairCounts(wf)
      .orderBy($"left", $"right")
      .as[(String, String, Long)].collect().toSeq
    // "aaa" has TWO (a,a) positions ×freq 2 = 4; "ab" → (a,b) ×3;
    // single-symbol "b" contributes nothing
    assert(pc == Seq(("a", "a", 4L), ("a", "b", 3L)))
  }

  test("bpeTrainMerges reproduces the hand-computed merge sequence") {
    // classic BPE toy corpus: freq(low)=5, freq(lower)=2, freq(widest)=3
    val docs = Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrainMerges(docs, nMerges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // round 1: pairs lo=7, ow=7, we=2, er=2, wi=3, id=3, de=3, es=3,
    //          st=3 → tie lo/ow at 7 → lexicographic → (l,o) 7
    // round 2: "lo" merged → (lo,w)=5+2=7 wins
    // round 3: "low" merged → remaining (low,e)=2, (e,r)=2 and the
    //          five widest pairs at 3 → lexicographic among count-3:
    //          (d,e) < (e,s) < (i,d) < (s,t) < (w,i) → (d,e) 3
    assert(merges == Seq(
      (1, "l", "o", "lo", 7L),
      (2, "lo", "w", "low", 7L),
      (3, "d", "e", "de", 3L)))
  }

  test("bpeTrainMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrainMerges(docs, nMerges = 5).collect()
    assert(merges.isEmpty) // all words are single chars — nothing to merge
  }

  test("local and distributed merge loops produce identical tables") {
    // the real corpus at sf0.001, deep enough that merged symbols of
    // length 3+ participate in later rounds on both paths (the ≥50
    // round depth itself is hash-gated by q105 on the local path; the
    // distributed side runs ~2 Spark jobs per round, so the
    // equivalence assertion uses a suite-friendly depth)
    val docs = graft.Tables.load(spark, sf, "documents")
    val local = Tokenizer.bpeTrainMerges(docs, nMerges = 20)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val dist = Tokenizer.bpeTrainMerges(docs, nMerges = 20, maxLocalVocab = 0L)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(local.size == 20)
    assert(local == dist)
  }

  test("local trainer matches a naive full-recount reference implementation") {
    // independent algorithmic path: recount every pair from scratch
    // each round (no incremental counts, no posting lists)
    def naive(words: Seq[(Seq[String], Long)], nMerges: Int)
        : Seq[(Int, String, String, String, Long)] = {
      var syms = words.toArray
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      for (rank <- 1 to nMerges) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        syms.foreach { case (s, f) =>
          (0 until s.length - 1).foreach { i =>
            counts.update((s(i), s(i + 1)), counts.getOrElse((s(i), s(i + 1)), 0L) + f)
          }
        }
        if (counts.nonEmpty) {
          val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((rank, l, r, l + r, n))
          syms = syms.map { case (s, f) =>
            val m = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { m += l + r; i += 2 }
              else { m += s(i); i += 1 }
            }
            (m.toSeq, f)
          }
        }
      }
      out.result()
    }
    val words = Array(
      ("banana".split("").toSeq, 4L), ("bandana".split("").toSeq, 3L),
      ("ananas".split("").toSeq, 2L), ("cabana".split("").toSeq, 5L),
      ("nab".split("").toSeq, 7L), ("an".split("").toSeq, 11L))
    val got = Tokenizer.trainMergesLocal(words, nMerges = 12)
    assert(got == naive(words.toSeq, 12))
  }

  test("rank-map applier ≡ rank-order scan applier on trained tables") {
    // the fast applier (merge the lowest-ranked PRESENT pair until
    // none is in the table) must equal the old one-pass-per-merge scan
    // on any TRAINED table — char-level over the real corpus, every
    // distinct word, at a depth where multi-char symbols join later
    // merges. Also pins the old scan path as the executable spec.
    val docs = graft.Tables.load(spark, sf, "documents")
    val table = Tokenizer.bpeTrainMerges(docs, nMerges = 60)
    val rows = table.select("rank", "left", "right").collect()
    val ranked = rows.sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    val rankOf = new java.util.HashMap[(String, String), Integer]
    rows.foreach(r => rankOf.put((r.getString(1), r.getString(2)), r.getInt(0)))
    val words = Tokenizer.wordFreqs(docs).select("word").as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(Tokenizer.segmentWord(w, rankOf) == Tokenizer.segmentWordRankScan(w, ranked),
        s"appliers diverge on '$w'")
    }
    // ... and a padded table (100k never-matching entries at ranks past
    // the trained ones) must not change the output: per-word work only
    // touches pairs actually present in the word
    val padded = new java.util.HashMap[(String, String), Integer](rankOf)
    (0 until 100000).foreach(i => padded.put((s"x$i", s"y$i"), 1000 + i))
    words.take(50).foreach { w =>
      assert(Tokenizer.segmentWord(w, padded) == Tokenizer.segmentWord(w, rankOf))
    }
  }

  test("word-level symbols: applier equivalence on a deep trained table") {
    // the q109 shape — symbols are WORDS, one sequence per document,
    // trained far past the char-level ceiling; both appliers must
    // agree on every sequence
    val seqs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", expr("filter(split(text, ' '), w -> length(w) > 0)").as("syms"))
    val table = Tokenizer.bpeTrainMergesOnSymbols(
      seqs.select($"syms", lit(1L).as("freq")), nMerges = 300)
    val rows = table.select("rank", "left", "right").collect()
    assert(rows.length == 300, s"expected 300 trained merges, got ${rows.length}")
    val ranked = rows.sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    val rankOf = new java.util.HashMap[(String, String), Integer]
    rows.foreach(r => rankOf.put((r.getString(1), r.getString(2)), r.getInt(0)))
    seqs.select("syms").as[Seq[String]].collect().foreach { s0 =>
      var s: Seq[String] = s0
      ranked.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
          else { out += s(i); i += 1 }
        }
        s = out.toSeq
      }
      assert(Tokenizer.segmentSyms(s0, rankOf) == s)
    }
  }

  test("bpeSegment applies merges in rank order, greedily left-to-right") {
    val docs = Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val table = Tokenizer.bpeTrainMerges(docs, nMerges = 2) // lo, low
    val segs = Tokenizer.bpeSegment(docs, table)
      .select($"word", $"tokens").distinct()
      .as[(String, Seq[String])].collect().toMap
    assert(segs("low") == Seq("low"))
    assert(segs("lower") == Seq("low", "e", "r"))
    assert(segs("widest") == Seq("w", "i", "d", "e", "s", "t"))
  }
}
