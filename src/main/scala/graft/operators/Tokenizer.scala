package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Tokenizer training over a corpus: the distributed primitives of
  * byte-pair-encoding vocabulary construction.
  *
  * The 100 TB shape has two tiers, and keeping them apart is the whole
  * design: [[wordFreqs]] is the single corpus-scale pass (explode words
  * → one keyed shuffle) whose output is VOCABULARY-sized — Heaps' law
  * puts distinct words at ~K·N^0.5, so a 100 TB corpus reduces to a
  * table of maybe 10^8 rows. Everything iterative ([[bpeTrainMerges]])
  * then runs on that word-frequency table: each merge round is one
  * pair-count aggregation over vocab-sized data plus a one-row argmax
  * collect, never touching the corpus again. This mirrors how real
  * tokenizer training works (HuggingFace/SentencePiece pre-tokenize to
  * word counts, then train on the counts), re-expressed as Spark
  * aggregations instead of an in-memory hash map so the vocabulary
  * table itself can exceed one machine.
  *
  * Related reference surface: per-group text aggregation via
  * `grouped_aggregate` (`src/PhysicalStream.cpp` composition patterns);
  * the reference has no tokenizer, so this ring extends it the same way
  * the dedup/ANN operators do.
  */
object Tokenizer {

  /** Corpus word-frequency table — THE corpus-scale shuffle (one
    * explode + one keyed aggregation with map-side partial counts);
    * everything downstream operates on this vocabulary-sized result.
    * Words are space-split tokens, matching the other text operators.
    */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol-pair counts weighted by word frequency — one BPE
    * statistics round. `wordSymbols` must carry `freq` (long) and
    * `syms` (array&lt;string&gt;, the word's current symbol sequence).
    * Every adjacent position counts, so "aaa" contributes the pair
    * (a,a) twice — standard BPE statistics.
    */
  def pairCounts(wordSymbols: DataFrame): DataFrame =
    wordSymbols
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS left, syms[i + 1] AS right))")).as("p"))
      .select(col("freq"), col("p.left").as("left"), col("p.right").as("right"))
      .groupBy("left", "right")
      .agg(sum(col("freq")).as("pair_count"))

  /** Replace every adjacent (left, right) by the merged symbol,
    * left-to-right greedy — the standard BPE merge application. A UDF
    * is acceptable HERE because it runs over the vocabulary table, not
    * the corpus: the per-round work is vocab-sized by construction.
    */
  private def applyMerge(left: String, right: String): UserDefinedFunction =
    udf { (syms: Seq[String]) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
          out += left + right
          i += 2
        } else {
          out += syms(i)
          i += 1
        }
      }
      out.toSeq
    }

  /** Train `nMerges` BPE merges over the corpus: one corpus pass for
    * word frequencies, then one vocab-sized pair-count aggregation +
    * one-row argmax collect per round (ties broken lexicographically
    * for determinism, like the round ordering of real BPE trainers).
    * Returns the merge table (rank, left, right, merged, pair_count) —
    * the artifact a tokenizer ships.
    */
  def bpeTrainMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = wordFreqs(docs)
    var syms = wf.select(col("word"), col("freq"),
      expr("split(word, '')").as("syms"))
      .cache() // vocab-sized; each round re-reads it
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = pairCounts(syms)
        .orderBy(desc("pair_count"), asc("left"), asc("right"))
        .limit(1).collect() // ONE row crosses to the driver per round
      top.headOption match {
        case None => exhausted = true // no pairs left to merge
        case Some(Row(left: String, right: String, n: Long)) =>
          merges += ((rank, left, right, left + right, n))
          val next = syms.withColumn("syms",
            applyMerge(left, right)(col("syms"))).cache()
          next.count() // materialize before unpersisting the parent
          syms.unpersist()
          syms = next
          rank += 1
      }
    }
    syms.unpersist()
    merges.result().toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Segment each document's words with a trained merge table —
    * the apply side of BPE. Merges are applied in rank order
    * (standard BPE greedy application); the merge table is collected
    * to the driver and broadcast inside the UDF closure — it is the
    * trained artifact (thousands of rows), never corpus-scale data.
    */
  def bpeSegment(docs: DataFrame, mergeTable: DataFrame): DataFrame = {
    val ranked = mergeTable.select("rank", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val segment = udf { (word: String) =>
      var syms: Seq[String] = word.split("").toSeq.filter(_.nonEmpty)
      ranked.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("tokens", segment(col("word")))
  }
}
