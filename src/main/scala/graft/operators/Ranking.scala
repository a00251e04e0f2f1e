package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-relevance ranking: BM25 full-text scoring and reciprocal-rank
  * fusion — the retrieval stages of a curation pipeline (rank a corpus
  * against a reference query for quality selection, fuse a lexical and
  * a dense ranking into one review queue, the standard hybrid-search
  * combiner).
  *
  * Reference anchor: the host-DB scalar-function + grouped_aggregate
  * surface (reference `src/PhysicalOperators.cpp` apply/grouped
  * aggregate) — relevance scoring is the same shape with corpus-level
  * statistics joined in.
  *
  * Engine-portability: BM25's usual `ln` IDF is NOT cross-engine
  * bit-stable (libm differs), so the scorer uses the rational
  * odds-form IDF `(N - df + 0.5) / (df + 0.5)` — the quantity BM25
  * takes the log OF — leaving the whole score inside +,*,/ on
  * doubles, which ARE IEEE-correctly-rounded identically everywhere.
  * Scores are floor-quantized to integers per (doc, term) BEFORE the
  * per-doc sum, so the aggregation is order-free and the final rank
  * hash-matches a DuckDB replay exactly (the q30/q92/q93 parity
  * rules). Monotonicity vs classic BM25 is preserved per term
  * (x ↦ ln x is monotone), which is all a rank needs.
  */
object Ranking {

  /** The integer BM25 term score as a SQL fragment valid in BOTH Spark
    * SQL and DuckDB (CAST/floor/arithmetic only), kept textually
    * identical so the float evaluation order can never drift between
    * operator and oracle. `f`/`df`/`dl`/`n`/`sdl` name integer columns:
    * term frequency in the doc, the term's document frequency, the
    * doc's word length, corpus doc count, and summed word length.
    */
  def bm25TermScoreSql(f: String, df: String, dl: String,
                       n: String, sdl: String,
                       k1: Double, b: Double): String = {
    val avgdl = s"(CAST($sdl AS DOUBLE) / CAST($n AS DOUBLE))"
    val idf = s"((CAST($n - $df AS DOUBLE) + 0.5) / (CAST($df AS DOUBLE) + 0.5))"
    val satNum = s"(CAST($f AS DOUBLE) * ${k1 + 1.0})"
    val satDen = s"(CAST($f AS DOUBLE) + $k1 * ((1.0 - $b) + $b * (CAST($dl AS DOUBLE) / $avgdl)))"
    s"CAST(floor(1000000.0 * $idf * $satNum / $satDen) AS BIGINT)"
  }

  /** BM25-rank `docs` against a literal bag of query terms, returning
    * the `topK` (doc_id, n_terms, score) rows by descending integer
    * score (doc_id tiebreak).
    *
    * 100 TB shape: the exploded word stream is filtered to the query
    * terms BEFORE any shuffle (output ∝ term matches, not corpus
    * size), document frequencies are a term-count-sized broadcast, the
    * corpus stats are a 1-row broadcast, and the only wide exchange is
    * the (doc, term) aggregation plus one doc_id join against the
    * narrow length projection — no corpus-wide sort, no driver-side
    * data.
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                 topK: Int = 50): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one query term")
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("f"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("term_score",
        expr(bm25TermScoreSql("f", "df", "dl", "n", "sdl", k1, b)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** The integer RRF contribution of a rank column — again one SQL
    * string for both engines: floor(1e9 / (kRrf + rank)).
    */
  def rrfContribSql(rank: String, kRrf: Int): String =
    s"CAST(floor(1000000000.0 / ($kRrf.0 + CAST($rank AS DOUBLE))) AS BIGINT)"

  /** Reciprocal-rank fusion of two (id, rank) lists: full outer join
    * on the id, each side contributing floor(1e9/(k+rank)) (0 when the
    * id is absent from that list), summed as exact integers — the
    * standard hybrid-retrieval combiner, order-free and engine-exact.
    * Both inputs are top-N candidate lists (bounded), so every stage
    * here is candidate-sized regardless of corpus scale.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              kRrf: Int = 60, topK: Int = 30): DataFrame = {
    val left = a.select(col(idCol), col("rnk").as("rank_a"))
    val right = b.select(col(idCol), col("rnk").as("rank_b"))
    left.join(right, Seq(idCol), "full_outer")
      // contributions first, on the still-nullable ranks (absent side
      // -> NULL -> 0), THEN the 0-sentinel rank columns for output
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (coalesce(expr(rrfContribSql("rank_a", kRrf)), lit(0L)) +
          coalesce(expr(rrfContribSql("rank_b", kRrf)), lit(0L))).as("rrf"))
      .select(col(idCol),
        coalesce(col("rank_a"), lit(0L)).cast("long").as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).cast("long").as("rank_b"),
        col("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Attach a 1-based `rnk` column by (`scoreCol` desc, `idCol` asc).
    * Single-partition window by design: callers rank POST-candidate-cut
    * lists (top-N from a retrieval stage), never a corpus.
    */
  def ranked(list: DataFrame, idCol: String, scoreCol: String): DataFrame =
    list.withColumn("rnk",
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc)).cast("long"))
}
