package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.{Ranking, Similarity}

/** Retrieval queries under the value gate: BM25 lexical ranking and
  * hybrid (lexical ∥ dense) reciprocal-rank fusion.
  *
  * q98: BM25-rank the documents table against a fixed query bag —
  *      one rare term ('dup') and three common ones, so the rational
  *      odds-IDF spread is what orders the result, not raw tf.
  * q99: fuse the exact-cosine top-50 (q30's ranking) with the
  *      int8-quantized top-50 (q93's ranking) by integer RRF — the
  *      hybrid-retrieval combiner, gated end-to-end including both
  *      candidate cuts.
  */
object Search {

  private val Bm25Terms = Seq("dup", "vector", "hash", "window")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25TopK = 50

  private val RrfCandidates = 50
  private val RrfK = 60
  private val RrfTopK = 30

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_bm25_rank" -> { (s, dir) =>
      Ranking.bm25Search(Tables.load(s, dir, "documents"), "doc_id", "text",
        Bm25Terms, Bm25K1, Bm25B, Bm25TopK)
    },

    "q99_hybrid_rrf" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val exact = Ranking.ranked(
        Similarity.bruteForceTopK(emb, queryVecId = 0L, k = RrfCandidates),
        "vec_id", "cos")
      val quant = Ranking.ranked(
        Similarity.topKQuantized(emb, queryVecId = 0L, k = RrfCandidates),
        "vec_id", "qcos")
      Ranking.rrfFuse(exact, quant, "vec_id", RrfK, RrfTopK)
    }
  )

  private val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
  private val bm25Score =
    Ranking.bm25TermScoreSql("f", "df", "dl", "n", "sdl", Bm25K1, Bm25B)
  private def contrib(rank: String) = Ranking.rrfContribSql(rank, RrfK)

  val oracleSql: Map[String, String] = Map(
    "q98_bm25_rank" ->
      s"""WITH dl AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(dl) AS BIGINT) AS sdl FROM dl),
         |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS f FROM w
         |       WHERE w IN ($termList) GROUP BY 1, 2),
         |dft AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |ts AS (SELECT tf.doc_id, $bm25Score AS term_score
         |       FROM tf JOIN dft USING (w) JOIN dl USING (doc_id) CROSS JOIN st)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |       CAST(sum(term_score) AS BIGINT) AS score
         |FROM ts GROUP BY 1 ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin,

    "q99_hybrid_rrf" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |d AS (SELECT e.vec_id,
         |    list_dot_product(e.v, qv.qv) AS dp,
         |    sqrt(list_dot_product(e.v, e.v)) AS nv,
         |    sqrt(list_dot_product(qv.qv, qv.qv)) AS nq
         |  FROM e, qv WHERE e.vec_id <> 0),
         |ex AS (SELECT vec_id, round(dp / (nv * nq), 4) AS cos FROM d
         |       ORDER BY round(dp / (nv * nq), 4) DESC, vec_id LIMIT $RrfCandidates),
         |ra AS (SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM ex),
         |m AS (SELECT vec_id, v,
         |    list_aggregate(list_transform(v, x -> abs(x)), 'max') AS mx
         |  FROM e),
         |qz AS (SELECT vec_id,
         |    CASE WHEN mx = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
         |         ELSE list_transform(v,
         |           x -> CAST(floor(x / (mx / 127.0) + 0.5) AS BIGINT)) END AS q
         |  FROM m),
         |qq AS (SELECT q AS qv FROM qz WHERE vec_id = 0),
         |dq AS (SELECT z.vec_id,
         |    list_dot_product(z.q, qq.qv) AS qd,
         |    list_dot_product(z.q, z.q) AS qaa,
         |    list_dot_product(qq.qv, qq.qv) AS qbb
         |  FROM qz z, qq WHERE z.vec_id <> 0),
         |qx AS (SELECT vec_id,
         |    round(qd / sqrt(CAST(qaa * qbb AS DOUBLE)), 4) AS qcos FROM dq
         |  ORDER BY round(qd / sqrt(CAST(qaa * qbb AS DOUBLE)), 4) DESC, vec_id
         |  LIMIT $RrfCandidates),
         |rb AS (SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY qcos DESC, vec_id) AS BIGINT) AS rnk
         |  FROM qx),
         |f AS (SELECT coalesce(ra.vec_id, rb.vec_id) AS vec_id,
         |        ra.rnk AS rank_a, rb.rnk AS rank_b,
         |        (coalesce(${contrib("ra.rnk")}, 0) +
         |         coalesce(${contrib("rb.rnk")}, 0)) AS rrf
         |      FROM ra FULL OUTER JOIN rb ON ra.vec_id = rb.vec_id)
         |SELECT vec_id, CAST(coalesce(rank_a, 0) AS BIGINT) AS rank_a,
         |       CAST(coalesce(rank_b, 0) AS BIGINT) AS rank_b,
         |       CAST(rrf AS BIGINT) AS rrf
         |FROM f ORDER BY rrf DESC, vec_id LIMIT $RrfTopK""".stripMargin
  )
}
