package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick text featurization — the text→vector bridge that
  * needs no trained embedding model (Weinberger et al., ICML 2009;
  * the standard first rung of similarity search over a corpus whose
  * embeddings haven't been computed yet).
  *
  * Reference anchor: the reference's client-side featurization
  * patterns ship words to an external child (`py_pkg/examples`);
  * here the whole vectorization is ONE narrow codegen'd kernel pass
  * (`graft_fhash`) next to the scan — no word explode, no
  * (doc, bucket) shuffle, nothing leaves the executor until the
  * already-tiny vectors do. Entries are signed integer counts, so
  * every downstream dot product is exact (and the DuckDB oracles
  * replay vectors, norms and cosines bit-for-bit from md5 hex).
  *
  * At 100 TB: featurization is embarrassingly parallel (narrow), the
  * per-doc payload is `dim` longs (sparse-exploded, far less), and the
  * output feeds the SAME ANN stack as real embeddings — brute top-k,
  * hyperplane LSH, IVF, semantic dedup — unchanged.
  */
object TextVectors {

  /** (doc_id, fvec: array<long>[dim]) — dense signed bucket counts. */
  def featureHashVectors(docs: DataFrame, dim: Int = 256): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      call_function("graft_fhash", col("text"), lit(dim)).as("fvec"))
  }

  /** Sparse (doc_id, bucket, w) rows — the nonzero entries only, the
    * shape a 100 TB corpus would persist (most buckets are empty at
    * large `dim`).
    */
  def sparseEntries(docs: DataFrame, dim: Int = 256): DataFrame =
    featureHashVectors(docs, dim)
      .select(col("doc_id"), posexplode(col("fvec")).as(Seq("bucket", "w")))
      .filter(col("w") =!= 0L)

  /** Document clustering straight from raw text — no embedding model,
    * no float drift: every document's hashed vector is assigned to the
    * nearest of the `seedDocIds` documents' hashed vectors by squared
    * L2 (the q112/q113 seeded-Voronoi convention). Because hashed
    * entries are integers, the assignment score `‖c‖² − 2·v·c` is an
    * EXACT integer — the whole clustering replays bit-for-bit on any
    * engine, which no float-embedding k-means can claim. One narrow
    * kernel pass + a broadcast-sized seed literal; returns
    * (doc_id, cluster_id, score, cluster_n).
    */
  def clusterAssign(docs: DataFrame, seedDocIds: Seq[Long],
                    dim: Int = 256): DataFrame = {
    require(seedDocIds.nonEmpty, "need at least one seed doc")
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val fvd = featureHashVectors(docs, dim)
      .select(col("doc_id"), transform(col("fvec"), x => x.cast("double")).as("v"))
    val seeds = fvd.filter(col("doc_id").isin(seedDocIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    require(seeds.size == seedDocIds.size,
      s"missing seed docs: ${seedDocIds.filterNot(seeds.contains).mkString(",")}")
    // cluster id = POSITION in seedDocIds (the q112 convention: caller
    // order defines the geometry); ties to the smallest cid
    val scored = seedDocIds.zipWithIndex.map { case (sid, cid) =>
      val c = seeds(sid)
      val cNorm = c.map(x => x * x).sum
      struct((lit(cNorm) -
        lit(2.0) * call_function("graft_dot", col("v"), typedLit(c))).as("score"),
        lit(cid).as("cid"))
    }
    val byCluster = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    fvd.withColumn("best", array_min(array(scored: _*)))
      .select(col("doc_id"),
        col("best.cid").cast("long").as("cluster_id"),
        col("best.score").cast("long").as("score"))
      .withColumn("cluster_n", count(lit(1)).over(byCluster))
  }

  /** Top-k documents by hashed-vector cosine to `queryDocId` — the
    * embedding-free kNN. Every dot product and norm is an exact
    * integer (entries are ±counts, |v|² < 2^53), so the ranking is
    * bit-reproducible cross-engine; only the final cosine division is
    * floating point, rounded to the shared 4-decimal currency. One
    * narrow kernel pass + a top-k — no corpus self-join. Zero-norm
    * documents (no words, or fully sign-cancelled) are excluded on
    * both engine and oracle sides.
    */
  def hashedKnn(docs: DataFrame, queryDocId: Long, dim: Int = 256,
                k: Int = 20): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val fvd = featureHashVectors(docs, dim)
      .select(col("doc_id"), transform(col("fvec"), x => x.cast("double")).as("v"))
    val qRows = fvd.filter(col("doc_id") === queryDocId)
      .select(col("v")).limit(1).collect()
    require(qRows.nonEmpty, s"hashedKnn: query doc $queryDocId not found")
    val q = qRows(0).getSeq[Double](0)
    val qn = math.sqrt(q.map(x => x * x).sum)
    require(qn > 0.0, s"query doc $queryDocId has a zero hashed vector")
    val qLit = typedLit(q)
    fvd.filter(col("doc_id") =!= queryDocId)
      .select(col("doc_id"),
        call_function("graft_dot", col("v"), qLit).as("dot"),
        call_function("graft_dot", col("v"), col("v")).as("nn"))
      .filter(col("nn") > 0.0)
      .select(col("doc_id"),
        round(col("dot") / (sqrt(col("nn")) * lit(qn)), 4).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc)
      .limit(k)
  }
}
