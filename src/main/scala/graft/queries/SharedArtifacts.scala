package graft.queries

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.TextDedup

/** Process-scoped memoized artifacts shared by multiple gated queries.
  *
  * Several queries consume the SAME expensive intermediate: the
  * verified MinHash near-dup pairs feed q57 (cluster dedup apply),
  * q59 (cross-source matrix) and q75 (dup clusters), and the MinHash
  * signature index feeds q77's incremental probe. Recomputing the
  * most expensive dedup stage once per consumer triple-pays it in any
  * process that runs the whole suite (Verify, Bench), so each artifact
  * is materialized ONCE per (process, sf-dir) to a unique temp dir and
  * read back as columnar parquet afterwards.
  *
  * Design notes:
  *  - parquet + re-read (not `.cache()`): Verify/Bench clear the Spark
  *    cache between queries (the cache-hygiene contract), and a dirty
  *    cross-query cache would also change what the bench measures. A
  *    parquet artifact is exactly the shape a production pipeline
  *    would persist between stages.
  *  - unique per-process temp dirs (`Files.createTempDirectory`), so
  *    concurrent runs over the same sf-dir never collide, plus a
  *    shutdown hook that deletes everything this process created.
  *  - consumers must NOT rely on row order of the returned frame
  *    (parquet split order is not the write order); every gated
  *    consumer applies its own terminal orderBy.
  */
object SharedArtifacts {

  private val dirs = new ConcurrentHashMap[(String, String), String]()

  /** Verified MinHash+LSH near-dup pairs (doc_a, doc_b, jaccard) at
    * threshold 0.5 over the documents table — the q21 pair definition,
    * materialized once per process per sf-dir.
    */
  def lshPairs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(artifact(dir, "lsh_pairs") { path =>
      TextDedup.minhashLshPairs(Tables.load(s, dir, "documents"), threshold = 0.5)
        .write.mode("overwrite").parquet(path)
      Tables.releaseOperatorCaches(s) // release the operator's shingle-set cache
    })

  /** MinHash signature index over the doc_id < `splitAt` half of the
    * documents table — the persisted history a production ingest keeps
    * between batches. Built once per process per sf-dir; q77's timed
    * query is then the incremental probe the operator exists for.
    */
  def signatureIndexPath(s: SparkSession, dir: String, splitAt: Long): String =
    artifact(dir, s"sig_index_$splitAt") { path =>
      TextDedup.writeSignatureIndex(
        Tables.load(s, dir, "documents")
          .filter(org.apache.spark.sql.functions.col("doc_id") < splitAt), path)
    }

  /** IVF-flat index built on the vec_id < `splitAt` half of the
    * embeddings, then INCREMENTALLY extended with the other half via
    * [[graft.operators.IvfIndex.appendToIndex]] — the persisted state
    * of an ANN ingestion pipeline. Built once per process per sf-dir;
    * the gated query (q84) then probes every list, so the brute-force
    * oracle proves the appended rows landed in the right lists with
    * correct lineage.
    */
  def ivfAppendedIndexPath(s: SparkSession, dir: String, splitAt: Long,
                           nLists: Int = 8): String =
    artifact(dir, s"ivf_index_$splitAt") { path =>
      import org.apache.spark.sql.functions.col
      val emb = Tables.load(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") < splitAt)
      val centroids = graft.operators.IvfIndex.train(base, nLists)
      graft.operators.IvfIndex.writeIndex(base, centroids, path)
      graft.operators.IvfIndex.appendToIndex(
        emb.filter(col("vec_id") >= splitAt), path)
    }

  /** Quantized IVF-flat index over the whole embeddings table
    * ([[graft.operators.IvfIndex.writeQuantizedIndex]]): int8 payloads
    * inside the list-partitioned layout. Built once per process per
    * sf-dir; q110's timed query is then the probe itself — the shape a
    * production search serves from a standing index.
    */
  def ivfQuantizedIndexPath(s: SparkSession, dir: String,
                            nLists: Int = 8): String =
    artifact(dir, s"ivf_q8_$nLists") { path =>
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = graft.operators.IvfIndex.train(emb, nLists)
      graft.operators.IvfIndex.writeQuantizedIndex(emb, centroids, path)
    }

  /** IVFADC index over the whole embeddings table
    * ([[graft.operators.IvfIndex.writeAdcIndex]]): PQ codes inside the
    * list-partitioned layout — the last compression rung below q110's
    * int8. Built once per process per sf-dir; q122's timed query is
    * the ADC probe itself.
    */
  def ivfAdcIndexPath(s: SparkSession, dir: String, nLists: Int = 8,
                      m: Int = 8, kCode: Int = 16): String =
    artifact(dir, s"ivf_adc_${nLists}_${m}_$kCode") { path =>
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = graft.operators.IvfIndex.train(emb, nLists)
      graft.operators.IvfIndex.writeAdcIndex(emb, centroids, path, m, kCode)
    }

  /** RESIDUAL IVFADC index over the whole embeddings table
    * ([[graft.operators.IvfIndex.writeResidualAdcIndex]]): PQ codes of
    * the per-list residuals — the classical Jégou layout. Geometry is
    * the replayable seed convention (centroid `cid` = the embedding of
    * `vec_id` = cid, iters = 0) so the q123 oracle can re-derive the
    * whole index in SQL. Built once per process per sf-dir.
    */
  def ivfResidualAdcIndexPath(s: SparkSession, dir: String, nLists: Int = 8,
                              m: Int = 8, kCode: Int = 16): String =
    artifact(dir, s"ivf_radc_${nLists}_${m}_$kCode") { path =>
      import org.apache.spark.sql.functions.{col, transform}
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < nLists)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
      graft.operators.IvfIndex.writeResidualAdcIndex(emb, centroids, path, m, kCode)
    }

  /** IVF-flat index built ENTIRELY from raw text: hashing-trick
    * vectors (`TextVectors.featureHashVectors`) as the embedding
    * column, seed-doc centroids (cid = doc_id of the first `nLists`
    * docs, iters = 0 — the replayable geometry). Because hashed
    * entries are integers, assignment scores AND probe-selection
    * distances are exact integers, so q130 can gate the PRUNED probe
    * end-to-end — the one piece the embedding-side gates (q110/q122)
    * leave to specs. Built once per process per sf-dir.
    */
  def textIvfIndexPath(s: SparkSession, dir: String, nLists: Int = 8,
                       dim: Int = 256): String =
    artifact(dir, s"text_ivf_${nLists}_$dim") { path =>
      import org.apache.spark.sql.functions.{col, transform}
      // zero vectors (no words, or fully sign-cancelled) are
      // unsearchable — cosine against them is undefined — and would
      // desync the gate from the oracle's nonzero-entry norm table;
      // the index excludes them at build (integer-exact predicate)
      val emb = graft.operators.TextVectors.featureHashVectors(
          Tables.load(s, dir, "documents"), dim)
        .filter(org.apache.spark.sql.functions
          .expr("aggregate(fvec, 0L, (acc, x) -> acc + x * x) > 0L"))
        .select(col("doc_id").as("vec_id"), col("fvec").as("embedding"))
      val centroids = emb.filter(col("vec_id") < nLists)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
      graft.operators.IvfIndex.writeIndex(emb, centroids, path)
    }

  /** Persisted decontamination window index over the src0 benchmark
    * slice ([[graft.operators.TextDedup.writeSubstringIndex]], 40-char
    * windows) — built once per process per sf-dir; q139's timed query
    * is the ingest-batch probe the index exists for.
    */
  def substringIndexPath(s: SparkSession, dir: String,
                         windowChars: Int = 40): String =
    artifact(dir, s"substr_index_$windowChars") { path =>
      import org.apache.spark.sql.functions.col
      TextDedup.writeSubstringIndex(
        Tables.load(s, dir, "documents").filter(col("source") === "src0"),
        path, windowChars)
    }

  /** The 1000-round word-level BPE merge table over q109's training
    * slice (doc_id % 10 == 0), trained once per process per sf-dir —
    * the persisted vocabulary a production tokenizer trains once and
    * applies forever. q109's timed query is then the APPLY side it
    * exists to gate (training itself is gated by q105/q91).
    */
  def bpeMergeTablePath(s: SparkSession, dir: String, nMerges: Int): String =
    artifact(dir, s"bpe_merges_$nMerges") { path =>
      import org.apache.spark.sql.functions._
      val seqs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(expr("filter(split(text, ' '), w -> length(w) > 0)").as("syms"),
          lit(1L).as("freq"))
      graft.operators.Tokenizer.bpeTrainMergesOnSymbols(seqs, nMerges)
        .coalesce(1).write.mode("overwrite").parquet(path)
    }

  private def artifact(dir: String, kind: String)(build: String => Unit): String =
    dirs.computeIfAbsent((dir, kind), { _ =>
      val p = Files.createTempDirectory(s"graft_${kind}_")
      registerCleanup(p)
      build(p.toString)
      p.toString
    })

  private def registerCleanup(p: Path): Unit =
    sys.addShutdownHook {
      if (Files.exists(p)) {
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
}
