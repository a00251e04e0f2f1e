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

  /** Distinct-gram index over the doc_id < `splitAt` history of the
    * documents table, built on doc_id < `buildAt` and then extended
    * with [`buildAt`, `splitAt`) via the O(batch) append — so the
    * gated probe (q151) exercises BOTH maintenance paths, exactly
    * like [[ivfAppendedIndexPath]].
    */
  def gramIndexPath(s: SparkSession, dir: String, buildAt: Long,
                    splitAt: Long): String =
    artifact(dir, s"gram_index_${buildAt}_$splitAt") { path =>
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, dir, "documents")
      graft.operators.TextAnalysis.writeGramIndex(
        docs.filter(col("doc_id") < buildAt), path)
      graft.operators.TextAnalysis.appendGramIndex(
        docs.filter(col("doc_id") >= buildAt && col("doc_id") < splitAt), path)
    }

  /** Standing 64-bit media-signature index (q161): image aHash
    * signatures of the decodable docs with doc_id < `buildAt`, then
    * extended with [`buildAt`, `splitAt`) via the O(batch) append —
    * the probe gate exercises build, append AND probe, like
    * [[gramIndexPath]].
    */
  def hashIndexPath(s: SparkSession, dir: String, buildAt: Long,
                    splitAt: Long): String =
    artifact(dir, s"hash_index_${buildAt}_$splitAt") { path =>
      import org.apache.spark.sql.functions.col
      def sigs(lo: Long, hi: Long) = graft.operators.Multimodal
        .imageAHash(mediaFixture(s, dir, "pgm"), "blob")
        .filter(col("ahash").isNotNull)
        .filter(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), col("ahash").as("simhash"))
      graft.operators.TextDedup.writeHashIndex(sigs(Long.MinValue, buildAt), path)
      graft.operators.TextDedup.appendToHashIndex(sigs(buildAt, splitAt), path)
    }

  /** Standing normalized-hash index (q175): canonical-form hashes of
    * the doc_id < `buildAt` history, extended with [`buildAt`,
    * `splitAt`) via the O(batch) append — the exact-dedup analogue of
    * [[hashIndexPath]], so the probe gate covers build, append AND
    * probe.
    */
  def normHashIndexPath(s: SparkSession, dir: String, buildAt: Long,
                        splitAt: Long): String =
    artifact(dir, s"norm_hash_index_${buildAt}_$splitAt") { path =>
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, dir, "documents")
      TextDedup.writeNormHashIndex(docs.filter(col("doc_id") < buildAt), path)
      TextDedup.appendToNormHashIndex(
        docs.filter(col("doc_id") >= buildAt && col("doc_id") < splitAt),
        path)
    }

  /** Standing CDC chunk-hash index (q163): chunk occurrences of the
    * doc_id < `buildAt` history, extended with [`buildAt`, `splitAt`)
    * via the O(batch) append — the sub-document analogue of
    * [[gramIndexPath]]/[[hashIndexPath]], so the probe gate covers
    * build, append AND probe.
    */
  def cdcChunkIndexPath(s: SparkSession, dir: String, buildAt: Long,
                        splitAt: Long, w: Int, d: Int): String =
    artifact(dir, s"cdc_index_${buildAt}_${splitAt}_${w}_$d") { path =>
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, dir, "documents")
      TextDedup.writeChunkIndex(docs.filter(col("doc_id") < buildAt),
        path, w, d)
      TextDedup.appendToChunkIndex(
        docs.filter(col("doc_id") >= buildAt && col("doc_id") < splitAt),
        path, w, d)
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

  /** IVF-flat index over the whole embeddings table with the
    * replayable SEED geometry (centroid cid = the embedding of
    * vec_id = cid, iters = 0 — the q112/q130 convention) — the
    * standing history state of the semantic ingest-dedup pipeline;
    * q178's timed query is the per-batch probe the index exists for.
    * Built once per process per sf-dir.
    */
  def ivfSeedIndexPath(s: SparkSession, dir: String, nLists: Int = 4): String =
    artifact(dir, s"ivf_seed_$nLists") { path =>
      graft.operators.IvfIndex.writeIndex(
        Tables.load(s, dir, "embeddings"), seedCentroids(s, dir, 0L, nLists),
        path)
    }

  /** Replayable seed centroids: cid i = the (double-cast) embedding of
    * vec_id `from + i` — the q112/q130 convention, shared by the
    * seed-geometry index artifacts.
    */
  private def seedCentroids(s: SparkSession, dir: String, from: Long,
                            n: Int): Seq[(Int, Seq[Double])] = {
    import org.apache.spark.sql.functions.{col, transform}
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") >= from && col("vec_id") < from + n)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toSeq) }.toSeq
  }

  /** VERSIONED standing IVF index taken through the full lifecycle the
    * layout exists for (q180): v0 built with the seed-0..3 geometry
    * (exactly [[ivfSeedIndexPath]]'s), then RETRAINED around the
    * vectors of vec_id 4..7 — a genuinely different, still replayable
    * geometry — into v1 with the atomic pointer flip
    * ([[graft.operators.IvfIndex.retrainIndexVersionWith]]). The gated
    * probe resolves the pointer, so it proves build, retrain, flip and
    * probe-of-current end-to-end; probing the OLD version during the
    * rebuild is pinned by SemanticDedupSpec (the spec can hold both
    * versions open, the gate cannot).
    */
  def ivfVersionedIndexPath(s: SparkSession, dir: String): String =
    artifact(dir, "ivf_versioned") { path =>
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.IvfIndex.writeVersionedIndex(
        emb, seedCentroids(s, dir, 0L, 4), path)
      graft.operators.IvfIndex.retrainIndexVersionWith(
        s, path, seedCentroids(s, dir, 4L, 4))
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

  /** Versioned MULTI-EVAL-SET decontamination window index
    * ([[graft.operators.TextDedup.writeSubstringIndexSets]]): src0 as
    * eval set 0 and src1 as eval set 1, built through the full
    * lifecycle the layout exists for — v0 from set 0 plus HALF of set
    * 1, an O(batch) append of set 1's other half, then a compaction
    * into v1 with the atomic pointer flip. q142's timed query probes
    * the resulting current version, so the gate covers the versioned
    * layout end-to-end (append dedup, partition pruning by
    * eval_set_id, pointer read), not just a fresh build.
    */
  def substringIndexSetsPath(s: SparkSession, dir: String,
                             windowChars: Int = 40): String =
    artifact(dir, s"substr_sets_$windowChars") { path =>
      import org.apache.spark.sql.functions.{col, lit, when}
      val docs = Tables.load(s, dir, "documents")
      val initial = docs
        .filter(col("source") === "src0" ||
          (col("source") === "src1" && col("doc_id") % 2 === 0))
        .withColumn("eval_set_id",
          when(col("source") === "src0", lit(0)).otherwise(lit(1)))
      TextDedup.writeSubstringIndexSets(initial, path, windowChars)
      TextDedup.appendToSubstringIndexSets(
        docs.filter(col("source") === "src1" && col("doc_id") % 2 =!= 0),
        evalSetId = 1, path, windowChars)
      TextDedup.compactSubstringIndexSets(s, path)
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

  /** Integer-trained PQ codebook (`IvfIndex.trainPqCodebooksInt`) over
    * the embeddings table, memoized per (process, sf-dir, shape) —
    * codebook training is an offline index-build cost a production
    * deployment pays once (the BPE-merge-table discipline, q109), so
    * the gated query (q165) times the ASSIGNMENT pass it exists to
    * gate, not a re-train per run. The value is deterministic, so
    * memoization cannot change any gate result.
    */
  private val codebooks =
    new ConcurrentHashMap[(String, Int, Int, Int), (Double, Seq[Double])]()

  def pqIntCodebook(s: SparkSession, dir: String, m: Int, kCode: Int,
                    rounds: Int): (Double, Seq[Double]) =
    codebooks.computeIfAbsent((dir, m, kCode, rounds), { _ =>
      graft.operators.IvfIndex.trainPqCodebooksInt(
        Tables.load(s, dir, "embeddings"), m, kCode, rounds)
    })

  /** Packed media fixture blobs `(doc_id, blob)` for the codec and
    * perceptual-hash gates (q51/q80/q85/q88/q90/q106/q111/q135-q138,
    * q141): each document's text deterministically packed into a GRFT
    * container of the given `kind` — `grft` (header round-trip), `pgm`,
    * `bmp`, `png`, `jpeg`, `wav`, `avi` — with every 97th doc corrupted
    * to an undecodable stub. Fixture SYNTHESIS is not the operator
    * under test (in production, media arrives as stored bytes), so it
    * runs once per (process, sf-dir, kind) and the gated queries read
    * the columnar artifact — the benched media paths contain zero
    * fixture UDFs.
    */
  /** Every fixture kind, packed in ONE pass over the documents table —
    * a full run consumes all seven kinds, and the old one-artifact-per-
    * kind shape paid seven corpus scan+pack passes of cold-pass time.
    * The packed frame is cached for the duration of the build only, so
    * the seven per-kind writes read it from memory; each kind still
    * lands in its OWN single-blob-column parquet (measured: a combined
    * 7-blob-column file costs every per-kind reader ~0.05-0.15 s per
    * run in footer/row-group overhead — the per-kind files keep the
    * read path byte-identical to the old layout). Blob bytes per
    * (doc, kind) are unchanged (same pack UDFs, same rows).
    */
  private val MediaKinds =
    Seq("grft", "pgm", "bmp", "png", "jpeg", "wav", "avi")

  def mediaFixture(s: SparkSession, dir: String, kind: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(MediaKinds.contains(kind), s"unknown media fixture kind: $kind")
    val root = artifact(dir, "media_all") { path =>
      val packed = Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id") +: MediaKinds.map(k =>
          MediaFixtures.pack(k)(col("doc_id"), col("text"))
            .as(s"blob_$k")): _*)
        .cache()
      try MediaKinds.foreach { k =>
        packed.select(col("doc_id"), col(s"blob_$k").as("blob"))
          .write.mode("overwrite").parquet(s"$path/$k")
      } finally packed.unpersist(blocking = false)
    }
    s.read.parquet(s"$root/$kind")
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

/** The per-kind media fixture pack functions — text bytes →
  * deterministic media payloads inside GRFT containers. The byte-level
  * contract each oracle replays lives with the consuming query's
  * comment; the shared invariants live here:
  *  - every 97th doc packs as an undecodable stub (the corrupt-media
  *    degradation path every codec gate proves);
  *  - oracle `substr()` CHARACTER positions equal these byte offsets
  *    only for pure-ASCII text, and the GRFT header's u16 width caps at
  *    65535 — [[MediaFixtures.asciiBytes]] fails loudly if a future
  *    corpus breaks either assumption rather than silently diverging.
  */
private[queries] object MediaFixtures {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udf
  import graft.operators.Multimodal
  import graft.functions.GrftCodec

  def pack(kind: String): UserDefinedFunction = kinds(kind)

  private def asciiBytes(kind: String, id: Long, text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    require(bytes.length == text.length && bytes.length <= 65535,
      s"$kind fixture assumes ASCII text <= 65535 bytes; doc $id has " +
        s"${text.length} chars / ${bytes.length} bytes")
    bytes
  }

  private val kinds: Map[String, UserDefinedFunction] = Map(
    // GRFT container with the raw text payload, header fields derived
    // from id/length; corrupt = a 3-byte stub too short for a header
    "grft" -> udf { (id: Long, text: String) =>
      val payload = text.getBytes("UTF-8")
      if (id % 97 == 0) payload.take(3)
      else Multimodal.pack(
        payload.length % 256, payload.length / 256 % 256,
        1 + (id % 3).toInt, (id % 3).toInt, payload)
    },
    // 1-row grayscale PGM: text bytes as pixels
    "pgm" -> udf { (id: Long, text: String) =>
      val bytes = asciiBytes("pgm", id, text)
      if (id % 97 == 0) "not an image".getBytes("UTF-8")
      else Multimodal.pack(bytes.length, 1, 1, 0,
        GrftCodec.pnmEncode(bytes.length, 1, 1, bytes))
    },
    // w×1 24-bit BI_RGB BMP with gray (b,b,b) pixels
    "bmp" -> udf { (id: Long, text: String) =>
      val bytes = asciiBytes("bmp", id, text)
      if (id % 97 == 0) "not a bitmap".getBytes("UTF-8")
      else {
        val rgb = new Array[Byte](bytes.length * 3)
        var i = 0
        while (i < bytes.length) {
          rgb(3 * i) = bytes(i); rgb(3 * i + 1) = bytes(i)
          rgb(3 * i + 2) = bytes(i); i += 1
        }
        Multimodal.pack(bytes.length, 1, 3, 0,
          GrftCodec.bmpEncode(bytes.length, 1, rgb))
      }
    },
    // 1-row grayscale PNG, scanline filter type doc_id % 5 (so the
    // decoder gate exercises None/Sub/Up/Average/Paeth)
    "png" -> udf { (id: Long, text: String) =>
      val bytes = asciiBytes("png", id, text)
      if (id % 97 == 0) "not a png".getBytes("UTF-8")
      else Multimodal.pack(bytes.length, 1, 1, 0,
        GrftCodec.pngEncode(bytes.length, 1, 1, bytes, (id % 5).toInt))
    },
    // 128×8 grayscale baseline JPEG: 16 constant 8×8 blocks at quality
    // 100 (all-ones quant tables) so decode is bit-exact
    "jpeg" -> udf { (id: Long, text: String) =>
      val bytes = asciiBytes("jpeg", id, text)
      if (id % 97 == 0) "not a jpeg".getBytes("UTF-8")
      else {
        val n = bytes.length
        val px = new Array[Byte](128 * 8)
        var b = 0
        while (b < 16) {
          val v = bytes(b * n / 16)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { px(y * 128 + b * 8 + x) = v; x += 1 }
            y += 1
          }
          b += 1
        }
        Multimodal.pack(128, 8, 1, 0,
          GrftCodec.jpegEncode(128, 8, 1, px, quality = 100))
      }
    },
    // mono 16-bit RIFF/WAVE, centered samples (b−128)·256
    "wav" -> udf { (id: Long, text: String) =>
      val bytes = asciiBytes("wav", id, text)
      if (id % 97 == 0) "not a wave".getBytes("UTF-8")
      else {
        val samples = new Array[Short](bytes.length)
        var i = 0
        while (i < bytes.length) {
          samples(i) = (((bytes(i) & 0xff) - 128) * 256).toShort; i += 1
        }
        Multimodal.pack(bytes.length, 1, 1, 1,
          GrftCodec.wavEncode(8000, 1, samples))
      }
    },
    // 4-frame n×1 RGB AVI, frame f's pixel x = the gray byte at
    // (x+f) mod n; EMPTY docs — which aviEncode would reject while the
    // oracles' `n >= 1` filters null out — pack as stubs too
    "avi" -> udf { (id: Long, text: String) =>
      val bytes = asciiBytes("avi", id, text)
      if (id % 97 == 0 || bytes.isEmpty) "not a video".getBytes("UTF-8")
      else {
        val n = bytes.length
        val frames = Array.tabulate(4) { f =>
          val rgb = new Array[Byte](n * 3)
          var x = 0
          while (x < n) {
            val b = bytes((x + f) % n)
            rgb(3 * x) = b; rgb(3 * x + 1) = b; rgb(3 * x + 2) = b
            x += 1
          }
          rgb
        }
        Multimodal.pack(n, 1, 3, 2,
          GrftCodec.aviEncode(n, 1, 40000, frames))
      }
    }
  )
}
