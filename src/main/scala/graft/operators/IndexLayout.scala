package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed parquet layout for STANDING ingest indexes (r15
  * verdict directive 1): every index a per-batch probe reads
  * (chunk-hash q163, 64-bit media hash q161, MinHash signatures
  * q150/q77, substring windows q139/q142, norm-hash q175) is written
  * `partitionBy(bucket)` with `bucket = pmod(xxhash64(key), B)`, and
  * the probe prunes its scan to the buckets — and, when the batch's
  * key set is small enough to ship as a literal, the keys — actually
  * present in the batch.
  *
  * Why this matters: the probes advertise O(batch + collisions), but
  * over a flat layout every micro-batch scans the WHOLE index — at a
  * 100 TB corpus the standing index dwarfs any batch, so the scan,
  * not the batch, becomes the per-batch cost. Partition pruning makes
  * the scan ∝ the batch's bucket set: a b-key batch reads ≤ b/B of
  * the index regardless of history size, and with the key-literal
  * pushdown parquet row-group stats/dictionaries skip non-matching
  * pages inside the touched buckets too. Appends stay O(batch): new
  * part files land inside their key's bucket directory, history is
  * never read or rewritten, and there is no index structure to
  * rebuild (the bucket of a key never changes).
  *
  * Sizing: default B = 16 — on the test tiers the indexes are
  * KBs, so bucket count is pure file-open overhead (measured: 64
  * buckets cost the sf0.1 probes ~2× in parquet footer reads alone);
  * a production deployment sets [[NumBucketsKey]] before the index
  * build so one bucket of the expected index fits a scan task
  * (B ≈ index_bytes / 128 MB — thousands, at which point bucket
  * pruning alone carries the probe). B is persisted per tree
  * (`_graft_index_meta.json`) and appends/probes always use the
  * tree's own B; the probe-side contract (prune to the batch's
  * buckets) is independent of B.
  *
  * Back-compat: a scan of a parquet tree WITHOUT a `bucket` partition
  * column (an index written before this layout) falls back to the
  * full scan — probes keep working against legacy indexes, they just
  * do not prune.
  */
object IndexLayout {

  /** Default buckets per index — see the sizing note above. */
  val NumBuckets = 16

  /** Session conf: buckets for NEW indexes (overwrite-mode writes).
    * The production sizing rule from the scaladoc made usable: set
    * B ≈ expected_index_bytes / 128 MB before the index build so one
    * bucket of the grown index fits a scan task. The bucket count is
    * a property of the TREE, not the session — it is persisted in a
    * `_graft_index_meta.json` file next to the data, appends and
    * probes always use the tree's own B (a key's bucket must never
    * depend on who is asking), and pre-meta trees read as B = 16
    * (every tree written before this knob existed).
    */
  val NumBucketsKey = "spark.graft.indexNumBuckets"

  private[operators] def confNumBuckets(spark: SparkSession): Int =
    spark.conf.getOption(NumBucketsKey).map(_.toInt).getOrElse(NumBuckets)

  private val MetaFile = "_graft_index_meta.json"

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, MetaFile)

  private[operators] def metaExists(spark: SparkSession,
                                    path: String): Boolean = {
    val p = metaPath(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Replace `dst` with the freshly-written `tmp` in ONE metadata op:
    * `FileContext.rename(OVERWRITE)`, not delete-then-rename — the
    * two-step variant has a window in which a concurrent reader sees
    * NO file at all (a probe resolving the version pointer mid-flip
    * would fall back to the flat root; a probe reading the meta
    * mid-rewrite would hit the missing-meta error on a healthy tree).
    * Local FS and HDFS both implement the overwrite rename as an
    * atomic replace.
    */
  private def atomicReplace(spark: SparkSession,
                            tmp: org.apache.hadoop.fs.Path,
                            dst: org.apache.hadoop.fs.Path): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fc =
      if (dst.toUri.getScheme != null)
        org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      else org.apache.hadoop.fs.FileContext.getFileContext(conf)
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Persist the tree's bucket count (called AFTER the parquet write —
    * overwrite mode deletes the directory, taking any previous meta
    * with it). Written to a temp name and atomically renamed OVER the
    * destination, so a crash mid-write can never leave a half-written
    * meta a later reader parses into a wrong B, and a concurrent
    * reader never observes the meta missing mid-replace; a crash
    * BETWEEN the parquet write and the rename leaves no meta at all,
    * which [[indexNumBuckets]] turns into a loud error (not a silent
    * B = 16) whenever the bucket directories prove the tree was
    * written wider.
    */
  private[operators] def writeMeta(spark: SparkSession, path: String,
                                   b: Int): Unit =
    writeMetaBody(spark, path, s"""{"numBuckets": $b}""")

  private def writeMetaBody(spark: SparkSession, path: String,
                            body: String): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(path, MetaFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    atomicReplace(spark, tmp, p)
  }

  private def readMetaBody(spark: SparkSession,
                           path: String): Option[String] = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** One integer field of the tree's meta file, or None when the meta
    * (or the key) is absent. Read to EOF like [[indexNumBuckets]] — a
    * truncated read must never parse a shorter number.
    */
  private[operators] def readMetaLong(spark: SparkSession, path: String,
                                      key: String): Option[Long] =
    readMetaBody(spark, path).flatMap { body =>
      ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*(-?\\d+)").r
        .findFirstMatchIn(body).map(_.group(1).toLong)
    }

  /** Upsert one integer field into the tree's meta file, preserving
    * every other integer field (the meta is a flat string→integer
    * object by construction — both writers here only ever store
    * counts). Same temp-write + atomic-replace discipline as
    * [[writeMeta]], and the single-writer maintenance model the index
    * lifecycle already assumes makes read-merge-write safe.
    */
  private[operators] def upsertMetaLong(spark: SparkSession, path: String,
                                        key: String, value: Long): Unit = {
    val kvRe = """"([^"]+)"\s*:\s*(-?\d+)""".r
    val kvs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    readMetaBody(spark, path).foreach(b =>
      kvRe.findAllMatchIn(b).foreach(m => kvs(m.group(1)) = m.group(2).toLong))
    kvs(key) = value
    writeMetaBody(spark, path,
      kvs.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
  }

  /** The bucket count the tree at `path` was written with: its meta
    * file, or [[NumBuckets]] for trees that predate the knob.
    *
    * Failure safety: the meta is read to EOF (a short `read` that
    * truncated the digits would silently parse a smaller B and
    * mis-bucket every probe), and a MISSING meta is only trusted to
    * mean B = 16 when the `bucket=*` directories are consistent with
    * that — a tree whose max bucket directory is >= 16 was provably
    * written wider, so assuming 16 would mis-bucket the next append
    * and silently drop probe matches on the mixed tree. That case
    * fails loudly with a rebuild message instead.
    *
    * The guard is ONE-SIDED by construction: a custom tree NARROWER
    * than the default (B < 16) whose meta is lost is indistinguishable
    * from a legacy pre-knob tree that simply has no keys hashing into
    * the higher buckets — directory names cannot prove narrowness the
    * way they prove width. Deployments running B < 16 (the knob exists
    * for B in the thousands; smaller-than-default is a test shape)
    * should treat the meta like any other deployment manifest: it is
    * a one-line file, version it / restore it from the build config
    * rather than relying on inference.
    */
  def indexNumBuckets(spark: SparkSession, path: String): Int = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) {
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      """"numBuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
        .map(_.group(1).toInt).getOrElse(NumBuckets)
    } else {
      val root = new org.apache.hadoop.fs.Path(path)
      val bucketRe = """bucket=(\d+)""".r
      val maxBucket =
        if (!fs.exists(root)) -1
        else fs.listStatus(root).iterator.flatMap(s =>
          bucketRe.findFirstMatchIn(s.getPath.getName).map(_.group(1).toInt))
          .foldLeft(-1)(math.max)
      if (maxBucket >= NumBuckets)
        throw new IllegalStateException(
          s"index tree $path has bucket directories up to bucket=$maxBucket " +
            s"but no $MetaFile — it was written with a custom bucket count " +
            "whose meta is missing (crash between data and meta write, or a " +
            "partial copy). Rebuild the index (mode=overwrite) or restore " +
            "the meta file; assuming the default would silently mis-bucket.")
      NumBuckets
    }
  }

  /** Max distinct batch keys shipped as a literal IN-list into the
    * scan (beyond bucket pruning). MEASURED crossover
    * (tools/inlist_crossover.md, 50k-doc gram index, probe =
    * scan+count, min of 3): the literal IN-list wins below ~2k keys
    * (256 keys: 0.12 s vs 0.18 s semi — parquet gets the list as a
    * pushed filter, row-group stats + dictionary pages skip
    * non-matching pages), while the broadcast left-semi join is FLAT
    * in the key count (~0.12-0.18 s at 256→16384 keys) and wins above
    * (4096: 0.20 s IN vs 0.12 s semi; 16384: 0.60 s vs 0.13 s — the
    * filter expression's build+eval cost grows with the list). Hence
    * the tiering: IN-list to 2048, then [[SemiJoinMaxKeys]].
    */
  val MaxKeyPushdown = 2048

  /** Max distinct batch keys restricted via a broadcast LEFT-SEMI join
    * of the scan against the batch's distinct-key frame — the tier
    * between the literal IN-list and bucket-only pruning. No parquet
    * pushdown, but a constant-size plan and a hash-probe per scanned
    * row; the build side is the batch's distinct keys (never the
    * index), bounded here so the explicit broadcast stays
    * driver/executor-safe. Above this, bucket pruning alone (already
    * history-size-independent) carries the probe.
    */
  val SemiJoinMaxKeys: Long = 1L << 20

  /** Byte bound on the semi-join tier's broadcast build side:
    * [[SemiJoinMaxKeys]] alone bounds ROWS, but an explicit
    * `broadcast()` bypasses autoBroadcastJoinThreshold, and 2²⁰
    * 40-char substring windows are ~100 MB of strings — enough to
    * hurt the driver the tier exists to protect. The key bytes come
    * from the SAME one-pass stats job as the counts (exact: the sum
    * of the distinct keys' string octet lengths), and a batch over
    * either bound falls back to bucket-only pruning, which is already
    * history-size-independent. Tunable per session
    * ([[SemiJoinMaxBytesKey]]) — a deployment with a bigger driver
    * raises it, the spec shrinks it to pin the fallback.
    */
  val SemiJoinMaxBytes: Long = 64L << 20
  val SemiJoinMaxBytesKey = "spark.graft.indexSemiJoinMaxBytes"

  private def semiJoinMaxBytes(spark: SparkSession): Long =
    spark.conf.getOption(SemiJoinMaxBytesKey).map(_.toLong)
      .getOrElse(SemiJoinMaxBytes)

  /** Session conf: minimum index ON-DISK bytes before a probe pays
    * the pruning machinery (one batch-sized stats job + filters). The
    * same decision shape as the substring probe's broadcast tier: a
    * tiny index costs less to scan whole than one extra pass over the
    * batch, so pruning only engages once the index outgrows this —
    * which any real standing index does immediately; the default
    * exists so KB-sized test/ramp-up indexes don't pay prune jobs.
    * Set to 0 to force pruning (plan pins, probe smoke).
    */
  val PruneMinBytesKey = "spark.graft.indexPruneMinBytes"
  val PruneMinBytesDefault: Long = 16L << 20

  private def pruneMinBytes(spark: SparkSession): Long =
    spark.conf.getOption(PruneMinBytesKey).map(_.toLong)
      .getOrElse(PruneMinBytesDefault)

  /** On-disk size of an index tree (driver-side filesystem metadata —
    * the [[graft.operators.TextDedup.substringMatchesIndexed]]
    * decision reads the same summary).
    */
  def indexBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
  }

  /** Should a probe of the index at `path` pay the pruning machinery?
    * False for indexes under [[PruneMinBytesKey]] on disk.
    */
  def shouldPrune(spark: SparkSession, path: String): Boolean =
    indexBytes(spark, path) >= pruneMinBytes(spark)

  def bucketOf(key: Column, b: Int = NumBuckets): Column =
    pmod(xxhash64(key), lit(b)).cast("int")

  /** Layout of the existing index tree at `path`: Some(true) if it is
    * bucketed (has the `bucket` partition column — the same check the
    * probes use), Some(false) for a pre-bucketing flat tree, None if
    * the path does not exist / holds no parquet yet.
    */
  def existingLayoutBucketed(spark: SparkSession,
                             path: String): Option[Boolean] =
    try Some(spark.read.parquet(path).columns.contains("bucket"))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Write `df` hash-bucketed on `keyCol` (mode = overwrite|append).
    * The bucket is derived, never stored logically: readers get it as
    * a partition column and [[prunedScan]] drops it. The write
    * repartitions on the bucket first — without it every write task
    * opens a file in every bucket directory (tasks × B small files
    * per write/append); with it each bucket lands in one task → ~1
    * file per touched bucket per write. Index builds are offline
    * cost, so the extra exchange is the right trade; a production
    * deployment with TB-sized buckets raises the output parallelism
    * (repartition(N, bucket)) instead.
    *
    * Appends detect the EXISTING tree's layout first: appending
    * bucket directories into a pre-bucketing flat tree would mix
    * root-level data files with `bucket=*` dirs and break partition
    * discovery ("Conflicting directory structures") — corrupting the
    * standing index on the first append. A legacy flat tree therefore
    * gets a flat append (the probes' legacy fallback keeps reading it,
    * unpruned); rebuilding with mode=overwrite migrates it.
    */
  def writeBucketed(df: DataFrame, keyCol: String, path: String,
                    mode: String): Unit = {
    val spark = df.sparkSession
    val existing = existingLayoutBucketed(spark, path)
    val legacyAppend = mode == "append" && existing.contains(false)
    if (legacyAppend) { df.write.mode("append").parquet(path); return }
    // appends use the TREE's bucket count (a key's bucket must never
    // depend on the writing session); new/overwritten trees take the
    // session conf
    val append = mode == "append" && existing.contains(true)
    val b = if (append) indexNumBuckets(spark, path) else confNumBuckets(spark)
    df.withColumn("bucket", bucketOf(col(keyCol), b))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket").parquet(path)
    // the meta is a property of the TREE and appends read (not choose)
    // B, so an append whose tree already carries meta must not touch
    // it — even an atomic rewrite of the same value is a pointless
    // failure surface on every ingest batch. Appends only stamp meta
    // when the tree predates the knob (bucketed, no meta → B = 16 by
    // construction, now made durable).
    if (!(append && metaExists(spark, path))) writeMeta(spark, path, b)
  }

  /** Read the index at `path` pruned to `batchKeys` (a one-column
    * frame of the batch's — possibly repeated — key values):
    *
    *  1. ONE batch-sized job computes, per touched bucket, the exact
    *     distinct-key count AND the keys themselves (shipped capped at
    *     [[MaxKeyPushdown]]+1 per bucket, so the driver transfer is
    *     ≤ B·(cap+1) rows regardless of batch size) — the COMPLETE
    *     bucket set plus the distinct-key total, in one pass;
    *  2. the scan always prunes on `bucket IN (batch buckets)`;
    *  3. when the distinct keys fit [[MaxKeyPushdown]], the already
    *     collected per-bucket key lists (complete by construction —
    *     each bucket's count ≤ the under-cap total) are additionally
    *     pushed as `key IN (...)` for row-group/dictionary skipping
    *     inside the touched buckets. No second batch job either way
    *     (r16 verdict: the old stats+keys pair ran the batch lineage
    *     twice; the fold recovers the q163/q175 probe overhead);
    *  4. between [[MaxKeyPushdown]] and [[SemiJoinMaxKeys]] distinct
    *     keys, the scan is instead restricted by a broadcast
    *     LEFT-SEMI join against the batch's distinct keys (measured
    *     flat in the key count where the literal IN-list grows —
    *     see the crossover table on [[MaxKeyPushdown]]); that costs
    *     one more batch pass (the distinct re-runs under the join),
    *     bounded by the batch.
    *
    * The batch key column is CAST to the index key's type before
    * hashing: `xxhash64` is type-sensitive, so an int batch key
    * probed against a long index key would otherwise bucket
    * differently and silently drop every match.
    *
    * Memory shape: the distinct runs as a spillable hash aggregate
    * BEFORE the per-bucket collect_list, so the only unbounded buffer
    * is one bucket's distinct keys — bounded by the batch, which is a
    * micro-batch by contract (the same order the old two-job path
    * paid twice).
    *
    * Correct for every probe here because each one only ever consumes
    * index rows whose key EQUALS some batch key (equi-joins and
    * key-grouped aggregates joined back to the batch): rows outside
    * the batch's key set cannot influence the result. Returns the
    * frame WITHOUT the bucket column.
    */
  def prunedScan(spark: SparkSession, path: String, keyCol: String,
                 batchKeys: DataFrame): DataFrame = {
    val idx = spark.read.parquet(path)
    if (!idx.columns.contains("bucket")) idx // legacy flat layout
    else if (!shouldPrune(spark, path)) idx.drop("bucket")
    else restrictToBatchKeys(idx, keyCol, batchKeys,
      indexNumBuckets(spark, path))
  }

  /** The key-restriction tiering itself, over an ALREADY-LOADED index
    * frame that still carries its `bucket` partition column — the core
    * [[prunedScan]] delegates to, exposed so per-GROUP probes (the
    * banded media probe restricts each band's slice separately) ride
    * the same measured crossover constants instead of hand-rolling
    * them. `b` must be the TREE's bucket count
    * ([[indexNumBuckets]]). Returns the restricted frame without the
    * bucket column.
    */
  private[operators] def restrictToBatchKeys(idx: DataFrame, keyCol: String,
                                             batchKeys: DataFrame,
                                             b: Int): DataFrame = {
    val kt = idx.schema(keyCol).dataType
    val kc = batchKeys.columns.head
    val keyed = batchKeys.select(col(kc).cast(kt).as("k")).distinct()
    val stats = keyed
      .groupBy(bucketOf(col("k"), b).as("b"))
      .agg(count(lit(1)).as("n"),
        // coalesce: a bucket holding only a NULL key (xxhash64(null)
        // hashes to the seed bucket) sums bytes to null
        coalesce(sum(octet_length(col("k").cast("string"))), lit(0L))
          .as("bytes"),
        slice(collect_list(col("k")), 1, MaxKeyPushdown + 1).as("ks"))
      .collect()
    val buckets = stats.map(_.getInt(0)).toSeq
    val nKeys = stats.map(_.getLong(1)).sum
    val keyBytes = stats.map(_.getLong(2)).sum
    val byBucket = idx.filter(col("bucket").isin(buckets: _*))
    val pruned =
      if (nKeys <= MaxKeyPushdown) {
        val keys = stats.flatMap(_.getSeq[Any](3)).toSeq
        byBucket.filter(col(keyCol).isin(keys: _*))
      } else if (nKeys <= SemiJoinMaxKeys &&
                 keyBytes <= semiJoinMaxBytes(idx.sparkSession))
        byBucket.join(broadcast(keyed.select(col("k").as(keyCol))),
          Seq(keyCol), "left_semi")
      else byBucket
    pruned.drop("bucket")
  }

  // ---- version-pointer protocol -----------------------------------
  // Shared by every VERSIONED index layout (the substring eval-set
  // index's compaction, the standing IVF semantic index's retrain):
  // versions are immutable sibling directories `v0, v1, …` under the
  // index root and `_current` names the live one. Writers build the
  // next version completely, then flip the pointer; readers resolve
  // the pointer once per probe, so an in-flight reader keeps its
  // version while the flip happens (retention deletes versions older
  // than the read horizon).

  private def pointerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_current")

  def versionDir(path: String, v: Int): String = s"$path/v$v"

  /** The live version number at `path` (0 when no pointer exists —
    * pre-versioning trees and fresh v0 builds read identically).
    */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val p = pointerPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt
      finally in.close()
    }
  }

  /** Point `_current` at `version` — written to a temp name first and
    * atomically renamed OVER the pointer last
    * (`FileContext.rename(OVERWRITE)`), so a reader never sees a
    * half-written pointer AND never sees the pointer missing mid-flip:
    * a delete-then-rename would open a window in which
    * [[resolveVersionDir]] falls back to the flat root — a crash for
    * version-built trees (no root data) and a silent stale read for
    * in-place-migrated ones.
    */
  def flipVersion(spark: SparkSession, path: String, version: Int): Unit = {
    val fs = pointerPath(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(path, "_current.tmp")
    val cur = pointerPath(path)
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    atomicReplace(spark, tmp, cur)
  }

  /** The directory a reader of the index at `path` should scan: the
    * current version's subdirectory when a `_current` pointer exists,
    * `path` itself otherwise — every pre-versioning flat tree keeps
    * working unchanged, and [[flipVersion]] migrates it in place (the
    * old root data stays for in-flight readers, new readers follow the
    * pointer).
    */
  def resolveVersionDir(spark: SparkSession, path: String): String = {
    val p = pointerPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) versionDir(path, currentVersion(spark, path)) else path
  }

  /** The retention half of the version protocol: delete every `v<N>`
    * directory with N < `keepFrom` — never the live version (the call
    * refuses a `keepFrom` beyond it), and meant to run only once
    * `keepFrom` is at or behind the deployment's read horizon (a probe
    * that resolved the pointer before a flip may still be reading an
    * older version; local test processes probe synchronously, so
    * horizon = current). Returns the versions actually deleted.
    */
  def pruneVersionsBelow(spark: SparkSession, path: String,
                         keepFrom: Int): Seq[Int] = {
    val cur = currentVersion(spark, path)
    require(keepFrom <= cur,
      s"refusing to prune versions below $keepFrom: the live version is v$cur")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val vRe = """v(\d+)""".r
    fs.listStatus(root).toSeq.flatMap { s =>
      s.getPath.getName match {
        case vRe(n) if n.toInt < keepFrom =>
          fs.delete(s.getPath, true); Some(n.toInt)
        case _ => None
      }
    }.sorted
  }
}
