package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated TPC-H-ish test data
  * (see TESTDATA.md). Tables are plain parquet files under a
  * scale-factor directory; filters/projections push down to the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): spark.read.parquet pays a
  // driver-side file listing + footer schema read EVERY call (~0.1 s/
  // table), which a long-lived session pays once at registration, not
  // per query — re-reading it per query was ~40% of the per-query
  // bench floor. The cached value is the analyzed DataFrame (a logical
  // plan, bytes not data). CONTRACT: the parquet files under a cached
  // (dir, table) key must be immutable for the session's lifetime — a
  // rewritten file would be served from the stale cached listing.
  // Keyed on the session so a stopped session's plans aren't
  // resurrected; entries for stopped sessions are evicted on the next
  // load from any session, so the map cannot grow without bound in a
  // long-lived multi-session process.
  private val loaded =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    loaded.keysIterator
      .filter { case (s, _, _) => s.sparkContext.isStopped }
      .foreach(loaded.remove)
    loaded.getOrElseUpdate((spark, sfDir, name), {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default; read it as a long and surface it as a microsecond
      // TimestampType column (Spark's native precision — DuckDB oracles
      // truncate identically via date_trunc/floor(epoch)).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })
  }

  // The driver-generated parquet files hold ONE row group each, so a
  // scan yields ONE input partition no matter what
  // maxPartitionBytes/openCostInBytes say (splits finer than a row
  // group stay empty) — and a per-row-expensive narrow kernel (char
  // windows, shingle/simhash/winnow hashing, per-partition pipe
  // children) serializes on a single core: profiled, q101's whole
  // 3.2 task-sec map stage ran on 1 of 32 cores.
  private val tableKeys: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")
  private val ParallelBuckets = 32

  /** [[load]], redistributed by a DETERMINISTIC hash of the table's
    * primary key — for queries whose first stage does heavy per-row
    * kernel work (or forks one child process per partition) over these
    * single-row-group test files. Bucket content is a pure function of
    * the key values (Murmur3 on the column) at a given bucket count,
    * and every gated result is layout-invariant (the correctness gates
    * run over both layouts). Queries whose first stage is cheap keep
    * plain [[load]]: the extra exchange measured as a net loss there
    * (~0.2-0.4 s of stage latency against nothing).
    *
    * The redistribution only fires when the scan arrives in FEWER
    * splits than the session's parallelism — the single-row-group
    * local-test case. At production scale a corpus scan arrives in
    * >= cores splits and this helper is literally a no-op (no exchange
    * inserted, scan parallelism preserved); the bucket count, when it
    * does fire, is max(32, defaultParallelism) so it never caps a
    * wider session at 32 tasks.
    */
  def loadParallel(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = tableKeys.getOrElse(name,
      throw new IllegalArgumentException(s"unknown table: $name"))
    loaded.getOrElseUpdate((spark, sfDir, name + "!parallel"), {
      val df = load(spark, sfDir, name)
      val target = math.max(ParallelBuckets,
        spark.sparkContext.defaultParallelism)
      if (df.rdd.getNumPartitions >= target) df
      else df.repartition(target, col(key))
    })
  }

  /** Register every table as a temp view so queries can use spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  // Persisted frames produced by SQL-facing TVF calls (graft_kmeans
  // and friends), tracked per session so a LONG-LIVED SQL session can
  // release exactly the operator state it created — repeated TVF
  // calls otherwise accumulate persisted frames until the global
  // clearCache hammer runs, which also evicts unrelated user caches
  // (r15 advice). STRONGLY held (r17 advice): the r16 weak-ref design
  // assumed the caller's stack still referenced the frame at release
  // time, but the TVF path keeps only `.queryExecution.logical` and
  // drops the Dataset wrapper immediately — any GC before the release
  // call cleared the weak ref and the cached BLOCKS (held strongly by
  // the CacheManager regardless of this map) then leaked until the
  // global clearCache, defeating the surgical release this mechanism
  // exists for. A strong ref guarantees release works; the cost is
  // only the small plan objects, never extra cached data. Entries for
  // sessions whose CONTEXT stopped sweep on the next track (their
  // blocks died with the context); the one residual is a live
  // newSession clone discarded without release — its queue (plan
  // objects, not blocks: the clone's blocks were pinned by the shared
  // CacheManager either way, and a global clearCache still frees
  // them) lives until context stop.
  private val tracked = scala.collection.concurrent.TrieMap
    .empty[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]

  /** Register a persisted operator result for per-session release.
    * (Deliberately NOT checking `storageLevel` per queued frame:
    * that costs a CacheManager lookup with plan canonicalization per
    * track call, measured at +0.3-3 s on the multi-cache
    * compositions, and release-time unpersist of an already-released
    * frame is a free no-op.)
    */
  def trackOperatorCache(df: DataFrame): DataFrame = {
    // synchronized WITH releaseTrackedCaches: lookup-and-add must be
    // atomic against remove-and-unpersist, or a track racing a
    // concurrent release adds its frame to a queue the release
    // already detached — the frame's blocks then stay pinned with no
    // registry entry left to ever release them (the TrieMap alone
    // makes each step safe, not the compound)
    tracked.synchronized {
      tracked.keysIterator
        .filter(_.sparkContext.isStopped).foreach(tracked.remove)
      tracked.getOrElseUpdate(df.sparkSession,
        new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    }
    df
  }

  /** Unpersist ONLY the frames registered via [[trackOperatorCache]]
    * for this session — the surgical release a long-lived SQL session
    * calls between TVF queries; user caches are untouched. (The
    * unpersist loop runs OUTSIDE the registry lock — only the
    * detach is synchronized.)
    */
  def releaseTrackedCaches(spark: SparkSession): Unit =
    tracked.synchronized(tracked.remove(spark))
      .foreach(_.forEach(_.unpersist(blocking = false)))

  /** Release every operator-internal `cache()` (see the cache contract
    * in [[graft.operators.TextDedup]]). Call after the terminal action
    * of a query whose operators cache intermediates — long-lived
    * sessions that skip this accumulate storage until eviction. This
    * is the BLUNT instrument (it clears the whole SQL cache, including
    * user caches); sessions that only ran TVFs can use
    * [[releaseTrackedCaches]] instead.
    */
  def releaseOperatorCaches(spark: SparkSession): Unit = {
    releaseTrackedCaches(spark)
    spark.catalog.clearCache()
  }
}
