package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the incremental-ingestion primitive: given
  * two versions of a document table (yesterday's crawl and today's),
  * classify every key as added / removed / changed / unchanged so the
  * expensive downstream passes (dedup signatures, index appends,
  * decontamination probes) run on the delta, not the corpus. The
  * reference's store/scan versioned-array model (`doc/arrays.md`)
  * frames snapshots the same way: a new version is the prior one plus
  * a delta; this operator recovers that delta from materialized
  * snapshots.
  *
  * Scale shape: one equi-join on the key column — sort-merge under
  * AQE, broadcast when one side is small (a daily delta usually is).
  * Content comparison is by a caller-supplied fingerprint column
  * (md5 over content computed scan-side, narrow), so wide text/binary
  * payloads never ride the shuffle: the join moves (key, fingerprint)
  * plus whatever the caller carries.
  */
object SnapshotDiff {

  /** Full-outer diff of `oldDf` vs `newDf` on `keyCol`, comparing
    * `fpCol` fingerprints. Returns one row per key present in either
    * snapshot: (keyCol, status, old_fp, new_fp) with status in
    * {'added', 'removed', 'changed', 'unchanged'}. Both inputs must be
    * key-unique (a snapshot is a keyed table by definition); duplicate
    * keys would silently multiply join rows, so the caller enforces
    * uniqueness upstream.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
           fpCol: String): DataFrame = {
    // the output schema is (keyCol, status, old_fp, new_fp) — a key
    // named like one of the added columns would emit duplicate names
    require(!Seq("status", "old_fp", "new_fp").contains(keyCol),
      s"keyCol '$keyCol' collides with a diff output column")
    val o = oldDf.select(col(keyCol).as("_k"), col(fpCol).as("old_fp"))
    val n = newDf.select(col(keyCol).as("_k"), col(fpCol).as("new_fp"))
    o.join(n, Seq("_k"), "full_outer")
      .select(col("_k").as(keyCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** The delta a downstream incremental pass consumes: the new-side
    * rows of every added/changed key (the work set), as
    * (keyCol, status) joined back to `newDf` — a semi-join-shaped
    * projection that preserves the new snapshot's full row for exactly
    * the keys whose content is new.
    */
  def delta(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
            fpCol: String): DataFrame = {
    // the diff's status column joins onto newDf's full row — a newDf
    // that already carries one would end ambiguous or silently doubled
    // (the same collision guard concatChunk/assignShards use)
    require(!newDf.columns.contains("status"),
      "newDf already has a 'status' column; rename it before delta")
    val d = diff(oldDf, newDf, keyCol, fpCol)
      .filter(col("status").isin("added", "changed"))
      .select(col(keyCol), col("status"))
    newDf.join(d, Seq(keyCol))
  }
}
