package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Connected components over an edge table — the cluster-resolution
  * step after near-dup pair mining: pairs (a,b) say "same content",
  * components say "this whole group is one document", and the keep
  * policy (keep min doc_id per component) falls out of the labels.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round every vertex takes the minimum label over itself and its
  * neighbors (one shuffle on the edge key), then labels chase their own
  * label's label (`comp := comp(comp)`, a second self-join) — the
  * pointer-jumping step that collapses chains in O(log n) rounds where
  * plain propagation needs O(diameter). All state is (vertex, label)
  * pairs — memory ∝ vertices, never pairs², and every step is a keyed
  * shuffle Catalyst plans with map-side partial `min`.
  *
  * Loop cost: exactly ONE Spark action per round. Each round's result
  * carries a `changed` flag computed in the same plan, is marked for a
  * lazy `localCheckpoint`, and a single `count(changed)` aggregation
  * both materializes the checkpoint (truncating lineage for the tens of
  * rounds a pathological graph needs) and returns the convergence
  * signal — no separate fixpoint join, no second eager materialization.
  * Superseded rounds' checkpoint blocks are unpersisted immediately, so
  * executor storage holds at most two rounds of (vertex, label) state
  * regardless of round count. The edge table is checkpointed once up
  * front (it is re-joined every round) and released before returning.
  *
  * Caller contract: the returned DataFrame is backed by the final
  * round's local checkpoint (∝ vertices). It stays pinned in executor
  * storage until the session ends or the caller is done with it.
  *
  * The reference has no graph operator; this is the Spark-native
  * closure of its dedup-pipeline capability (SURVEY §2 "beyond
  * reference"). Deterministic: labels are ids, min is order-free.
  */
object Components {

  /** Release the storage blocks behind a `localCheckpoint`ed DataFrame.
    * These blocks do NOT live in the SQL cache manager (so `unpersist()`
    * on the Dataset is a no-op for them); the pinned RDD sits inside the
    * plan's `LogicalRDD` leaf. After release the DataFrame is no longer
    * computable — only call on state that has been superseded.
    */
  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** @return (id, component) for every vertex appearing in `edges`,
    *         where component = min vertex id reachable from `id`.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 30): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    // joined every round — materialize the distinct union exactly once
    val undirected = sym.union(sym.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = undirected.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // neighbor minimum: one shuffle keyed on the vertex
      val nbrMin = undirected.join(labels, undirected("b") === labels("id"))
        .groupBy(undirected("a").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      val propagated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("prev_comp"))
      // pointer jumping: comp := comp(comp)
      val byId = propagated.select(col("id").as("cid"), col("comp").as("ccomp"))
      val jumpedComp =
        least(propagated("comp"), coalesce(col("ccomp"), propagated("comp")))
      val next = propagated.join(byId, propagated("comp") === byId("cid"), "left")
        .select(propagated("id"), jumpedComp.as("comp"),
          (jumpedComp =!= col("prev_comp")).as("changed"))
        .localCheckpoint(eager = false)
      // the ONE action of the round: materializes the checkpoint (the
      // aggregation touches every partition) AND returns the fixpoint test
      val nChanged = next.agg(count(when(col("changed"), 1)).as("n"))
        .first().getLong(0)
      releaseLocalCheckpoint(labels) // superseded round's blocks
      labels = next
      converged = nChanged == 0L
      i += 1
    }
    releaseLocalCheckpoint(undirected)
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels.select(col("id"), col("comp"))
  }

  /** Dedup-cluster convenience: components of a near-dup pair table,
    * one row per clustered doc (doc_id, component = min doc_id of its
    * cluster — the member the keep-lowest policy retains).
    */
  def dupClusters(pairs: DataFrame, aCol: String = "doc_a",
                  bCol: String = "doc_b"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy(col("doc_id"))

  /** Quality-aware duplicate-cluster resolution — the keep policy
    * production pipelines actually want: within every connected
    * component of the pair graph, keep the document with the BEST
    * score (ties → smallest id) rather than [[dupClusters]]' smallest
    * id. Documents in no pair are their own singleton component and
    * always kept. Returns one row per scored document:
    * (idCol, component, score, kept, kept_by) where `kept_by` is the
    * winning document (the witness a curation report needs).
    *
    * Scale shape: components come from the same pointer-jumping
    * labels, and the policy itself is one map-side-combinable
    * aggregate (max(struct(score, -id)) per component) plus a
    * component-keyed equi-join back — NOT a window over `component`:
    * a boilerplate-heavy corpus can put millions of docs in one
    * component, and a per-component window would concentrate that
    * whole cluster in a single straggler task, while the aggregate
    * collapses it to one winner row map-side (the q131/q171 ownership
    * discipline). Scores must be non-null (a null score row would
    * sort after every real score in the old window form and is
    * rejected the same way by the struct-max).
    */
  def keepBestInCluster(pairs: DataFrame, scored: DataFrame, idCol: String,
                        scoreCol: String, aCol: String = "doc_a",
                        bCol: String = "doc_b"): DataFrame = {
    val labels = dupClusters(pairs, aCol, bCol)
      .withColumnRenamed("doc_id", "_graft_label_id")
    val base = scored.join(labels, scored(idCol) === labels("_graft_label_id"),
        "left")
      .drop("_graft_label_id")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    // winner per component = best score, ties -> smallest id: the
    // struct-max on (score, -id) replays ORDER BY score DESC, id ASC
    val winners = base.groupBy(col("component"))
      .agg(max(struct(col(scoreCol).as("s"),
        (-col(idCol)).as("nid"))).as("w"))
      .select(col("component"), (-col("w.nid")).as("kept_by"))
    base.join(winners, Seq("component"))
      .select(col(idCol), col("component"), col(scoreCol).as("score"),
        (col(idCol) === col("kept_by")).as("kept"), col("kept_by"))
  }

  /** Fixed-point integer PageRank over an undirected pair graph — the
    * centrality signal for canonical-document selection inside dup
    * clusters (the hub of a near-dup cluster is its best "keep", and
    * rank also feeds quality propagation across the duplication graph).
    *
    * Arithmetic is EXACT fixed-point so any engine replays it: scores
    * are integers scaled by 1e6; one iteration is
    * `pr' = 150000 + (850000 * Σ_u (pr(u) div deg(u))) div 1000000`
    * (damping 0.85, truncating integer division at both steps; an
    * undirected graph has no dangling nodes, so no residual mass
    * term). Every iteration is one keyed shuffle with a map-side
    * partial integer sum — the Pregel shape at any scale; state is
    * (vertex, score), never edges². `iters` fixed rounds, not
    * convergence-tested: the gate pins a deterministic trajectory.
    * Returns (id, deg, pr) for every vertex of the pair graph.
    */
  def pageRank(pairs: DataFrame, aCol: String = "doc_a",
               bCol: String = "doc_b", iters: Int = 5): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    var pr = deg.select(col("id"), col("deg"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = pr
        .join(edges, pr("id") === edges("src"))
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      pr = deg.join(contribs, Seq("id"))
        .select(col("id"), col("deg"),
          (lit(150000L) + expr("(850000 * s) div 1000000")).as("pr"))
    }
    pr.orderBy(col("id"))
  }
}
