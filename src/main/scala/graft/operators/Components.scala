package graft.operators

import org.apache.spark.sql.DataFrame
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
  * plain propagation needs O(diameter). Lineage is truncated with
  * `localCheckpoint` every round, so the loop is safe for the tens of
  * rounds a pathological graph needs (on a cluster, use
  * `spark.cleaner.referenceTracking` defaults and checkpoint dirs).
  * All state is (vertex, label) pairs — memory ∝ vertices, never
  * pairs², and every step is a keyed shuffle Catalyst plans with
  * map-side partial `min`.
  *
  * The reference has no graph operator; this is the Spark-native
  * closure of its dedup-pipeline capability (SURVEY §2 "beyond
  * reference"). Deterministic: labels are ids, min is order-free.
  */
object Components {

  /** @return (id, component) for every vertex appearing in `edges`,
    *         where component = min vertex id reachable from `id`.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 30): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val undirected = sym.union(sym.select(col("b").as("a"), col("a").as("b")))
      .distinct()
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
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // pointer jumping: comp := comp(comp)
      val byId = propagated.select(col("id").as("cid"), col("comp").as("ccomp"))
      val jumped = propagated.join(byId, propagated("comp") === byId("cid"), "left")
        .select(propagated("id"),
          least(propagated("comp"), coalesce(col("ccomp"), propagated("comp")))
            .as("comp"))
        .localCheckpoint(true) // truncate lineage before the fixpoint test
      converged = jumped.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.comp") =!= col("o.comp"))
        .isEmpty
      labels = jumped
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
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
}
