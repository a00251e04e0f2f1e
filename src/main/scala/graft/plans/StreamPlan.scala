package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** Wire format of a [[StreamPlan]] pipe operator (reference
  * `stream::Settings` format enum, `src/StreamSettings.h:62-324`).
  */
sealed trait StreamFormat
object StreamFormat {
  /** Line-oriented TSV: output is `[instance_id, chunk_no, response]`. */
  case object Tsv extends StreamFormat
  /** Arrow IPC with a caller-declared schema (the reference's mandatory
    * `types:`/`names:` keywords): output is the declared attributes plus
    * `[instance_id, chunk_no, value_no]` lineage.
    */
  final case class Arrow(declared: StructType) extends StreamFormat
  /** R-serialization data frames (`format=df`, reference O14/O15,
    * `src/DFInterface.cpp`): every message is a valid R
    * `serialize(..., xdr=FALSE, version=2)` named list of typed
    * columns, so an unmodified reference R client
    * (`r_pkg/R/exported.R` `map`/`getChunk`) works as the child.
    * Output shape matches [[Arrow]]: declared attributes plus
    * `[instance_id, chunk_no, value_no]` lineage.
    */
  final case class Rdf(declared: StructType) extends StreamFormat
}

/** Logical `stream()` node (reference `LogicalStream`,
  * `src/LogicalStream.cpp:60-139`): pipe each partition of `input`
  * through `cmd` speaking the half-duplex chunk protocol; `side` is the
  * optional ARRAY2 replayed to every child before its partition rows
  * (`src/PhysicalStream.cpp:74-100`).
  *
  * `sideLocal = false` (default) replicates the side input to every
  * child (the reference examples' `_sg(x, 0)` pattern); `true` streams
  * only side partition i to input partition i's child — the
  * reference's non-replicated ARRAY2 semantics, where each instance
  * sees its *local* ARRAY2 chunks (`src/PhysicalStream.cpp:74-100`).
  * In local mode the caller aligns the two partitionings (the analog
  * of the reference's instance-aligned `_sg(x, 1)`).
  *
  * The node is opaque to the optimizer by design — the child program is
  * a black box, so no predicate/projection may be pushed through it
  * (the reference likewise performs no rewrites, SURVEY.md §4.1). Its
  * value over the earlier `df.rdd.mapPartitions` formulation is
  * physical: [[StreamStrategy]] plans it to [[StreamExec]], whose side
  * input declares `BroadcastDistribution`, so the planner runs the side
  * query through a genuine `BroadcastExchangeExec` — lazily, reusable
  * across queries, AQE-visible — instead of an eager driver-side
  * `collect()` at DataFrame-construction time.
  */
case class StreamPlan(
    input: LogicalPlan,
    side: Option[LogicalPlan],
    cmd: String,
    format: StreamFormat,
    chunkSize: Int,
    output: Seq[Attribute],
    sideLocal: Boolean = false,
    reuseChildren: Boolean = false) extends LogicalPlan {

  override def children: Seq[LogicalPlan] = input +: side.toSeq

  override def producedAttributes: AttributeSet = outputSet

  /** Every input column feeds the child program, so none may be pruned:
    * without this, ColumnPruning's generic case sees an operator that
    * "references" nothing and inserts an empty Project under it,
    * silently feeding the child zero-width rows.
    */
  override def references: AttributeSet =
    AttributeSet(children.flatMap(_.output))

  override def maxRows: Option[Long] = None

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): StreamPlan =
    copy(input = newChildren(0),
      side = if (side.isDefined) Some(newChildren(1)) else None)
}
