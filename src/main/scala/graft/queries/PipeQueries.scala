package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.Tables
import graft.operators.Stream

/** Oracle-checked queries that exercise the pipe `stream()` operator
  * end-to-end (SURVEY.md §2.4 P1/P3/P6/P12): data leaves the JVM through
  * a real child process and comes back, and the final result must still
  * hash-match plain SQL over the input tables — proving the protocol is
  * lossless.
  *
  * The children are mawk scripts (`-W interactive` disables mawk's block
  * buffering, which would deadlock the ping-pong protocol). Lineage
  * columns (instance_id/chunk_no) are partitioning-dependent, so every
  * query aggregates them away before comparing (SURVEY.md §7.4 risk 4).
  */
object PipeQueries {
  // All three children are LOOP-STYLE (child pooling, r18 verdict
  // directive 3): the end-of-data message resets the per-stream state
  // and the child waits for the NEXT stream's header instead of
  // exiting — the reference clients' `map(f)` loop shape, which only
  // ends when the parent closes the pipe. That is what lets the
  // queries pass `reuseChildren = true`: a pooled child serves one
  // task after another, so fork count per query drops from
  // partitions × runs to the concurrency high-water mark.

  /** Echo each line prefixed with "ok" (reference stream_test_client analog). */
  private val awkEcho =
    """awk -W interactive 'BEGIN{n=-1}
      |{ if (n<0) { n=$0+0; if (n==0) { print 0; fflush(); n=-1; next }; print n }
      |  else     { print "ok\t" $0; if (--n==0) { fflush(); n=-1 } } }'"""
      .stripMargin.replace("\n", " ")

  /** Keep a running sum of column 1, emit it only in the final message (P3). */
  private val awkSum =
    """awk -W interactive 'BEGIN{n=-1; s=0}
      |{ if (n<0) { n=$0+0;
      |             if (n==0) { printf "1\n%d\n", s; fflush(); s=0; n=-1 };
      |             next }
      |  s += $1; if (--n==0) { print 0; fflush(); n=-1 } }'"""
      .stripMargin.replace("\n", " ")

  /** First message is a key\tname lookup (side input); then map keys.
    * The finalize reset clears the lookup table (`split("", m)` — the
    * portable whole-array clear) and re-arms mode 0, so a reused child
    * rebuilds its table from the next stream's own side chunk.
    */
  private val awkLookup =
    """awk -W interactive 'BEGIN{n=-1; mode=0}
      |{ if (n<0) { n=$0+0;
      |             if (n==0) { print 0; fflush(); n=-1; mode=0; split("", m); next };
      |             print (mode==0 ? 0 : n); next }
      |  if (mode==0) { split($0,f,"\t"); m[f[1]]=f[2]; if (--n==0){ fflush(); n=-1; mode=1 } }
      |  else { print m[$1]; if (--n==0) { fflush(); n=-1 } } }'"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1/P12: pipe round-trip; parse responses back and aggregate. The
    // result equals the same aggregate computed directly on lineitem, so
    // any framing/escaping/loss bug breaks the hash.
    "q40_pipe_echo" -> { (s, dir) =>
      import s.implicits._
      // 8 awk children in parallel (see q43's sizing note)
      val in = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber").repartition(8, $"l_orderkey")
      Stream.tsv(in, awkEcho, chunkSize = 5000, reuseChildren = true)
        .select(explode(split($"response", "\n")).as("line"))
        .select(split($"line", "\t").as("f"))
        .select($"f".getItem(1).cast("long").as("orderkey"),
                $"f".getItem(2).cast("long").as("linenumber"))
        .agg(count(lit(1)).as("n"),
             sum($"orderkey").as("sum_orderkey"),
             sum($"linenumber").as("sum_linenumber"))
    },

    // P3+P4: per-partition aggregate in the child (emitted only in the
    // finalize message), combined to a global sum by Spark.
    "q41_pipe_partial_agg" -> { (s, dir) =>
      import s.implicits._
      val in = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity".cast("long").as("q"))
        .repartition(8, $"l_orderkey").select($"q")
      Stream.tsv(in, awkSum, chunkSize = 5000, reuseChildren = true)
        .agg(sum($"response".cast("long")).as("sum_qty"))
    },

    // Arrow IPC path end-to-end: columnar frames out to a JVM child and
    // back, then aggregate — lossless round-trip proven by the oracle.
    "q43_pipe_arrow_echo" -> { (s, dir) =>
      import s.implicits._
      val cmd = graft.operators.clients.JvmChild.command("graft.operators.clients.ArrowEchoChild")
      // one child JVM forks per partition: size to 8 children so each
      // gets ~75k rows and its ~300ms startup amortizes (32 children
      // would be spawn-dominated — same sizing rule as a real cluster,
      // where the pipe partition count should track input volume, not
      // core count). repartition, NOT coalesce: the single-row-group
      // test parquet scans as ONE partition and coalesce can only
      // shrink — it silently left one child processing all 600k rows
      // serially. Hash by key keeps the content deterministic.
      val in = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity").repartition(8, $"l_orderkey")
      val declared = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_quantity", DoubleType)))
      Stream.arrow(in, cmd, declared, chunkSize = 8192,
        reuseChildren = true)
        .agg(count(lit(1)).as("n"),
             sum($"l_orderkey").as("sum_orderkey"),
             round(sum($"l_quantity"), 4).as("sum_qty"))
    },

    // R-DF wire format end-to-end (O14/O15): every chunk crosses the
    // pipe as an R serialize(version=2) data frame and comes back
    // through the same format — the oracle proves the byte layout
    // (NA sentinels included: l_commitdate-derived nulls survive).
    "q79_pipe_rdf_echo" -> { (s, dir) =>
      import s.implicits._
      val cmd = graft.operators.clients.JvmChild.command("graft.operators.clients.RdfEchoChild")
      // same child-per-partition sizing rule (and coalesce-vs-
      // repartition trap) as q43
      val in = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey",
          $"l_linenumber".cast("int").as("ln"),
          $"l_quantity".cast("double").as("qty"),
          // null-bearing string column: exercises the len=-1 NA path
          when($"l_linenumber" === 1, lit(null)).otherwise($"l_returnflag")
            .as("rf"))
        .repartition(8, $"l_orderkey").select($"ln", $"qty", $"rf")
      val declared = StructType(Seq(
        StructField("ln", IntegerType), StructField("qty", DoubleType),
        StructField("rf", StringType)))
      Stream.df(in, cmd, declared, chunkSize = 8192,
        reuseChildren = true)
        .agg(count(lit(1)).as("n"),
          sum($"ln".cast("long")).as("sum_ln"),
          round(sum($"qty"), 4).as("sum_qty"),
          count($"rf").as("n_rf"),
          min($"rf").as("min_rf"))
    },

    // P6: broadcast side input consumed by the child before the stream.
    "q42_pipe_side_lookup" -> { (s, dir) =>
      import s.implicits._
      val side = Tables.load(s, dir, "nation").select($"n_nationkey", $"n_name")
      val in = Tables.load(s, dir, "customer").select($"c_nationkey")
      Stream.tsv(in, awkLookup, chunkSize = 5000, side = Some(side),
        reuseChildren = true)
        .select(explode(split($"response", "\n")).as("n_name"))
        .groupBy($"n_name").agg(count(lit(1)).as("n"))
        .orderBy($"n_name")
    },

    // Non-replicated ARRAY2: both sides hash-partitioned on the join
    // key with the same partition count, so each child's first message
    // holds exactly the lookup rows its own data rows will reference —
    // no broadcast, no replication, and the oracle still proves no key
    // missed. At 100 TB this is the mode for side data too big to
    // broadcast but co-partitionable with the stream.
    "q39_pipe_local_side" -> { (s, dir) =>
      import s.implicits._
      val side = Tables.load(s, dir, "nation")
        .select($"n_nationkey", $"n_name").repartition(8, $"n_nationkey")
      val in = Tables.load(s, dir, "customer")
        .select($"c_nationkey").repartition(8, $"c_nationkey")
      Stream.tsv(in, awkLookup, chunkSize = 5000, side = Some(side),
        sideLocal = true, reuseChildren = true)
        .select(explode(split($"response", "\n")).as("n_name"))
        .groupBy($"n_name").agg(count(lit(1)).as("n"))
        .orderBy($"n_name")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q40_pipe_echo" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
        |  CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumber
        |FROM lineitem""".stripMargin,

    "q41_pipe_partial_agg" ->
      "SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem",

    "q42_pipe_side_lookup" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q39_pipe_local_side" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_pipe_arrow_echo" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem""".stripMargin,

    "q79_pipe_rdf_echo" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  CAST(count(CASE WHEN l_linenumber <> 1 THEN l_returnflag END) AS BIGINT)
        |    AS n_rf,
        |  min(CASE WHEN l_linenumber <> 1 THEN l_returnflag END) AS min_rf
        |FROM lineitem""".stripMargin
  )
}
