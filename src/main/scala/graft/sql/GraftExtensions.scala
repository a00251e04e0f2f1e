package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.functions.DotProduct
import graft.operators.Stream

/** SQL surface of the engine (SURVEY.md §7.2 M7).
  *
  * Registers the graft scalar functions so plain `spark.sql` users get
  * them; usable two ways:
  *  - `--conf spark.sql.extensions=graft.sql.GraftExtensions` (or
  *    `.withExtensions(new GraftExtensions)`) at session build time, or
  *  - `GraftExtensions.register(spark)` on a live session (function
  *    registry path, what the library entry points call internally).
  *
  * The pipe operator stays a DataFrame transform (`graft.operators.Stream`)
  * because its output schema is an operator *option*, not inferable from
  * SQL argument expressions — exactly why the reference makes `types:` a
  * mandatory keyword (`src/StreamSettings.h:62-324`). `Stream.tsvSql`
  * bridges SQL workflows by piping a registered view.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftExtensions.tableBuilders.foreach { case (name, (info, builder)) =>
      e.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
    // plans graft.plans.StreamPlan (the pipe operator's logical node) to
    // StreamExec; also self-registers lazily via the Stream API for
    // sessions built without extensions
    e.injectPlannerStrategy(_ => graft.plans.StreamStrategy)
  }
}

object GraftExtensions {
  private def cosine(args: Seq[Expression]): Expression = {
    val (a, b) = (args(0), args(1))
    Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "graft_dot" -> (
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    "graft_cosine" -> (
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      cosine _)
  )

  /** SQL table function `graft_stream_tsv('<view>', '<cmd>')` — the
    * reference's `stream(A, 'cmd')` callable from plain SQL. Arguments
    * must be literals (the output schema is fixed by the TSV format, so
    * analysis stays schema-sound).
    */
  private def streamTsvPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2,
      "graft_stream_tsv expects (table_name_literal, command_literal)")
    def str(e: Expression): String = {
      require(e.foldable, s"graft_stream_tsv arguments must be literals, got $e")
      String.valueOf(e.eval(null))
    }
    val spark = SparkSession.active
    Stream.tsv(spark.table(str(args.head)), str(args(1)))
      .queryExecution.logical
  }

  val tableBuilders: Map[String, (ExpressionInfo, Seq[Expression] => LogicalPlan)] = Map(
    "graft_stream_tsv" -> (
      new ExpressionInfo(Stream.getClass.getName, "graft_stream_tsv"),
      streamTsvPlan _))

  /** Register every graft function on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    tableBuilders.foreach { case (name, (_, builder)) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
  }
}
