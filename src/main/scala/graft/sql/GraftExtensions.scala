package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import graft.functions.DotProduct

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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
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

  /** Register every graft function on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
