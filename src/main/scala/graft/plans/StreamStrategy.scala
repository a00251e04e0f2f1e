package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[StreamPlan]] → [[StreamExec]] (reference plugin registration,
  * `src/plugin.cpp:33-39`). Registered two ways:
  *  - `spark.sql.extensions=graft.sql.GraftExtensions` (injectPlannerStrategy)
  *  - lazily via [[StreamStrategy.ensureRegistered]] on first use of the
  *    `graft.operators.Stream` DataFrame API (public
  *    `spark.experimental.extraStrategies`, idempotent).
  */
object StreamStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: StreamPlan =>
      StreamExec(planLater(p.input), p.side.map(planLater),
        p.cmd, p.format, p.chunkSize, p.output, p.sideLocal,
        p.reuseChildren) :: Nil
    case _ => Nil
  }

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(StreamStrategy))
      spark.experimental.extraStrategies = cur :+ StreamStrategy
  }
}
