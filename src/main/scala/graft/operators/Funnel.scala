package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event stream: how many
  * users performed step 1, then step 2 strictly after it, then step 3
  * strictly after that, … — the standard conversion-funnel pattern.
  *
  * Semantics: a user completes step i at the EARLIEST event matching
  * step i that is strictly later than their step-(i−1) completion time
  * (greedy matching, the classic funnel definition — earliest
  * completion is optimal, so greedy loses no users). Step 1 completes
  * at the user's first matching event.
  *
  * Scale shape: one narrow pass per step — filter (pushed to the scan)
  * → per-user min-timestamp aggregate — then a keyed equi-join of
  * user-sized aggregates. The event table is scanned once per step
  * with only (user, ts) read; nothing is ever per-event joined or
  * sorted globally, and every shuffle is on user-count-sized data.
  * At 100 TB of events the per-step scans are embarrassingly parallel
  * and the joins are the small side.
  */
object Funnel {

  /** Per-step completion counts and conversion rates.
    *
    * @param events  event table
    * @param steps   ordered (stepName, predicate) pairs
    * @param userCol user identity column name
    * @param tsCol   event-time column name (any orderable type)
    * @return one row per step, in order: (step, step_name, n_users,
    *         pct_of_first) where pct_of_first = round(n/n_first, 4)
    */
  def conversion(events: DataFrame, steps: Seq[(String, Column)],
                 userCol: String = "user_id",
                 tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    // completions(i): (user, t_i) = earliest matching event after t_{i-1}
    val completions = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, ((_, pred), _)) =>
        val matching = events.filter(pred)
          .select(col(userCol).as("u"), col(tsCol).as("t"))
        val gated = prev match {
          case None => matching
          case Some(p) =>
            matching.join(p.select(col("u"), col("t").as("t_prev")), Seq("u"))
              .filter(col("t") > col("t_prev"))
              .select(col("u"), col("t"))
        }
        Some(gated.groupBy(col("u")).agg(min(col("t")).as("t")))
    }.flatten
    val counts = completions.zip(steps).zipWithIndex.map {
      case ((comp, (name, _)), i) =>
        comp.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"))
    }.reduce(_ unionAll _)
    val first = counts.filter($"step" === 1)
      .select($"n_users".as("n_first"))
    counts.crossJoin(broadcast(first))
      .select($"step", $"step_name", $"n_users",
        round(try_divide($"n_users", $"n_first"), 4).as("pct_of_first"))
      .orderBy($"step")
  }

  /** Cohort retention matrix: users grouped by the period of their
    * first activity (the cohort), counted in every later period they
    * were active — (cohort, period_offset, n_users). All arithmetic is
    * integer (period = floor(epoch seconds / periodSeconds)), so the
    * matrix is exact and engine-portable.
    *
    * Scale shape: distinct (user, period) pairs via one keyed
    * aggregation over a narrow projection of the event scan, the
    * cohort as a user-keyed min, one user-keyed equi-join of those two
    * user-sized tables, and a final small aggregate. Raw events are
    * touched once, and nothing ever shuffles on more than (user,
    * period) cardinality.
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts",
                       periodSeconds: Long = 604800L): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    // floor division via pmod (exact in integer arithmetic — DIV
    // truncates toward zero and is off by one for pre-1970 timestamps)
    // and the Column API (not a string-built expr, which broke column
    // names needing backticks)
    val ts = unix_timestamp(col(tsCol))
    val active = events.select(col(userCol).as("u"),
        ((ts - pmod(ts, lit(periodSeconds))) / lit(periodSeconds))
          .cast("long").as("p"))
      .distinct()
    val cohort = active.groupBy($"u").agg(min($"p").as("cohort"))
    active.join(cohort, Seq("u"))
      .groupBy($"cohort", ($"p" - $"cohort").as("period_offset"))
      .agg(count(lit(1)).as("n_users")) // (u, p) pairs are already distinct
      .orderBy($"cohort", $"period_offset")
  }
}
